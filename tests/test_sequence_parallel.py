"""Sequence parallelism (parallel/sequence.py): the time-sharded encoder on
a ('seq', 4) CPU mesh must reproduce the single-device transformer-CTC loss
and parameter gradients (all_gather transposes = reduce-scatter backward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransformerConfig)
from pg_asr_tpu.models import transformer_ctc
from pg_asr_tpu.ops.ctc import ctc_loss_mean
from pg_asr_tpu.ops.features import extract_features
from pg_asr_tpu.parallel.mesh import make_mesh
from pg_asr_tpu.parallel.sequence import (make_sequence_parallel_grad_fn,
                                          make_sequence_parallel_loss)


def sp_cfg() -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="transformer", vocab_size=8, input_dim=16,
                          dropout=0.0),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        train=TrainConfig(batch_size=4, warmup_steps=0),
    )


def _data(B=4):
    rng = np.random.default_rng(3)
    n = 6400
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.asarray([n, n - 2000, n // 2, n - 500], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 8, (B, 6)), jnp.int32)
    label_lens = jnp.full((B,), 6, jnp.int32)
    return wave, ns, labels, label_lens


def _single_device(params, cfg, wave, ns, labels, label_lens):
    feats, mask, flens = extract_features(wave, ns, cfg.features)
    lp, _, out_lens = transformer_ctc.apply(params, feats, mask, flens,
                                            cfg.model, cfg.transformer)
    return ctc_loss_mean(lp, out_lens, labels, label_lens)


def test_sequence_parallel_matches_single_device():
    cfg = sp_cfg()
    mesh = make_mesh((4,), ("seq",))
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    wave, ns, labels, label_lens = _data()
    want = float(_single_device(params, cfg, wave, ns, labels, label_lens))
    loss_fn = jax.jit(make_sequence_parallel_loss(cfg, mesh))
    got = float(loss_fn(params, wave, ns, labels, label_lens))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sequence_parallel_grads_match_single_device():
    cfg = sp_cfg()
    mesh = make_mesh((4,), ("seq",))
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    wave, ns, labels, label_lens = _data()
    ref = jax.grad(lambda p: _single_device(p, cfg, wave, ns, labels,
                                            label_lens))(params)
    vg = make_sequence_parallel_grad_fn(cfg, mesh)
    loss, grads = vg(params, wave, ns, labels, label_lens)
    assert np.isfinite(float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=1e-6)
