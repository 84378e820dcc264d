"""Pipeline parallelism (parallel/pipeline.py): a 4-stage GPipe schedule on
a ('pipe', 4) CPU mesh must reproduce the single-device transformer-CTC
loss AND parameter gradients exactly (the ppermute transposes form the
backward pipeline)."""

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
from pg_asr_tpu.parallel.pipeline import (make_pipeline_grad_fn,
                                          make_pipeline_loss,
                                          shard_pipeline_params,
                                          stack_pipeline_params,
                                          unstack_pipeline_tree)


def cfg4() -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="transformer", vocab_size=8, input_dim=16,
                          dropout=0.0),
        transformer=TransformerConfig(num_layers=4, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        train=TrainConfig(batch_size=8, warmup_steps=0),
    )


def _data(B=8):
    rng = np.random.default_rng(0)
    n = 3200
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 8, (B, 6)), jnp.int32)
    label_lens = jnp.full((B,), 6, jnp.int32)
    return wave, ns, labels, label_lens


def _single_device_loss(params, cfg, wave, ns, labels, label_lens):
    feats, mask, flens = extract_features(wave, ns, cfg.features)
    lp, _, out_lens = transformer_ctc.apply(params, feats, mask, flens,
                                            cfg.model, cfg.transformer)
    return ctc_loss_mean(lp, out_lens, labels, label_lens)


@pytest.mark.parametrize("M", [2, 4])
def test_pipeline_matches_single_device(M):
    cfg = cfg4()
    S = 4
    mesh = make_mesh((S,), ("pipe",))
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    wave, ns, labels, label_lens = _data()

    want = float(_single_device_loss(params, cfg, wave, ns, labels,
                                     label_lens))

    pparams = shard_pipeline_params(stack_pipeline_params(params, S), mesh)
    loss_fn = jax.jit(make_pipeline_loss(cfg, mesh, M))
    got = float(loss_fn(pparams, wave, ns, labels, label_lens))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pipeline_gradients_match_single_device():
    cfg = cfg4()
    S, M = 4, 4
    mesh = make_mesh((S,), ("pipe",))
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    wave, ns, labels, label_lens = _data()

    ref_grads = jax.grad(
        lambda p: _single_device_loss(p, cfg, wave, ns, labels,
                                      label_lens))(params)

    pparams = shard_pipeline_params(stack_pipeline_params(params, S), mesh)
    vg = make_pipeline_grad_fn(cfg, mesh, M)
    loss, grads = vg(pparams, wave, ns, labels, label_lens)
    assert np.isfinite(float(loss))

    # replicated params: direct comparison
    for name in ("input_proj", "ln_final", "ctc_head"):
        for a, b in zip(jax.tree_util.tree_leaves(ref_grads[name]),
                        jax.tree_util.tree_leaves(grads[name])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-6)
    # stage params: unstack back to the block list
    got_blocks = unstack_pipeline_tree(grads["stages"],
                                       cfg.transformer.num_layers)
    for i, blk in enumerate(got_blocks):
        for a, b in zip(jax.tree_util.tree_leaves(ref_grads["blocks"][i]),
                        jax.tree_util.tree_leaves(blk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-6)


def test_qkv_tp_permutation_roundtrip():
    """permute_qkv_for_tp is a pure column permutation with an exact
    inverse, and slicing the permuted last dim into tp chunks yields each
    rank's [3][h/tp][dh] block (the layout the composed dp x pp x tp
    in_specs rely on)."""
    from pg_asr_tpu.parallel.pipeline import permute_qkv_for_tp

    cfg = cfg4()
    params = transformer_ctc.init_params(jax.random.PRNGKey(1), cfg.model,
                                         cfg.transformer)
    h, tp = cfg.transformer.num_heads, 2
    perm = permute_qkv_for_tp(params, h, tp)
    back = permute_qkv_for_tp(perm, h, tp, inverse=True)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    w = np.asarray(params["blocks"][0]["qkv"]["w"])   # (d, 3*h*dh)
    wp = np.asarray(perm["blocks"][0]["qkv"]["w"])
    d = w.shape[0]
    dh = w.shape[1] // (3 * h)
    hl = h // tp
    want_r0 = w.reshape(d, 3, h, dh)[:, :, :hl].reshape(d, 3 * hl * dh)
    np.testing.assert_array_equal(wp[:, : wp.shape[1] // tp], want_r0)


def test_pipeline_tp_composed_matches_single_device():
    """dp x pp x tp on a (2, 2, 2) mesh: Megatron column/row splits inside
    every pipeline stage reproduce the single-device transformer loss AND
    all parameter gradients (VERDICT r1 #3: composed meshes)."""
    from pg_asr_tpu.parallel.pipeline import (permute_qkv_for_tp,
                                              pipeline_params_to_canonical)

    cfg = cfg4()
    S, M, tp = 2, 2, 2
    mesh = make_mesh((2, S, tp), ("data", "pipe", "model"))
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    wave, ns, labels, label_lens = _data()

    want = float(_single_device_loss(params, cfg, wave, ns, labels,
                                     label_lens))
    ref_grads = jax.grad(
        lambda p: _single_device_loss(p, cfg, wave, ns, labels,
                                      label_lens))(params)

    p_run = permute_qkv_for_tp(params, cfg.transformer.num_heads, tp)
    pparams = shard_pipeline_params(stack_pipeline_params(p_run, S), mesh)
    vg = make_pipeline_grad_fn(cfg, mesh, M)
    loss, grads = vg(pparams, wave, ns, labels, label_lens)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    g_canon = permute_qkv_for_tp(
        pipeline_params_to_canonical(jax.device_get(grads),
                                     cfg.transformer.num_layers),
        cfg.transformer.num_heads, tp, inverse=True)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_grads),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_canon),
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=str(ka))
