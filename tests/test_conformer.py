"""Conformer-CTC family: unit (shapes, subsampled lengths, padding
invariance incl. the depthwise-conv window, gradients, rotary offset
property) + end-to-end through the train/predict drivers and the REINFORCE
fine-tune step.

Shares the CTC loss/decoders with the other CTC families via
models.acoustic_forward; the padding-invariance test is the load-bearing one
here because the conv module's kernel window could read across the pad if
the input were not masked before the convolution.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, ConformerConfig, FeatureConfig,
                               ModelConfig, TrainConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.models import conformer_ctc


def tiny_cfgs():
    mcfg = ModelConfig(family="conformer", vocab_size=8, input_dim=16)
    ccfg = ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                           ffn_dim=64, conv_kernel=7, dropout=0.0,
                           subsample=2)
    return mcfg, ccfg


def tiny_config() -> Config:
    mcfg, ccfg = tiny_cfgs()
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=mcfg,
        conformer=ccfg,
        train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )


def _inputs(B=3, T=21, F=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    lens = jnp.asarray([T, T - 6, 5][:B], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    return feats, mask, lens


def test_shapes_and_lengths():
    mcfg, ccfg = tiny_cfgs()
    feats, mask, lens = _inputs()
    params = conformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, ccfg)
    lp, omask, olens = conformer_ctc.apply(params, feats, mask, lens,
                                           mcfg, ccfg)
    To = -(-feats.shape[1] // ccfg.subsample)
    assert lp.shape == (3, To, mcfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(olens),
                                  -(-np.asarray(lens) // ccfg.subsample))
    om = np.asarray(omask)
    lpn = np.asarray(jnp.exp(lp).sum(-1))
    np.testing.assert_allclose(lpn[om > 0], 1.0, atol=1e-5)
    assert np.all(np.asarray(lp)[om == 0] == 0.0)


def test_padding_invariance():
    """Extra time padding must not change valid rows' outputs — this pins
    both the attention key mask AND the pre-conv masking of the depthwise
    window (an unmasked conv input would leak pad garbage into the last
    (kernel-1)/2 valid frames)."""
    mcfg, ccfg = tiny_cfgs()
    params = conformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, ccfg)
    feats, mask, lens = _inputs()
    lp, _, olens = conformer_ctc.apply(params, feats, mask, lens, mcfg, ccfg)

    pad_t = 8
    feats_p = jnp.pad(feats, ((0, 0), (0, pad_t), (0, 0)))
    feats_p = feats_p.at[:, feats.shape[1]:, :].set(123.0)
    mask_p = jnp.pad(mask, ((0, 0), (0, pad_t)))
    lp_p, _, olens_p = conformer_ctc.apply(params, feats_p, mask_p, lens,
                                           mcfg, ccfg)
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(olens_p))
    for b in range(3):
        n = int(olens[b])
        np.testing.assert_allclose(np.asarray(lp)[b, :n],
                                   np.asarray(lp_p)[b, :n],
                                   atol=2e-4, rtol=2e-4)


def test_rotary_relative_offset():
    """q_rot(t+s)·k_rot(u+s) == q_rot(t)·k_rot(u): rotary scores depend on
    positions only through their offset (the rel-pos property the paper's
    Transformer-XL attention provides via embedding tables)."""
    rng = np.random.default_rng(3)
    dh, T, shift = 8, 12, 5
    q = jnp.asarray(rng.standard_normal((1, 1, T + shift, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, T + shift, dh)), jnp.float32)
    # same content placed at positions [0,T) vs [shift, T+shift)
    q_shift = jnp.roll(q, shift, axis=2).at[:, :, :shift].set(0.0)
    k_shift = jnp.roll(k, shift, axis=2).at[:, :, :shift].set(0.0)
    s0 = jnp.einsum("bhqd,bhkd->bhqk", conformer_ctc._rotary(q),
                    conformer_ctc._rotary(k))
    s1 = jnp.einsum("bhqd,bhkd->bhqk", conformer_ctc._rotary(q_shift),
                    conformer_ctc._rotary(k_shift))
    np.testing.assert_allclose(np.asarray(s0)[0, 0, :T, :T],
                               np.asarray(s1)[0, 0, shift:, shift:],
                               atol=1e-4, rtol=1e-4)


def test_gradients_finite():
    mcfg, ccfg = tiny_cfgs()
    feats, mask, lens = _inputs()
    params = conformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, ccfg)

    def loss(p):
        lp, omask, _ = conformer_ctc.apply(p, feats, mask, lens, mcfg, ccfg)
        return jnp.sum(lp * omask[:, :, None])

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_train_step_overfits_fixed_batch():
    import optax

    from pg_asr_tpu.train import (compute_loss, init_model_params,
                                  make_optimizer)

    cfg = tiny_config()
    rng = np.random.default_rng(1)
    B, n = 4, 1600
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.zeros((B, 6), jnp.int32).at[:, :3].set(
        jnp.asarray(rng.integers(1, 8, (B, 3)), jnp.int32))
    label_lens = jnp.full((B,), 3, jnp.int32)

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(p, wave, ns, labels, label_lens, cfg,
                                   train=False))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_cf"))
    make_synthetic_corpus(root, n_utts=10, seed=7, min_dur=0.2, max_dur=0.4)
    return root


def test_conformer_train_predict_pg(corpus, tmp_path):
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model")
    cfg = tiny_config()
    out = train(corpus, model_dir, config=cfg, resume=False)
    assert np.isfinite(out["train_losses"]).all()
    assert out["config"].model.family == "conformer"
    assert os.path.exists(out["best_path"])

    from pg_asr_tpu.config import Config as C
    loaded = C.from_json(open(os.path.join(model_dir, "config.json")).read())
    assert loaded.model.family == "conformer"
    assert loaded.conformer == cfg.conformer

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, decoder="greedy")
    assert stats["num_utts"] >= 1
    stats_beam = predict(os.path.join(corpus, "test.tsv"),
                         os.path.join(corpus, "clips"),
                         os.path.join(corpus, "alphabet.txt"),
                         model_dir, batch_size=4, decoder="beam", beam_size=4)
    assert stats_beam["num_utts"] >= 1

    res = finetune_pg(corpus, model_dir, num_steps=2, batch_size=4,
                      config=cfg)
    assert np.isfinite(res["rewards"]).all()


def test_attn_softmax_bf16_close_and_roundtrips():
    """ConformerConfig.attn_softmax_bf16 (r5 perf default): the bf16
    score/softmax path must stay close to the f32 path on identical
    params/inputs (the A/B that gates the default measured equal
    convergence; benchmarks/attn_softmax_convergence.py), and the flag
    must survive a Config JSON round-trip so checkpointed runs reproduce
    their own numerics."""
    mcfg, ccfg = tiny_cfgs()
    mcfg = ModelConfig(**{**mcfg.__dict__, "dtype": "bfloat16"})
    params = conformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, ccfg)
    feats, mask, lens = _inputs()
    outs = {}
    for bf16 in (False, True):
        c = ConformerConfig(**{**ccfg.__dict__, "attn_softmax_bf16": bf16})
        lp, _, _ = conformer_ctc.apply(params, feats, mask, lens, mcfg, c)
        outs[bf16] = np.asarray(lp, np.float32)
    assert not np.array_equal(outs[False], outs[True]), (
        "bf16 flag had no effect on the computed scores")
    np.testing.assert_allclose(outs[False], outs[True], atol=0.15), (
        "bf16 softmax diverged from f32 beyond bf16 noise")

    cfg = tiny_config()
    cfg = cfg.replace(conformer=ConformerConfig(
        **{**cfg.conformer.__dict__, "attn_softmax_bf16": False}))
    back = Config.from_json(cfg.to_json())
    assert back.conformer.attn_softmax_bf16 is False
