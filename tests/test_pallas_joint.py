"""Pallas fused joint-lattice kernel vs the unfused joint composition
(interpret mode on CPU; the same kernels compile on real TPU).

Reference semantics: joint_log_probs(linear(joint_out, tanh(e ⊕ g)),
labels) — models/transducer.py:joint_logits + ops/transducer.py:
joint_log_probs, themselves the TPU rebuild of the transducer objective's
emission tables (the reference framework is CTC-only; see
ops/transducer.py header)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pg_asr_tpu.ops.pallas_joint import fused_joint_log_probs
from pg_asr_tpu.ops.transducer import joint_log_probs

INTERPRET = jax.default_backend() != "tpu"


def _make(B=3, T=11, U=6, J=32, A=8, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((B, T, J)).astype(dtype) * 0.5
    g = rng.standard_normal((B, U + 1, J)).astype(dtype) * 0.5
    W = rng.standard_normal((J, A)).astype(dtype) * 0.2
    b = rng.standard_normal((A,)).astype(dtype) * 0.1
    labels = rng.integers(1, A, (B, U)).astype(np.int32)
    return (jnp.asarray(e), jnp.asarray(g), jnp.asarray(W), jnp.asarray(b),
            jnp.asarray(labels))


def _reference(e, g, W, b, labels):
    h = jnp.tanh(e[:, :, None, :] + g[:, None, :, :])
    logits = jnp.einsum("btuj,ja->btua", h, W,
                        preferred_element_type=jnp.float32) + b
    return joint_log_probs(logits, labels)


@pytest.mark.parametrize("T", [11, 16])  # non-multiple AND multiple of TBLK
def test_fused_matches_reference(T):
    e, g, W, b, labels = _make(T=T)
    onehot = jax.nn.one_hot(labels, W.shape[1], dtype=jnp.float32)
    ref_b, ref_y = _reference(e, g, W, b, labels)
    got_b, got_y = fused_joint_log_probs(e, g, W, b, onehot, INTERPRET)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_reference():
    e, g, W, b, labels = _make(T=13, seed=3)
    onehot = jax.nn.one_hot(labels, W.shape[1], dtype=jnp.float32)
    rng = np.random.default_rng(7)
    gb = jnp.asarray(rng.standard_normal((3, 13, 7)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((3, 13, 6)).astype(np.float32))

    def obj_ref(e, g, W, b):
        lb, ly = _reference(e, g, W, b, labels)
        return jnp.sum(lb * gb) + jnp.sum(ly * gy)

    def obj_fused(e, g, W, b):
        lb, ly = fused_joint_log_probs(e, g, W, b, onehot, INTERPRET)
        return jnp.sum(lb * gb) + jnp.sum(ly * gy)

    ref = jax.grad(obj_ref, argnums=(0, 1, 2, 3))(e, g, W, b)
    got = jax.grad(obj_fused, argnums=(0, 1, 2, 3))(e, g, W, b)
    for r, o, name in zip(ref, got, ("de", "dg", "dW", "db")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_under_vmap():
    """The MWER path (rl/reinforce.py) vmaps the joint over K hypotheses —
    pallas_call's batching rule must produce the same tables."""
    e, g, W, b, _ = _make(T=8)
    rng = np.random.default_rng(5)
    K = 3
    hyps = jnp.asarray(rng.integers(1, W.shape[1], (3, K, 6)), jnp.int32)

    def one(h):
        onehot = jax.nn.one_hot(h, W.shape[1], dtype=jnp.float32)
        return fused_joint_log_probs(e, g, W, b, onehot, INTERPRET)

    got_b, got_y = jax.vmap(one, in_axes=1, out_axes=1)(hyps)
    for k in range(K):
        ref_b, ref_y = _reference(e, g, W, b, hyps[:, k])
        np.testing.assert_allclose(np.asarray(got_b[:, k]),
                                   np.asarray(ref_b), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_y[:, k]),
                                   np.asarray(ref_y), rtol=1e-5, atol=1e-5)


def test_model_path_fused_vs_unfused():
    """joint_lattice_log_probs with fused_joint forced on vs off must agree
    through the real transducer params/loss (end contract, f32 inputs)."""
    from dataclasses import replace

    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TransducerConfig)
    from pg_asr_tpu.models import transducer
    from pg_asr_tpu.ops.transducer import transducer_loss

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16),
        model=ModelConfig(family="transducer", vocab_size=9, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1,
                          dropout=0.0, dtype="float32"),
        transducer=TransducerConfig(encoder="bilstm", pred_embed_dim=8,
                                    pred_hidden=16, joint_dim=32),
    )
    params = transducer.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, T, U = 2, 9, 5
    feats = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    fmask = jnp.ones((B, T), jnp.float32)
    flens = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    llens = jnp.array([U, 3], jnp.int32)

    enc, _, out_lens = transducer.encode(params, feats, fmask, flens, cfg)
    pred = transducer.predict_states(params, labels, llens, cfg)

    cfg_on = replace(cfg, transducer=replace(cfg.transducer,
                                             fused_joint=True))
    cfg_off = replace(cfg, transducer=replace(cfg.transducer,
                                              fused_joint=False))
    # interpret-mode routing: on CPU the kernel only runs interpreted, so
    # patch the module default through the env-free path
    import pg_asr_tpu.models.transducer as tmod
    import pg_asr_tpu.ops.pallas_joint as pj

    orig = pj.fused_joint_log_probs
    if INTERPRET:
        def interp(e, g, W, b, onehot, interpret=False):
            return orig(e, g, W, b, onehot, True)

        pj.fused_joint_log_probs = interp
    try:
        lb_on, ly_on = tmod.joint_lattice_log_probs(params, enc, pred,
                                                    labels, cfg_on)
    finally:
        pj.fused_joint_log_probs = orig
    lb_off, ly_off = tmod.joint_lattice_log_probs(params, enc, pred,
                                                  labels, cfg_off)
    np.testing.assert_allclose(np.asarray(lb_on), np.asarray(lb_off),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ly_on), np.asarray(ly_off),
                               rtol=1e-5, atol=1e-5)
    nll_on = transducer_loss(lb_on, ly_on, out_lens, llens)
    nll_off = transducer_loss(lb_off, ly_off, out_lens, llens)
    np.testing.assert_allclose(np.asarray(nll_on), np.asarray(nll_off),
                               rtol=1e-5, atol=1e-5)
