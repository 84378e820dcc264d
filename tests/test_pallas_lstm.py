"""Pallas fused LSTM kernel vs the jnp lax.scan reference (interpret mode on
CPU; the same test compiles on real TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pg_asr_tpu.ops.lstm import init_lstm_params, lstm_scan
from pg_asr_tpu.ops.pallas_lstm import pallas_lstm_scan

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_matches_jnp(reverse):
    rng = np.random.default_rng(0)
    B, T, I, H = 8, 12, 16, 32
    params = init_lstm_params(jax.random.PRNGKey(0), I, H)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    xp = jnp.einsum("bti,ih->bth", jnp.asarray(x), params["W"]) + params["b"]
    lens = np.array([12, 7, 12, 3, 12, 1, 9, 12])
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

    ref = lstm_scan(xp, params["U"], jnp.asarray(mask), H, reverse=reverse)
    got = pallas_lstm_scan(xp, params["U"], jnp.asarray(mask),
                           reverse, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_grads_match_jnp():
    rng = np.random.default_rng(1)
    B, T, H = 4, 6, 16
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32)) * 0.3
    U = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    mask = jnp.ones((B, T))

    def f_pallas(xp, U):
        return jnp.sum(pallas_lstm_scan(xp, U, mask, False, INTERPRET) ** 2)

    def f_ref(xp, U):
        return jnp.sum(lstm_scan(xp, U, mask, H) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1))(xp, U)
    g2 = jax.grad(f_ref, argnums=(0, 1))(xp, U)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_grads_match_jnp_masked(reverse):
    """Variable lengths exercise the carry-freeze terms of the backward
    kernel ((1-m) pass-through of dh/dc across padded steps)."""
    rng = np.random.default_rng(2)
    B, T, H = 4, 9, 16
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32)) * 0.3
    U = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    lens = np.array([9, 4, 1, 7])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def f_pallas(xp, U):
        return jnp.sum(pallas_lstm_scan(xp, U, mask, reverse, INTERPRET) * gy)

    def f_ref(xp, U):
        return jnp.sum(lstm_scan(xp, U, mask, H, reverse=reverse) * gy)

    v1, g1 = jax.value_and_grad(f_pallas, argnums=(0, 1))(xp, U)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1))(xp, U)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_bilstm_matches_two_scans():
    """pallas_bilstm_scan == concat(fwd scan, reverse scan), values + grads,
    variable lengths."""
    from pg_asr_tpu.ops.pallas_lstm import pallas_bilstm_scan

    rng = np.random.default_rng(3)
    B, T, H = 4, 9, 16
    xpf = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32)) * 0.3
    xpb = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32)) * 0.3
    Uf = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    Ub = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    lens = np.array([9, 4, 1, 7])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((B, T, 2 * H)).astype(np.float32))

    def f_fused(xpf, xpb, Uf, Ub):
        return jnp.sum(pallas_bilstm_scan(xpf, xpb, Uf, Ub, mask, INTERPRET) * gy)

    def f_ref(xpf, xpb, Uf, Ub):
        y = jnp.concatenate([lstm_scan(xpf, Uf, mask, H),
                             lstm_scan(xpb, Ub, mask, H, reverse=True)], -1)
        return jnp.sum(y * gy)

    v1, g1 = jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3))(xpf, xpb, Uf, Ub)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(xpf, xpb, Uf, Ub)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bilstm_layer_pallas_path_matches_scan_path():
    from pg_asr_tpu.ops.lstm import bilstm_layer, init_bilstm_params

    rng = np.random.default_rng(4)
    B, T, I, H = 3, 7, 8, 16
    params = init_bilstm_params(jax.random.PRNGKey(1), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    lens = np.array([7, 3, 5])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))

    ref = bilstm_layer(params, x, mask)
    got = bilstm_layer(params, x, mask, use_pallas=True, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
