"""LSTM scan: parity vs torch.nn.LSTM (the reference's recurrent engine) and
mask semantics matching pack/pad_packed behaviour."""

import numpy as np
import pytest

from pg_asr_tpu.ops.lstm import (bilstm_layer, init_bilstm_params,
                                 init_lstm_params, lstm_layer)


def _to_torch_lstm(params, input_dim, hidden, torch, reverse=False):
    lstm = torch.nn.LSTM(input_dim, hidden, num_layers=1, batch_first=True,
                         bidirectional=False)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(params["W"]).T))
        lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(params["U"]).T))
        lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b"])))
        lstm.bias_hh_l0.zero_()
    return lstm


def test_forward_lstm_matches_torch():
    torch = pytest.importorskip("torch")
    import jax

    rng = np.random.default_rng(0)
    B, T, I, H = 2, 7, 5, 4
    params = init_lstm_params(jax.random.PRNGKey(0), I, H)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    mask = np.ones((B, T), np.float32)

    ours = np.asarray(lstm_layer(params, x, mask))
    lstm = _to_torch_lstm(params, I, H, torch)
    with torch.no_grad():
        ref, _ = lstm(torch.tensor(x))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_reverse_lstm_matches_torch_on_flipped():
    torch = pytest.importorskip("torch")
    import jax

    rng = np.random.default_rng(1)
    B, T, I, H = 2, 6, 3, 4
    params = init_lstm_params(jax.random.PRNGKey(1), I, H)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    mask = np.ones((B, T), np.float32)

    ours = np.asarray(lstm_layer(params, x, mask, reverse=True))
    lstm = _to_torch_lstm(params, I, H, torch)
    with torch.no_grad():
        ref, _ = lstm(torch.tensor(x[:, ::-1].copy()))
    np.testing.assert_allclose(ours, ref.numpy()[:, ::-1], rtol=1e-4, atol=1e-5)


def test_masked_semantics_match_packed():
    """Variable lengths: outputs at pads are zero; valid outputs equal a
    per-utterance unpadded run (pack_padded_sequence semantics, reference
    model.py:53-55)."""
    import jax

    rng = np.random.default_rng(2)
    B, T, I, H = 3, 8, 4, 5
    lens = np.array([8, 5, 2])
    params = init_bilstm_params(jax.random.PRNGKey(2), I, H)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

    out = np.asarray(bilstm_layer(params, x, mask))
    assert out.shape == (B, T, 2 * H)
    for b in range(B):
        n = lens[b]
        solo = np.asarray(
            bilstm_layer(params, x[b : b + 1, :n], np.ones((1, n), np.float32))
        )
        np.testing.assert_allclose(out[b, :n], solo[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(out[b, n:], 0.0, atol=1e-6)


def test_bilstm_grad_flows():
    import jax
    import jax.numpy as jnp

    params = init_bilstm_params(jax.random.PRNGKey(3), 3, 4)
    x = jnp.ones((2, 5, 3))
    mask = jnp.ones((2, 5))

    def f(p):
        return jnp.sum(bilstm_layer(p, x, mask) ** 2)

    g = jax.grad(f)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)
    assert any(np.any(np.asarray(t) != 0) for t in flat)
