"""The shared `_dropout` uses uint8 threshold masks (4x fewer random bits
than bernoulli's f32 uniforms — the largest non-matmul cost of the
transformer_large train step, benchmarks/attn_breakdown.py). These tests
pin the semantics the swap must preserve: exact quantized keep fraction,
unbiased expectation, eval-mode passthrough, rbg-key compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.models.bilstm_ctc import _dropout


def test_eval_mode_is_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(_dropout(x, 0.5, jax.random.PRNGKey(0), False), x)
    np.testing.assert_array_equal(_dropout(x, 0.0, jax.random.PRNGKey(0), True), x)
    np.testing.assert_array_equal(_dropout(x, 0.5, None, True), x)


@pytest.mark.parametrize("rate", [0.1, 0.3, 0.5])
def test_keep_fraction_matches_quantized_rate(rate):
    x = jnp.ones((512, 512))
    y = _dropout(x, rate, jax.random.PRNGKey(7), True)
    keep_p = 1.0 - round(rate * 256.0) / 256.0
    # the threshold quantizes the rate to 1/256 steps; the empirical keep
    # fraction must match the QUANTIZED probability, not the raw rate
    assert abs(float((y != 0).mean()) - keep_p) < 3e-3


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_unbiased_expectation(rate):
    x = jnp.full((512, 512), 2.0)
    y = _dropout(x, rate, jax.random.PRNGKey(3), True)
    # kept elements are scaled by 1/keep_p with the EXACT quantized keep_p,
    # so E[y] == x
    assert abs(float(y.mean()) - 2.0) < 2e-2


def test_rbg_key_compatible():
    # the train driver uses the rbg generator on TPU (utils/rand.py);
    # jax.random.bits must accept those keys too
    k = jax.random.key(0, impl="rbg")
    y = _dropout(jnp.ones((64, 64)), 0.2, k, True)
    assert abs(float(y.mean()) - 1.0) < 0.05
