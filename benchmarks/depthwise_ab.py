"""A/B the conformer depthwise-conv implementation at bench shapes
(follow-up to conformer_breakdown.py r5: the conv module is ~1.3 ms of
the no-dropout step — the second-largest non-GEMM component).

RESULT (r5, v5e): a wash — grouped 0.770 / tap-sum 0.778 / two-halves
0.784 ms per fwd+bwd call at 32-call chains, and those totals are ~the
tunnel RTT alone, i.e. the ISOLATED conv window op costs ~50 us — near
its ~40 MB traffic roofline. The knockout's 1.27 ms/step is therefore
not the conv op's lowering (all three are equal) but the module's
surrounding memory traffic in context (mid-LN + swish + the extra HBM
round-trips between the pointwise GEMMs). The grouped
lax.conv_general_dilated stays.

Three candidate lowerings of the (B, T, d) depthwise conv, k=15, fwd+bwd:
  grouped   lax.conv_general_dilated feature_group_count=d (current,
            models/conformer_ctc.py:_conv_module)
  tapsum    k static slices of the padded input, fused multiply-add —
            pure VPU elementwise, no conv op
  unrolled8 tapsum but accumulated in two halves (checks whether XLA's
            fusion of 15 shifted reads thrashes VMEM)

Each is timed as loss = sum(conv(x)*g) with value_and_grad (so dgrad +
wgrad run too), chained 32x. Prints ms per call; parity asserted first.

Run (TPU): python benchmarks/depthwise_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

B, T, D, K = 64, 201, 256, 15
PAD = (K - 1) // 2


def conv_grouped(x, w):
    return jax.lax.conv_general_dilated(
        x, w.reshape(K, 1, D), window_strides=(1,),
        padding=[(PAD, K - 1 - PAD)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=D)


def conv_tapsum(x, w):
    xp = jnp.pad(x, ((0, 0), (PAD, K - 1 - PAD), (0, 0)))
    acc = xp[:, 0:T, :] * w[0][None, None, :]
    for j in range(1, K):
        acc = acc + xp[:, j:j + T, :] * w[j][None, None, :]
    return acc


def conv_tapsum_halves(x, w):
    xp = jnp.pad(x, ((0, 0), (PAD, K - 1 - PAD), (0, 0)))

    def half(lo, hi):
        acc = xp[:, lo:lo + T, :] * w[lo][None, None, :]
        for j in range(lo + 1, hi):
            acc = acc + xp[:, j:j + T, :] * w[j][None, None, :]
        return acc

    return half(0, K // 2) + half(K // 2, K)


def timed(fn, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, D), jnp.bfloat16) * 0.2
    g = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(c, _):
            def loss(w):
                return jnp.sum((fn(c, w) * g).astype(jnp.float32))
            l, dw = jax.value_and_grad(loss)(w)
            return c + (1e-12 * l).astype(c.dtype), l
        c, ls = jax.lax.scan(body, x, None, length=32)
        return ls[-1]

    float(chain(x, w))
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(chain(x, w))
        best = min(best, time.time() - t0)
    print(f"{label:28s} {best / 32 * 1000:8.3f} ms/call (fwd+bwd)",
          flush=True)
    return best


def main():
    # parity first (f32, CPU-friendly tolerances)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 33, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (K, D), jnp.float32)
    ref = conv_grouped(x, w)
    for fn in (conv_tapsum, conv_tapsum_halves):
        global T
        T_saved = T
        T = 33
        try:
            got = fn(x, w)
        finally:
            T = T_saved
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    print(f"parity ok; backend={jax.devices()[0].device_kind} "
          f"B={B} T={T} d={D} k={K}")
    timed(conv_grouped, "grouped conv (current)")
    timed(conv_tapsum, "tap-sum (15 fused FMAs)")
    timed(conv_tapsum_halves, "tap-sum, two halves")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
