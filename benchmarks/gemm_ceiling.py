"""Bare-GEMM ceiling for the transformer_large step shapes (VERDICT r2
weak #1 follow-up).

attn_breakdown.py showed the transformer_large train step is matmul-bound:
knocking out attention einsums+softmax, f32 LayerNorm, or dropout each
move the 69.6 ms step by <0.5 ms, and swapping adamw->sgd saves 3.9 ms
(of which ~3.4 ms is irreducible optimizer-state HBM traffic).  This
harness asks the remaining question: what rate does THIS chip reach on
bare bf16 GEMM chains — at the model's exact shapes (B*T'=8000 rows,
1024x4096 FFN) and at MXU-saturating square shapes — with no framework
around them?  If the bare chain matches the model's achieved TFLOP/s
(bench.py: 110.8 TF/s for transformer_large), the model is AT the kernel
ceiling and the MFU gap vs the 197 TF/s nameplate is a property of the
chip/shapes, not framework overhead.

Timing notes (hard-won, see docs/PERF.md "Measurement protocol"):
 - fetch a data-dependent scalar with float(...) per timed call;
   block_until_ready on big pytrees through the axon tunnel has returned
   early in the past and lets XLA elide dead chains.
 - keep per-call work >= ~100 ms so the fixed tunnel round-trip
   (~3-4 ms) stays <5% of the reading; report the best of 3.

Run: python benchmarks/gemm_ceiling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK = 197e12  # v5e bf16 dense nameplate (394 is int8)


def bench(m, kk, n, iters, label):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, kk), jnp.bfloat16)
    a = jax.random.normal(key, (kk, n), jnp.bfloat16) * 0.02

    @jax.jit
    def f(x, a):
        def body(c, _):
            y = jnp.dot(c, a)
            return (jnp.dot(y, a.T) if kk != n else y), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    float(f(x, a))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(x, a))
        best = min(best, time.time() - t0)
    per = 2 if kk != n else 1
    fl = iters * per * 2 * m * kk * n
    print(f"{label:44s} {best * 1000:8.1f} ms  {fl / best / 1e12:7.1f} TF/s"
          f"  {fl / best / PEAK:5.1%} of 197TF", flush=True)


def main():
    print(f"backend={jax.devices()[0].device_kind}")
    # the model's own shapes: 8000 activation rows through the FFN pair
    bench(8000, 1024, 4096, 128, "ffn pair 8000x1024x4096")
    bench(8064, 1024, 4096, 128, "ffn pair 8064x(1024x4096) (128-mult rows)")
    bench(16384, 1024, 4096, 64, "ffn pair 16384x(1024x4096)")
    # MXU-saturating square: the chip's achievable bf16 peak
    bench(8192, 8192, 8192, 32, "square 8192^3")
    # DEFAULT-shape rows (VERDICT r3 #6): the d=256 transformer/conformer
    # families push B*T'=16000 activation rows through 256-wide matmuls —
    # the contraction dim is 2 MXU tiles, so the per-tile pipeline never
    # amortizes. If the bare rate here matches the models' achieved TF/s,
    # their 0.22-0.33 MFU is the SHAPE ceiling, not framework overhead.
    bench(16000, 256, 1024, 512, "ffn pair 16000x(256x1024) (d=256 small)")
    bench(16000, 256, 768, 512, "qkv-ish pair 16000x(256x768)")
    bench(16000, 256, 256, 1024, "square chain 16000x256x256")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
