"""Bare-GEMM ceiling at the SMALL (default bench) encoder shapes
(VERDICT r4 #1/#2: transformer MFU 0.27 / conformer 0.32 vs targets
0.33/0.40 — prove what the d=256 shapes can physically reach).

The small encoders' matmuls all have huge M (B*T' ~= 12.9k activation
rows) but small K/N (256/768/1024). The MXU is a 128x128 systolic array:
a K=256 contraction runs 2 passes deep, so weight-stationary efficiency
and HBM streaming of the activations bound the rate well below the
square-shape nameplate. This harness measures bare bf16 GEMM chains at
the models' EXACT shapes with nothing around them; the fraction-of-peak
it reports IS the MFU ceiling any full step at these shapes can approach
(cost-analysis FLOPs / step time / nameplate — same accounting as
bench.py's mfu field).

Shapes (fwd; the backward runs the transposes, measured separately):
  qkv        (M, 256)  x (256, 768)
  attn_out   (M, 256)  x (256, 256)
  ffn_in     (M, 256)  x (256, 1024)
  ffn_out    (M, 1024) x (1024, 256)
  scores/ctx attention einsums at (B*h, T', dh) x (B*h, dh, T')

Run (TPU): python benchmarks/small_shape_ceiling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

PEAK = 197e12  # v5e bf16 dense nameplate
B, TP, D, H = 64, 201, 256, 4  # bench conformer/transformer small shapes
M = B * TP  # 12 864 activation rows


def bench_gemm(m, kk, n, label, iters=64):
    """One (m,kk)x(kk,n) GEMM chained iters times; best-of-3 TF/s."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, kk), jnp.bfloat16)
    a = jax.random.normal(key, (kk, n), jnp.bfloat16) * 0.02
    b = jax.random.normal(key, (n, kk), jnp.bfloat16) * 0.02

    @jax.jit
    def f(x, a, b):
        def body(c, _):
            return jnp.dot(jnp.dot(c, a), b), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    float(f(x, a, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(x, a, b))
        best = min(best, time.time() - t0)
    fl = iters * 2 * 2 * m * kk * n  # two GEMMs per iteration
    rate = fl / best
    print(f"{label:42s} {rate / 1e12:7.1f} TF/s  {rate / PEAK:5.1%} of peak",
          flush=True)
    return rate


def bench_attn_einsum(label, iters=64):
    """The attention score+context pair as batched (B*h) GEMMs at
    (T', dh) x (dh, T') — the shape XLA actually tiles for MHSA."""
    dh = D // H
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)
    k = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)
    v = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)

    @jax.jit
    def f(q, k, v):
        def body(c, _):
            s = jnp.einsum("bqd,bkd->bqk", c, k,
                           preferred_element_type=jnp.float32)
            ctx = jnp.einsum("bqk,bkd->bqd", s.astype(jnp.bfloat16), v)
            return ctx, ()
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    float(f(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(q, k, v))
        best = min(best, time.time() - t0)
    fl = iters * 2 * 2 * (B * H) * TP * TP * dh
    rate = fl / best
    print(f"{label:42s} {rate / 1e12:7.1f} TF/s  {rate / PEAK:5.1%} of peak",
          flush=True)
    return rate


def main():
    print(f"backend={jax.devices()[0].device_kind} "
          f"M={M} (B={B} x T'={TP}) d={D}")
    rates = {}
    rates["qkv 256x768"] = bench_gemm(M, D, 3 * D, "qkv (M,256)x(256,768)")
    rates["attn_out 256x256"] = bench_gemm(M, D, D,
                                           "attn_out (M,256)x(256,256)")
    rates["ffn 256x1024"] = bench_gemm(M, D, 4 * D,
                                       "ffn pair (M,256)x(256,1024)x(1024,256)")
    rates["attn einsums"] = bench_attn_einsum(
        "attention einsums (B*h)x(T',32)x(32,T')")
    # reference points: what the chip gives big shapes
    rates["square 4096"] = bench_gemm(4096, 4096, 4096,
                                      "square 4096^3 (MXU saturation ref)",
                                      iters=16)
    rates["large ffn 1024x4096"] = bench_gemm(8000, 1024, 4096,
                                              "large-model ffn (8000,1024)x"
                                              "(1024,4096)", iters=16)
    # FLOP-weighted ceiling for the conformer step: weights from the
    # model's per-block GEMM FLOPs (fwd; bwd doubles every term equally
    # so the weighting is unchanged)
    fl_qkv = 2 * M * D * 3 * D
    fl_out = 2 * M * D * D
    fl_ffn = 2 * (2 * M * D * 4 * D)  # two macaron FFN pairs per block
    fl_conv_pw = 2 * (M * D * 2 * D + M * D * D)  # GLU in + out pointwise
    fl_attn = 2 * 2 * (B * H) * TP * TP * (D // H)
    tot = fl_qkv + fl_out + fl_ffn + fl_conv_pw + fl_attn
    w_rate = tot / (fl_qkv / rates["qkv 256x768"]
                    + fl_out / rates["attn_out 256x256"]
                    + (fl_ffn + fl_conv_pw) / rates["ffn 256x1024"]
                    + fl_attn / rates["attn einsums"])
    print(f"\nFLOP-weighted conformer-block GEMM rate: "
          f"{w_rate / 1e12:.1f} TF/s -> MFU ceiling if everything "
          f"non-GEMM were free: {w_rate / PEAK:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
