"""Bare-GEMM rates at the SMALL (default bench) encoder shapes, measured
with a MARGINAL (two-length) protocol (VERDICT r4 #1/#2: prove what the
d=256 shapes can physically reach).

Protocol matters more than the shapes here. A single blocked timing of a
chained-GEMM executable pays the axon tunnel's fixed ~25 ms dispatch+
readback latency once per call; at the few-GFLOP sizes of the d=256
models that constant dominates and a naive total/L reads 4-8x slower
than the device truly runs (the first version of this harness concluded
"9.5% of peak ceiling" — BELOW the conformer's measured full-step 0.33
MFU, a contradiction that exposed the artifact). This version times each
shape at TWO chain lengths and reports the marginal rate
(t(2L) - t(L)) / L, which cancels the constant exactly.

Measured r5 on the v5e (see docs/PERF.md small-shape section): the fwd
GEMMs at M = B*T' = 12 864, K=256 run at ~90-95% of the bf16 nameplate —
the MXU is NOT starved by the small K; the families' 0.26-0.35 MFU gap
lives in the non-GEMM glue (attention softmax/score traffic, depthwise
conv, dropout masks, CTC scan), which the knockout breakdowns attribute
row by row.

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


def _timed(f, *args, reps=3):
    float(f(*args))  # compile/warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


def _marginal(make_chain, flops_per_iter, label):
    """Marginal rate between two chain lengths cancels the tunnel's fixed
    per-call latency. Lengths are auto-scaled so the Δ-window is ~0.4 s of
    device time: the RTT's run-to-run spread is ~0.5-2 ms, so a
    fixed-small-L window (the first rewrite used L=32/96) drowns the
    few-GFLOP shapes in noise and can print >100%-of-peak garbage."""
    iter_est = flops_per_iter / PEAK  # optimistic per-iter seconds
    L2 = max(int(0.4 / iter_est), 64)
    L1 = max(L2 // 4, 16)
    t1 = _timed(make_chain(L1), *make_chain.args)
    t2 = _timed(make_chain(L2), *make_chain.args)
    dt = max(t2 - t1, 1e-9)
    rate = flops_per_iter * (L2 - L1) / dt
    print(f"{label:44s} {rate / 1e12:7.1f} TF/s  {rate / PEAK:5.1%} of peak"
          f"   (L={L1}/{L2}, intercept "
          f"{1e3 * (t1 - dt * L1 / (L2 - L1)):.1f} ms)",
          flush=True)
    return rate


def bench_gemm(m, kk, n, label):
    """(m,kk)x(kk,n) then (m,n)x(n,kk) chained; dependency-carried."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, kk), jnp.bfloat16)
    a = jax.random.normal(key, (kk, n), jnp.bfloat16) * 0.02
    b = jax.random.normal(key, (n, kk), jnp.bfloat16) * 0.02

    def make_chain(iters):
        @jax.jit
        def f(x, a, b):
            def body(c, _):
                return jnp.dot(jnp.dot(c, a), b), ()
            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))
        return f

    make_chain.args = (x, a, b)
    return _marginal(make_chain, 2 * 2 * m * kk * n, label)


def bench_dw(label):
    """Backward dW shape: (D, M) x (M, 3D) — huge-K, tiny output."""
    key = jax.random.PRNGKey(2)
    act = jax.random.normal(key, (M, D), jnp.bfloat16)
    g = jax.random.normal(key, (M, 3 * D), jnp.bfloat16)

    def make_chain(iters):
        @jax.jit
        def f(act, g):
            def body(c, _):
                # carry-dependent operand so LICM can't hoist the dot out
                # of the loop (it did: the first run printed 5938% of peak)
                w = jnp.dot((act + (c * 1e-30).astype(act.dtype)).T, g)
                return jnp.sum(w.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c
        return f

    make_chain.args = (act, g)
    return _marginal(make_chain, 2 * D * M * 3 * D, label)


def bench_attn_einsum(label):
    """The attention score+context pair as batched (B*h) GEMMs at
    (T', dh) x (dh, T') — the shape XLA actually tiles for MHSA."""
    dh = D // H
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)
    k = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)
    v = jax.random.normal(key, (B * H, TP, dh), jnp.bfloat16)

    def make_chain(iters):
        @jax.jit
        def f(q, k, v):
            def body(c, _):
                s = jnp.einsum("bqd,bkd->bqk", c, k,
                               preferred_element_type=jnp.float32)
                ctx = jnp.einsum("bqk,bkd->bqd", s.astype(jnp.bfloat16), v)
                return ctx, ()
            c, _ = jax.lax.scan(body, q, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))
        return f

    make_chain.args = (q, k, v)
    return _marginal(make_chain, 2 * 2 * (B * H) * TP * TP * (D // H), label)


def main():
    print(f"backend={jax.devices()[0].device_kind} "
          f"M={M} (B={B} x T'={TP}) d={D}  marginal protocol, ~0.4 s windows")
    rates = {}
    rates["qkv"] = bench_gemm(M, D, 3 * D, "qkv (M,256)x(256,768)")
    rates["attn_out"] = bench_gemm(M, D, D, "attn_out (M,256)x(256,256)")
    rates["ffn"] = bench_gemm(M, D, 4 * D,
                              "ffn pair (M,256)x(256,1024)x(1024,256)")
    rates["dW"] = bench_dw("bwd dW (256,12864)x(12864,768)")
    rates["attn_einsums"] = bench_attn_einsum(
        "attention einsums (B*h)x(T',32)x(32,T')")
    rates["square4096"] = bench_gemm(4096, 4096, 4096,
                                     "square 4096^3 (MXU saturation ref)")
    # FLOP-weighted rate over a conformer block's GEMM mix (fwd weights;
    # bwd doubles every dX term and adds dW terms measured separately)
    fl_qkv = 2 * M * D * 3 * D
    fl_out = 2 * M * D * D
    fl_ffn = 2 * (2 * M * D * 4 * D)
    fl_conv_pw = 2 * (M * D * 2 * D + M * D * D)
    fl_attn = 2 * 2 * (B * H) * TP * TP * (D // H)
    tot = fl_qkv + fl_out + fl_ffn + fl_conv_pw + fl_attn
    w_rate = tot / (fl_qkv / rates["qkv"]
                    + fl_out / rates["attn_out"]
                    + (fl_ffn + fl_conv_pw) / rates["ffn"]
                    + fl_attn / rates["attn_einsums"])
    print(f"\nFLOP-weighted conformer-block fwd GEMM rate: "
          f"{w_rate / 1e12:.1f} TF/s ({w_rate / PEAK:.1%} of peak) — the "
          f"MFU gap is NOT the GEMMs; see the knockout breakdowns for "
          f"where it lives.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
