"""A/B the MHSA score/softmax precision at the d=256 bench shapes
(follow-up to the r5 small-shape breakdown: the attention core —
scores + f32 softmax + context — is the largest non-GEMM component of
both attention families: transformer 2.41 ms of a ~6.2 ms true step,
conformer 2.12 ms of ~9.8; docs/PERF.md).

The dense path materializes the (B, h, T', T') score tensor in f32
(softmax-input stability). At T'=251 that is 64 MB/layer each way; in
bf16 it halves. Softmax in bf16 is numerically safe here (max-subtract
is exact, the sum is over <=251 terms; relative attention-weight error
~1e-2), but it IS a semantics change, so it ships as a config option
only with this measured A/B + a convergence check (tests) behind it.

Times the exact bench.py family-chain rows with the module-global MHSA
monkeypatched to a bf16-score variant; caches cleared per row + final
losses asserted to differ (advisor r4 protocol).

Run (TPU): python benchmarks/attn_softmax_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pg_asr_tpu.models import conformer_ctc, transformer_ctc
from pg_asr_tpu.models.bilstm_ctc import linear

REPEATS = int(os.environ.get("AB_REPEATS", "5"))
STEPS = 16


def mhsa_bf16(p, x, key_bias, num_heads, flash_mask=None,
              softmax_bf16=False):
    """transformer_ctc._mhsa with scores+softmax in the compute dtype."""
    B, T, d = x.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x).reshape(B, T, 3, num_heads, dh)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    scores = scores * (1.0 / dh ** 0.5) + key_bias.astype(x.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=x.dtype)
    return linear(p["attn_out"], jnp.swapaxes(ctx, 1, 2).reshape(B, T, d))


def mhsa_rotary_bf16(p, x, key_bias, num_heads, flash_mask=None,
                     softmax_bf16=False):
    """conformer_ctc._mhsa_rotary with scores+softmax in compute dtype."""
    B, T, d = x.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x).reshape(B, T, 3, num_heads, dh)
    q = conformer_ctc._rotary(jnp.swapaxes(qkv[:, :, 0], 1, 2))
    k = conformer_ctc._rotary(jnp.swapaxes(qkv[:, :, 1], 1, 2))
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    scores = scores * (1.0 / dh ** 0.5) + key_bias.astype(x.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=x.dtype)
    return linear(p["attn_out"], jnp.swapaxes(ctx, 1, 2).reshape(B, T, d))


def time_family(family):
    """bench.py's exact family train chain, STEPS steps, min-over-REPEATS.
    Returns (ms_per_step, final_loss)."""
    jax.clear_caches()
    import bench

    from pg_asr_tpu.train import compute_loss, init_model_params, \
        make_optimizer
    from pg_asr_tpu.utils.rand import training_rng

    rng_np = np.random.default_rng(0)
    wave, ns, labels, llens = bench._workload(rng_np)
    arrays = tuple(jnp.asarray(a) for a in (wave, ns, labels, llens))
    cfg = bench._family_cfg(family)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    def one_step(carry, _):
        p, o, r = carry
        r, drop = jax.random.split(r)
        loss, grads = jax.value_and_grad(
            lambda q: compute_loss(q, arrays[0], arrays[1], arrays[2],
                                   arrays[3], cfg, train=True,
                                   dropout_rng=drop))(p)
        updates, o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), o, r), loss

    @jax.jit
    def chain(p, o, r):
        (p, o, r), losses = jax.lax.scan(one_step, (p, o, r), None,
                                         length=STEPS)
        return p, o, losses[-1]

    p, o, l = chain(params, opt_state, training_rng(0))
    jax.block_until_ready(l)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        p, o, l = chain(params, opt_state, training_rng(0))
        jax.block_until_ready(l)
        best = min(best, time.time() - t0)
    return best / STEPS * 1000.0, float(l)


def main():
    print(f"backend={jax.devices()[0].device_kind} "
          f"(bench-row configs, {STEPS}-step chains, min-over-{REPEATS}; "
          f"raw ms carry ~1.7 ms/step tunnel RTT)")
    out = {}
    for family, attr, patched in (
            ("transformer", "_mhsa", mhsa_bf16),
            ("conformer", "_mhsa_rotary", mhsa_rotary_bf16)):
        mod = transformer_ctc if family == "transformer" else conformer_ctc
        ms_f32, loss_f32 = time_family(family)
        print(f"{family:12s} f32 softmax   {ms_f32:8.2f} ms", flush=True)
        orig = getattr(mod, attr)
        setattr(mod, attr, patched)
        try:
            ms_bf16, loss_bf16 = time_family(family)
        finally:
            setattr(mod, attr, orig)
        assert loss_bf16 != loss_f32, (
            "bf16 patch produced the identical loss — did not take effect")
        print(f"{family:12s} bf16 softmax  {ms_bf16:8.2f} ms "
              f"(delta {ms_f32 - ms_bf16:+.2f}; losses {loss_f32:.4f} vs "
              f"{loss_bf16:.4f})", flush=True)
        out[family] = {"f32_ms": round(ms_f32, 3),
                       "bf16_ms": round(ms_bf16, 3)}
    import json

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
