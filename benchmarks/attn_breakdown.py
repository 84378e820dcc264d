"""Per-component breakdown of the attention-family train step (VERDICT r2
weak #1: prove or fix the MFU gap).

Measures the transformer_large (16L x d1024 x ffn4096, bf16, B=64, T'~100)
train step on the real chip under component knockouts:

  full            adamw + dropout 0.1 (the bench row)
  no-dropout      adamw, dropout 0
  sgd             sgd, dropout 0 (optimizer-state HBM traffic isolated)
  fwd+loss        value only, no backward
  no-attn         _mhsa's score/softmax/context replaced by an identity
                  pass-through of v (isolates the attention einsums+softmax)
  ln-bf16         LayerNorm computed in bf16 (isolates the f32 cast cost)

Knockouts change semantics — they are for ATTRIBUTION only. Run:
  python benchmarks/attn_breakdown.py [small|large]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransformerConfig)
from pg_asr_tpu.models import transformer_ctc
from pg_asr_tpu.ops.ctc import ctc_loss_mean
from pg_asr_tpu.ops.features import extract_features

BATCH = int(os.environ.get("ATTN_BATCH", "64"))
SECONDS = float(os.environ.get("ATTN_SECONDS", "5.0"))
# bench.py's `transformer` row runs the config DEFAULT subsample=2
# (T'~250); set ATTN_SUBSAMPLE=2 to attribute that exact shape.
SUBSAMPLE = int(os.environ.get("ATTN_SUBSAMPLE", "4"))
REPEATS = int(os.environ.get("ATTN_REPEATS", "3"))
VOCAB = 64
LABEL_LEN = 24

# default: the train driver's RNG (rbg hardware generator on TPU,
# utils/rand.py). ATTN_RNG=threefry isolates the generator's own cost.
def _rng_key():
    if os.environ.get("ATTN_RNG") == "threefry":
        return jax.random.PRNGKey(1)
    from pg_asr_tpu.utils.rand import training_rng
    return training_rng(1)


def make_cfg(size: str, dropout: float, flash: bool = False) -> Config:
    if size == "large":
        t = TransformerConfig(num_layers=16, d_model=1024, num_heads=16,
                              ffn_dim=4096, subsample=4, dropout=dropout,
                              flash_attention=flash)
    else:
        t = TransformerConfig(num_layers=6, d_model=256, num_heads=4,
                              ffn_dim=1024, subsample=SUBSAMPLE,
                              dropout=dropout, flash_attention=flash)
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=80),
        model=ModelConfig(family="transformer", vocab_size=VOCAB,
                          input_dim=80, dropout=dropout, dtype="bfloat16"),
        transformer=t,
        train=TrainConfig(batch_size=BATCH, warmup_steps=0),
    )


def workload(rng):
    n = int(SECONDS * 16000)
    wave = jnp.asarray(rng.standard_normal((BATCH, n)) * 0.1, jnp.float32)
    ns = jnp.full((BATCH,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, VOCAB, (BATCH, LABEL_LEN)), jnp.int32)
    llens = jnp.full((BATCH,), LABEL_LEN, jnp.int32)
    return wave, ns, labels, llens


def time_step(cfg, opt, data, steps=16, grad=True):
    # transformer_ctc.apply is itself @jit with static cfgs: a warm pjit
    # trace cache would silently serve the UNPATCHED jaxpr to knockout
    # rows whose statics/avals match an earlier row (advisor r4, medium).
    # Clear all caches so every row re-traces and resolves the patched
    # globals. Returns (ms_per_step, final_loss) for the sanity assert.
    jax.clear_caches()
    wave, ns, labels, llens = data
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                         cfg.transformer)
    opt_state = opt.init(params) if opt is not None else None

    def loss_fn(p, rng):
        feats, fmask, flens = extract_features(wave, ns, cfg.features)
        lp, mask, olens = transformer_ctc.apply(
            p, feats, fmask, flens, cfg.model, cfg.transformer,
            train=cfg.model.dropout > 0, dropout_rng=rng)
        return ctc_loss_mean(lp, olens, labels, llens)

    if grad:
        @jax.jit
        def chain(params, opt_state, rng):
            def body(carry, _):
                params, opt_state, rng = carry
                rng, k = jax.random.split(rng)
                loss, grads = jax.value_and_grad(loss_fn)(params, k)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), loss
            carry, losses = jax.lax.scan(body, (params, opt_state, rng),
                                         None, length=steps)
            return carry[0], carry[1], losses[-1]

        key = _rng_key()
        p, o, l = chain(params, opt_state, key)
        jax.block_until_ready(l)
        best = float("inf")
        for _ in range(REPEATS):  # min over repeats: robust to transient
            t0 = time.time()      # host/chip contention on a shared box
            p, o, l = chain(params, opt_state, key)
            jax.block_until_ready(l)
            best = min(best, time.time() - t0)
        return best / steps * 1000.0, float(l)
    else:
        @jax.jit
        def chain(params, rng):
            def body(carry, _):
                params, rng = carry
                rng, k = jax.random.split(rng)
                loss = loss_fn(params, k)
                # keep a param dependency so LICM can't hoist the forward
                params = jax.tree_util.tree_map(
                    lambda x: x + (1e-12 * loss).astype(x.dtype), params)
                return (params, rng), loss
            carry, losses = jax.lax.scan(body, (params, rng), None,
                                         length=steps)
            return losses[-1]

        key = _rng_key()
        l = chain(params, key)
        jax.block_until_ready(l)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            l = chain(params, key)
            jax.block_until_ready(l)
            best = min(best, time.time() - t0)
        return best / steps * 1000.0, float(l)


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "large"
    rng = np.random.default_rng(0)
    data = workload(rng)
    adamw = optax.adamw(1e-4)
    sgd = optax.sgd(1e-4)
    print(f"backend={jax.devices()[0].device_kind} size={size} B={BATCH}"
          + (f" subsample={SUBSAMPLE}" if size == "small" else ""))

    rows = []
    baseline_loss = [None]

    def row(name, result, knockout=False):
        ms, loss = result
        if knockout and baseline_loss[0] is not None:
            # a knockout changes semantics; identical loss means the
            # monkeypatch silently didn't take effect (advisor r4)
            assert loss != baseline_loss[0], (
                f"knockout '{name}' produced the baseline loss "
                f"{loss} — the patch did not take effect")
        rows.append((name, ms))
        print(f"{name:36s} {ms:8.2f} ms")
        return ms, loss

    row("full (adamw, dropout .1)", time_step(make_cfg(size, 0.1), adamw, data))
    _, bl = row("no dropout", time_step(make_cfg(size, 0.0), adamw, data))
    baseline_loss[0] = bl
    row("sgd, no dropout", time_step(make_cfg(size, 0.0), sgd, data))
    row("forward+loss only", time_step(make_cfg(size, 0.0), None, data, grad=False))

    # knockout: attention einsums+softmax -> pass-through of v
    orig = transformer_ctc._mhsa

    def mhsa_noattn(p, x, key_bias, num_heads, flash_mask=None):
        from pg_asr_tpu.models.bilstm_ctc import linear
        qkv = linear(p["qkv"], x)
        v = qkv[..., 2 * x.shape[-1]:]
        return linear(p["attn_out"], v)

    transformer_ctc._mhsa = mhsa_noattn
    try:
        row("no attention (qkv/out kept)",
            time_step(make_cfg(size, 0.0), adamw, data), knockout=True)
    finally:
        transformer_ctc._mhsa = orig

    # knockout: CTC loss -> mean logit (isolates the T'-step sequential
    # forward-backward scan in ops/ctc.py). Patch THIS module's global —
    # time_step's loss_fn resolves the name here at trace time.
    g = globals()
    orig_ctc = g["ctc_loss_mean"]
    g["ctc_loss_mean"] = lambda lp, olens, labels, llens: jnp.mean(lp)
    try:
        row("no CTC (mean-logit loss)",
            time_step(make_cfg(size, 0.0), adamw, data), knockout=True)
    finally:
        g["ctc_loss_mean"] = orig_ctc

    # knockout: feature frontend -> precomputed constants (isolates the
    # STFT-conv + log-mel + normalization; the arrays become jaxpr
    # constants, so the step starts at the encoder input)
    wave, ns, _, _ = data
    pre = extract_features(wave, ns, make_cfg(size, 0.0).features)
    pre = jax.tree_util.tree_map(jax.block_until_ready, pre)
    orig_feats = g["extract_features"]
    g["extract_features"] = lambda w, n, fc: pre
    try:
        row("no frontend (precomputed feats)",
            time_step(make_cfg(size, 0.0), adamw, data), knockout=True)
    finally:
        g["extract_features"] = orig_feats

    # knockout: LayerNorm in bf16 (no f32 casts)
    orig_ln = transformer_ctc._layer_norm

    def ln_bf16(p, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

    transformer_ctc._layer_norm = ln_bf16
    try:
        row("bf16 LayerNorm",
            time_step(make_cfg(size, 0.0), adamw, data), knockout=True)
    finally:
        transformer_ctc._layer_norm = orig_ln

    # A/B (not a knockout — same semantics): Pallas flash-attention MHSA
    # vs the dense einsum path (ops/flash_attn.py). Opt-in: the kernel's
    # Mosaic compile hangs >7 min over the axon tunnel (measured, see
    # docs/PERF.md), so it must not gate the main table.
    if os.environ.get("ATTN_FLASH") and jax.default_backend() == "tpu":
        row("full + flash attention",
            time_step(make_cfg(size, 0.1, flash=True), adamw, data))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
