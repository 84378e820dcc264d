"""Per-component breakdown of the conformer-CTC train step at the DEFAULT
bench shapes (VERDICT r3 #6: the size-ceiling argument was proven only at
202M params — measure where the small-shape step actually spends time).

Same methodology as attn_breakdown.py (64-utt batch, chained jitted steps,
min-over-repeats timing): component knockouts change semantics and are for
ATTRIBUTION only. Rows:

  full            adamw + dropout 0.1 (the bench `conformer` row)
  no-dropout      adamw, dropout 0
  sgd             sgd, dropout 0 (optimizer HBM traffic isolated)
  fwd+loss        value only, no backward
  no-attn         _mhsa_rotary -> pass-through of v (qkv/out matmuls kept;
                  isolates score/softmax/context einsums + rotary)
  no-rotary       _rotary -> identity (isolates the sin/cos elementwise)
  no-depthwise    _conv_module keeps its pointwise matmuls + GLU but skips
                  depthwise conv + mid-LN + swish (isolates the conv window)
  bf16-LN         LayerNorm without f32 casts

ATTN_FLASH=1 adds a semantics-preserving A/B row through the Pallas flash
kernel (ops/flash_attn.py; compile is slow over the axon tunnel — opt-in).
Run: python benchmarks/conformer_breakdown.py
Env: CONF_BATCH, CONF_SECONDS, CONF_REPEATS, ATTN_FLASH.
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

from pg_asr_tpu.config import (Config, ConformerConfig, FeatureConfig,
                               ModelConfig, TrainConfig)
from pg_asr_tpu.models import conformer_ctc
from pg_asr_tpu.models.bilstm_ctc import linear
from pg_asr_tpu.ops.ctc import ctc_loss_mean
from pg_asr_tpu.ops.features import extract_features

BATCH = int(os.environ.get("CONF_BATCH", "64"))
SECONDS = float(os.environ.get("CONF_SECONDS", "5.0"))
REPEATS = int(os.environ.get("CONF_REPEATS", "3"))
VOCAB = 64
LABEL_LEN = 24


def make_cfg(dropout: float, flash: bool = False) -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=80),
        model=ModelConfig(family="conformer", vocab_size=VOCAB,
                          input_dim=80, dropout=dropout, dtype="bfloat16"),
        conformer=ConformerConfig(dropout=dropout, flash_attention=flash),
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
    # conformer_ctc.apply is itself @jit with static cfgs: a warm pjit
    # trace cache would silently serve the UNPATCHED jaxpr to every
    # knockout row whose statics/avals match an earlier row (advisor r4,
    # high). Clearing all caches forces a fresh trace that resolves the
    # monkeypatched globals. Returns (ms_per_step, final_loss) — callers
    # assert a knockout's loss differs from baseline as proof the patch
    # took effect.
    jax.clear_caches()
    wave, ns, labels, llens = data
    params = conformer_ctc.init_params(jax.random.PRNGKey(0), cfg.model,
                                       cfg.conformer)
    opt_state = opt.init(params) if opt is not None else None

    def loss_fn(p, rng):
        feats, fmask, flens = extract_features(wave, ns, cfg.features)
        lp, mask, olens = conformer_ctc.apply(
            p, feats, fmask, flens, cfg.model, cfg.conformer,
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

        from pg_asr_tpu.utils.rand import training_rng
        key = training_rng(1)
        p, o, l = chain(params, opt_state, key)
        jax.block_until_ready(l)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
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
                params = jax.tree_util.tree_map(
                    lambda x: x + (1e-12 * loss).astype(x.dtype), params)
                return (params, rng), loss
            carry, losses = jax.lax.scan(body, (params, rng), None,
                                         length=steps)
            return losses[-1]

        from pg_asr_tpu.utils.rand import training_rng
        key = training_rng(1)
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
    rng = np.random.default_rng(0)
    data = workload(rng)
    adamw = optax.adamw(1e-4)
    sgd = optax.sgd(1e-4)
    print(f"backend={jax.devices()[0].device_kind} B={BATCH} "
          f"6L x d256 x h4 x ffn1024 conv15 subsample2")

    baseline_loss = [None]

    def row(name, result, knockout=False):
        ms, loss = result
        if knockout and baseline_loss[0] is not None:
            # a knockout changes semantics; identical loss means the
            # monkeypatch silently didn't take effect (advisor r4, high)
            assert loss != baseline_loss[0], (
                f"knockout '{name}' produced the baseline loss "
                f"{loss} — the patch did not take effect")
        print(f"{name:36s} {ms:8.2f} ms")
        return ms, loss

    row("full (adamw, dropout .1)", time_step(make_cfg(0.1), adamw, data))
    _, bl = row("no dropout", time_step(make_cfg(0.0), adamw, data))
    baseline_loss[0] = bl
    row("sgd, no dropout", time_step(make_cfg(0.0), sgd, data))
    row("forward+loss only",
        time_step(make_cfg(0.0), None, data, grad=False))

    # knockout: attention einsums+softmax+rotary -> pass-through of v
    orig_mhsa = conformer_ctc._mhsa_rotary

    def mhsa_noattn(p, x, key_bias, num_heads, flash_mask=None,
                    softmax_bf16=False):
        qkv = linear(p["qkv"], x)
        v = qkv[..., 2 * x.shape[-1]:]
        return linear(p["attn_out"], v)

    conformer_ctc._mhsa_rotary = mhsa_noattn
    try:
        row("no attention (qkv/out kept)",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        conformer_ctc._mhsa_rotary = orig_mhsa

    # knockout: rotary -> identity
    orig_rot = conformer_ctc._rotary
    conformer_ctc._rotary = lambda x: x
    try:
        row("no rotary (identity positions)",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        conformer_ctc._rotary = orig_rot

    # knockout: depthwise conv + mid-LN + swish dropped (pointwise kept)
    orig_conv = conformer_ctc._conv_module

    def conv_no_depthwise(p, x, mask, kernel):
        h = linear(p["conv_in"], x)
        a, b = jnp.split(h, 2, axis=-1)
        return linear(p["conv_out"], a * jax.nn.sigmoid(b))

    conformer_ctc._conv_module = conv_no_depthwise
    try:
        row("no depthwise conv (pointwise kept)",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        conformer_ctc._conv_module = orig_conv

    # knockout: CTC loss -> mean logit (isolates the T'-step sequential
    # forward-backward scan in ops/ctc.py)
    g = globals()
    orig_ctc = g["ctc_loss_mean"]
    g["ctc_loss_mean"] = lambda lp, olens, labels, llens: jnp.mean(lp)
    try:
        row("no CTC (mean-logit loss)",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        g["ctc_loss_mean"] = orig_ctc

    # knockout: feature frontend -> precomputed constants (isolates the
    # STFT-conv + log-mel + normalization)
    wave, ns, _, _ = data
    pre = extract_features(wave, ns, make_cfg(0.0).features)
    pre = jax.tree_util.tree_map(jax.block_until_ready, pre)
    orig_feats = g["extract_features"]
    g["extract_features"] = lambda w, n, fc: pre
    try:
        row("no frontend (precomputed feats)",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        g["extract_features"] = orig_feats

    # knockout: LayerNorm in bf16
    orig_ln = conformer_ctc._layer_norm

    def ln_bf16(p, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)

    conformer_ctc._layer_norm = ln_bf16
    try:
        row("bf16 LayerNorm",
            time_step(make_cfg(0.0), adamw, data), knockout=True)
    finally:
        conformer_ctc._layer_norm = orig_ln

    # A/B (same semantics): Pallas flash-attention MHSA
    if os.environ.get("ATTN_FLASH") and jax.default_backend() == "tpu":
        row("full + flash attention",
            time_step(make_cfg(0.1, flash=True), adamw, data))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
