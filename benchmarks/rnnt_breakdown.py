"""Per-component breakdown of the RNN-T (transducer) train step (VERDICT
r3 #2: the slowest family — 16.2 ms, 0.256 MFU, unchanged across rounds —
has had zero perf attribution).

Same methodology as attn_breakdown.py: run the bench-row workload (B=64,
5 s audio -> T'~201 conformer frames, U=64 labels, A=32, J=256, bf16) on
the real chip under component knockouts. Knockouts change semantics — they
are for ATTRIBUTION only.

  full            the bench row: apply_lattice + transducer_loss + adamw
  fwd+loss        value only, no backward
  no-lattice      loss scan knocked out: loss = mean(lp_blank)+mean(lp_label)
                  (keeps the joint + log-prob tables, drops the D=T+U
                  wavefront scan)
  no-normalize    joint_log_probs knocked out: loss = mean(logits)
                  (keeps the (B,T,U+1,A) logits, drops lse + picks +
                  diagonal re-layout + scan)
  no-4d           joint h/logits knocked out: loss = mean(e)+mean(g) on the
                  (B,T,J)/(B,U+1,J) projections (drops ALL 4-D tensors)
  enc+pred        loss = mean(enc)+mean(pred) (backbone + prediction net
                  only — the floor the joint/loss sit on)
  encoder-only    loss = mean(enc)
  lattice-alone   transducer_loss fwd+bwd on random tables (the scan's
                  standalone cost, incl. its backward)

Run: python benchmarks/rnnt_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pg_asr_tpu.config import (Config, ConformerConfig, FeatureConfig,
                               ModelConfig, TrainConfig, TransducerConfig)
from pg_asr_tpu.models import transducer
from pg_asr_tpu.ops.features import extract_features
from pg_asr_tpu.ops.transducer import (joint_log_probs, transducer_loss,
                                       transducer_loss_mean)

BATCH = int(os.environ.get("RNNT_BATCH", "64"))
SECONDS = float(os.environ.get("RNNT_SECONDS", "5.0"))
VOCAB = 32
LABEL_LEN = 64
STEPS = int(os.environ.get("RNNT_STEPS", "16"))


def make_cfg() -> Config:
    # == bench.py _family_cfg("transducer"): conformer backbone, J=256
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=80),
        model=ModelConfig(family="transducer", vocab_size=VOCAB,
                          input_dim=80, input_proj_dim=512, hidden_size=256,
                          num_layers=3, dropout=0.1, dtype="bfloat16"),
        conformer=ConformerConfig(),
        transducer=TransducerConfig(),
        train=TrainConfig(batch_size=BATCH, warmup_steps=0),
    )


def workload(rng):
    n = int(SECONDS * 16000)
    wave = jnp.asarray(rng.standard_normal((BATCH, n)) * 0.1, jnp.float32)
    ns = jnp.full((BATCH,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, VOCAB, (BATCH, LABEL_LEN)),
                         jnp.int32)
    llens = jnp.full((BATCH,), LABEL_LEN, jnp.int32)
    return wave, ns, labels, llens


def _stages(params, data, cfg, rng):
    """Shared forward stages up to (enc, pred): featurize + backbone +
    prediction net."""
    wave, ns, labels, llens = data
    rngs = jax.random.split(rng, 2)
    feats, fmask, flens = extract_features(wave, ns, cfg.features)
    enc, out_mask, out_lens = transducer.encode(
        params, feats, fmask, flens, cfg, train=True, dropout_rng=rngs[0])
    pred = transducer.predict_states(params, labels, llens, cfg, train=True,
                                     dropout_rng=rngs[1])
    return enc, pred, out_lens


def make_loss(variant: str, data, cfg):
    from pg_asr_tpu.models.bilstm_ctc import linear

    wave, ns, labels, llens = data

    def loss_fn(params, rng):
        if variant == "encoder-only":
            rngs = jax.random.split(rng, 2)
            feats, fmask, flens = extract_features(wave, ns, cfg.features)
            enc, _, _ = transducer.encode(params, feats, fmask, flens, cfg,
                                          train=True, dropout_rng=rngs[0])
            return jnp.mean(enc.astype(jnp.float32))
        enc, pred, out_lens = _stages(params, data, cfg, rng)
        if variant == "enc+pred":
            return (jnp.mean(enc.astype(jnp.float32))
                    + jnp.mean(pred.astype(jnp.float32)))
        e = linear(params["joint_enc"], enc)
        g = linear(params["joint_pred"], pred)
        if variant == "no-4d":
            return (jnp.mean(e.astype(jnp.float32))
                    + jnp.mean(g.astype(jnp.float32)))
        h = jnp.tanh(e[:, :, None, :] + g[:, None, :, :])
        logits = linear(params["joint_out"], h)
        if variant == "no-normalize":
            return jnp.mean(logits.astype(jnp.float32))
        lp_blank, lp_label = joint_log_probs(logits, labels)
        if variant == "no-lattice":
            return jnp.mean(lp_blank) + jnp.mean(lp_label)
        return transducer_loss_mean(lp_blank, lp_label, out_lens, llens)

    return loss_fn


def time_variant(variant: str, data, cfg, grad=True) -> float:
    params = transducer.init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    loss_fn = make_loss("full" if variant == "fwd+loss" else variant,
                        data, cfg)
    from pg_asr_tpu.utils.rand import training_rng

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
                                         None, length=STEPS)
            return carry[0], losses[-1]

        key = training_rng(1)
        p, l = chain(params, opt_state, key)
        jax.block_until_ready(l)
        t0 = time.time()
        p, l = chain(params, opt_state, key)
        jax.block_until_ready(l)
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
                                         length=STEPS)
            return losses[-1]

        key = training_rng(1)
        l = chain(params, key)
        jax.block_until_ready(l)
        t0 = time.time()
        l = chain(params, key)
        jax.block_until_ready(l)
    return (time.time() - t0) / STEPS * 1000.0


def time_lattice_alone(cfg) -> float:
    """transducer_loss fwd+bwd on random pre-made tables — the wavefront
    scan's standalone cost at bench shapes (T'~201, U=64)."""
    T = int(SECONDS * 16000) // cfg.features.hop_length // \
        cfg.conformer.subsample + 1
    rng = np.random.default_rng(0)
    lp_b = jnp.asarray(rng.standard_normal((BATCH, T, LABEL_LEN + 1)),
                       jnp.float32)
    lp_y = jnp.asarray(rng.standard_normal((BATCH, T, LABEL_LEN)),
                       jnp.float32)
    flens = jnp.full((BATCH,), T, jnp.int32)
    llens = jnp.full((BATCH,), LABEL_LEN, jnp.int32)

    @jax.jit
    def chain(lp_b, lp_y):
        def body(carry, _):
            b, y = carry
            val, (gb, gy) = jax.value_and_grad(
                lambda bb, yy: jnp.mean(
                    transducer_loss(bb, yy, flens, llens)),
                argnums=(0, 1))(b, y)
            return (b + 1e-9 * gb, y + 1e-9 * gy), val
        carry, vals = jax.lax.scan(body, (lp_b, lp_y), None, length=STEPS)
        return vals[-1]

    l = chain(lp_b, lp_y)
    jax.block_until_ready(l)
    t0 = time.time()
    l = chain(lp_b, lp_y)
    jax.block_until_ready(l)
    return (time.time() - t0) / STEPS * 1000.0


def main():
    from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    cfg = make_cfg()
    rng = np.random.default_rng(0)
    data = workload(rng)
    print(f"backend={jax.devices()[0].device_kind} B={BATCH} "
          f"T~{int(SECONDS * 16000) // 200 // 2} U={LABEL_LEN} "
          f"A={VOCAB} J={cfg.transducer.joint_dim}")

    for variant in ("full", "fwd+loss", "no-lattice", "no-normalize",
                    "no-4d", "enc+pred", "encoder-only"):
        ms = time_variant(variant, data, cfg, grad=(variant != "fwd+loss"))
        print(f"{variant:16s} {ms:8.2f} ms")
    ms = time_lattice_alone(cfg)
    print(f"{'lattice-alone':16s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
