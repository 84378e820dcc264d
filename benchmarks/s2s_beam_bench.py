"""Seq2seq attention-decoder beam timing (models/seq2seq.beam_generate),
LICM-safe chained protocol (docs/PERF.md). Times the full generate
(encode + max_steps decoder beam) at the bench workload.

Usage: python benchmarks/s2s_beam_bench.py [--k 8] [--b 64] [--t 401]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=401)
    ap.add_argument("--max_steps", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pg_asr_tpu.config import ModelConfig, Seq2SeqConfig
    from pg_asr_tpu.models import seq2seq as s2s

    enc_cfg = ModelConfig(family="seq2seq")
    dec_cfg = Seq2SeqConfig()
    params = s2s.init_params(jax.random.PRNGKey(0), enc_cfg, dec_cfg)
    npr = np.random.default_rng(0)
    feats = jnp.asarray(
        npr.standard_normal((args.b, args.t, enc_cfg.input_dim)), jnp.float32)
    mask = jnp.ones((args.b, args.t), jnp.float32)

    @jax.jit
    def chain(feats):
        def body(f, _):
            toks, lens, scores = s2s.beam_generate(
                params, f, mask, enc_cfg, dec_cfg, beam_size=args.k,
                max_steps=args.max_steps)
            return f + 1e-12 * jnp.sum(scores), None
        f, _ = jax.lax.scan(body, feats, None, length=args.steps)
        return f

    out = chain(feats)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain(feats)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / args.steps * 1000.0
    res = {"B": args.b, "T": args.t, "K": args.k,
           "max_steps": args.max_steps,
           "device": str(jax.devices()[0]), "generate_ms": round(ms, 3)}
    print(f"[s2s_beam] K={args.k} {ms:8.2f} ms/batch", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
