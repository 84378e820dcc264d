"""RNN-T beam decode-only timing (decoding/transducer.transducer_beam_decode)
on synthetic encoder states, LICM-safe chained protocol (docs/PERF.md).

Decode-only isolates the beam-search machinery from the encoder (whose
cost is family-dependent and measured elsewhere). Workload mirrors the
bench shape: B=64, T'=126 encoder frames (5 s @ conformer subsample 4),
joint/pred dims from TransducerConfig defaults, A=32.

Usage: python benchmarks/rnnt_beam_bench.py [--k 4] [--b 64] [--t 126]
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
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=126)
    ap.add_argument("--a", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--max_label_len", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pg_asr_tpu.config import Config, ModelConfig
    from pg_asr_tpu.models import transducer as tr_model
    from pg_asr_tpu.decoding.transducer import transducer_beam_decode

    cfg = Config(model=ModelConfig(family="transducer", vocab_size=args.a))
    params = tr_model.init_params(jax.random.PRNGKey(0), cfg)
    De = params["joint_enc"]["w"].shape[0]
    npr = np.random.default_rng(0)
    enc = jnp.asarray(npr.standard_normal((args.b, args.t, De)),
                      jnp.float32)
    out_lens = jnp.full((args.b,), args.t, jnp.int32)

    @jax.jit
    def chain(enc):
        def body(enc, _):
            labels, lens, nll = transducer_beam_decode(
                params, enc, out_lens, cfg, beam_size=args.k,
                max_label_len=args.max_label_len)
            return enc + 1e-12 * jnp.sum(nll), None
        enc, _ = jax.lax.scan(body, enc, None, length=args.steps)
        return enc

    out = chain(enc)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain(enc)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / args.steps * 1000.0
    res = {"B": args.b, "Tprime": args.t, "A": args.a, "K": args.k,
           "device": str(jax.devices()[0]), "decode_ms": round(ms, 3)}
    print(f"[rnnt_beam] K={args.k} {ms:8.2f} ms/batch", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
