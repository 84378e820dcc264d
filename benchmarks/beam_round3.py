"""Round-3 beam-throughput experiments on the real chip (VERDICT r2 #3:
close the 3.7x beam-vs-greedy eval gap; target beam16 >= ~8k utts/s).

Measures decode-only time of beam_decode (hash impl) over synthetic
posteriors at the bench shape (B=64, T=401, A=18, K=16) for:
  * scan unroll factors (per-iteration loop overhead),
  * per-frame top-M candidate pruning (prune < K+2: approximate),
and reports the top-1 agreement rate of each pruned variant vs the exact
decode on peaked, CTC-like posteriors.

Run: python benchmarks/beam_round3.py            (axon TPU)
     JAX_PLATFORMS=cpu python benchmarks/beam_round3.py   (CPU sanity)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pg_asr_tpu.decoding.beam import beam_decode

B, T, A, K = 64, 401, 18, 16
STEPS = 32


def make_posteriors(seed=0, peak=3.0):
    """CTC-like log-posteriors: blank-heavy with occasional peaked symbols
    (random logits alone make every frame a near-tie, which is neither
    realistic nor useful for measuring pruning deviation)."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, A)).astype(np.float32)
    logits[..., 0] += 1.5  # blank prior
    hot = rng.integers(1, A, (B, T))
    emit = rng.random((B, T)) < 0.25
    logits[np.arange(B)[:, None], np.arange(T)[None, :], hot] += peak * emit
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    flens = jnp.asarray(rng.integers(T - 40, T + 1, (B,)), jnp.int32)
    return lp, flens


def time_decode(lp, flens, steps=STEPS, **kw):
    @jax.jit
    def chain(lp):
        def body(lp, _):
            labels, lens, nll = beam_decode(lp, flens, beam_size=K,
                                            max_label_len=256, **kw)
            return lp + 1e-12 * jnp.sum(nll), jnp.sum(lens)
        lp, outs = jax.lax.scan(body, lp, None, length=steps)
        return outs[-1]

    _ = float(chain(lp))  # compile
    t0 = time.time()
    _ = float(chain(lp))
    dt = time.time() - t0
    return dt / steps * 1000.0  # ms per batch


def agreement(lp, flens, **kw):
    ref_labels, ref_lens, _ = beam_decode(lp, flens, beam_size=K,
                                          max_label_len=256)
    labels, lens, _ = beam_decode(lp, flens, beam_size=K,
                                  max_label_len=256, **kw)
    same = np.array([
        int(ref_lens[i]) == int(lens[i])
        and bool(jnp.all(ref_labels[i, :ref_lens[i]]
                         == labels[i, :lens[i]]))
        for i in range(B)])
    return float(same.mean())


def main():
    print(f"backend={jax.devices()[0].device_kind} B={B} T={T} A={A} K={K}")
    lp, flens = make_posteriors()

    base = time_decode(lp, flens)
    print(f"base (exact, unroll=1):       {base:7.2f} ms/batch "
          f"({B / base * 1000:8.0f} utts/s)")

    for u in (2, 4, 8):
        ms = time_decode(lp, flens, unroll=u)
        print(f"exact, unroll={u}:             {ms:7.2f} ms/batch "
              f"({B / ms * 1000:8.0f} utts/s)")

    for m in (12, 8, 6, 4):
        ms = time_decode(lp, flens, prune=m)
        agree = agreement(lp, flens, prune=m)
        print(f"prune M={m:2d}, unroll=1:        {ms:7.2f} ms/batch "
              f"({B / ms * 1000:8.0f} utts/s)  top1-agree={agree:.4f}")

    for m in (8, 4):
        for u in (4, 8):
            ms = time_decode(lp, flens, prune=m, unroll=u)
            print(f"prune M={m}, unroll={u}:         {ms:7.2f} ms/batch "
                  f"({B / ms * 1000:8.0f} utts/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
