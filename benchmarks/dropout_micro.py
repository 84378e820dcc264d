"""Microbench: where does the transformer's ~1.5 ms of dropout go?

The d=256 knockout (attn_breakdown.py, subsample 2) shows dropout 0.1
costs ~1.6 ms/step over ~13 sites x (64, 250, 256) activations in the
FULL train step (fwd+bwd+adamw). Candidate costs: (a) rbg bit generation
(~53 MB of uint8/step), (b) the where(bits>=t, x/keep, 0) elementwise
pass (~300 MB of HBM traffic if unfused), (c) the autodiff residuals —
default AD saves every site's uint8 bits tensor in the forward and
re-reads it in the backward (2 x 53 MB of extra HBM traffic), (d)
per-call key split/fold-in overhead.

Rows, per step of a 16-step scan chain:
  bits-only        13 rbg draws, summed (isolates generation)
  bits-bulk        ONE rbg draw of 13x the elements (isolates call overhead)
  fwd dropout      13 x (draw + where) over a live activation chain
  fwd+bwd stored   value_and_grad through the chain, default AD
                   (bits tensors saved as residuals)
  fwd+bwd recomp   same, custom_vjp that saves ONLY the key and redraws
                   the bits in the backward (ops-level remat)

Timing protocol per docs/PERF.md: `block_until_ready` returns early over
the axon tunnel — every timed call ends in a SCALAR D2H readback.

Run: python benchmarks/dropout_micro.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from pg_asr_tpu.utils.rand import training_rng

B, T, D, SITES = 64, 250, 256, 13
STEPS, REPEATS = 16, 5
SHAPE = (B, T, D)
THRESH = 26  # rate 0.1
KEEP = 1.0 - THRESH / 256.0


def timeit(chain, *args):
    out = chain(*args)
    float(jnp.asarray(out, jnp.float32))  # sync: scalar D2H readback
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        out = chain(*args)
        float(jnp.asarray(out, jnp.float32))
        best = min(best, time.time() - t0)
    return best / STEPS * 1000.0


def scan_chain(body):
    @jax.jit
    def chain(x, key):
        def step(carry, _):
            x, key = carry
            key, k = jax.random.split(key)
            x = body(x, k)
            return (x, key), None
        (x, _), _ = jax.lax.scan(step, (x, key), None, length=STEPS)
        return x[0, 0, 0]  # scalar output -> readback really syncs
    return chain


def grad_chain(body):
    @jax.jit
    def chain(x, key):
        def step(carry, _):
            x, key = carry
            key, k = jax.random.split(key)

            def loss(x):
                return jnp.sum(body(x, k).astype(jnp.float32))

            g = jax.grad(loss)(x)
            return (g.astype(x.dtype), key), None
        (x, _), _ = jax.lax.scan(step, (x, key), None, length=STEPS)
        return x[0, 0, 0]
    return chain


def dropout_stored(x, k):
    for i in range(SITES):
        b = jax.random.bits(jax.random.fold_in(k, i), SHAPE, dtype=jnp.uint8)
        x = jnp.where(b >= THRESH, x / KEEP, 0.0)
    return x


@jax.custom_vjp
def _site_recomp(x, key):
    b = jax.random.bits(key, x.shape, dtype=jnp.uint8)
    return jnp.where(b >= THRESH, x / KEEP, 0.0)


def _site_fwd(x, key):
    return _site_recomp(x, key), key


def _site_bwd(key, g):
    b = jax.random.bits(key, g.shape, dtype=jnp.uint8)
    return (jnp.where(b >= THRESH, g / KEEP, 0.0).astype(g.dtype), None)


_site_recomp.defvjp(_site_fwd, _site_bwd)


def dropout_recomp(x, k):
    for i in range(SITES):
        x = _site_recomp(x, jax.random.fold_in(k, i))
    return x


def main():
    x0 = jnp.ones(SHAPE, jnp.bfloat16)
    key = training_rng(0)
    print(f"backend={jax.devices()[0].device_kind} "
          f"sites={SITES} x {SHAPE} bf16, {STEPS}-step chain")

    def bits_only(x, k):
        acc = x
        for i in range(SITES):
            b = jax.random.bits(jax.random.fold_in(k, i), SHAPE,
                                dtype=jnp.uint8)
            acc = acc + b[0, 0, 0].astype(jnp.bfloat16)  # keep alive
        return acc

    def bits_bulk(x, k):
        b = jax.random.bits(k, (SITES,) + SHAPE, dtype=jnp.uint8)
        return x + b[0, 0, 0, 0].astype(jnp.bfloat16)

    rows = [("bits-only (13 draws)", scan_chain(bits_only)),
            ("bits-bulk (1 draw)", scan_chain(bits_bulk)),
            ("fwd dropout (draw+where)", scan_chain(dropout_stored)),
            ("fwd+bwd, stored bits", grad_chain(dropout_stored)),
            ("fwd+bwd, recomputed bits", grad_chain(dropout_recomp))]
    for name, chain in rows:
        ms = timeit(chain, x0, key)
        print(f"{name:28s} {ms:7.3f} ms/step")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
