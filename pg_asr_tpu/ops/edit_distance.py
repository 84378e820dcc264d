"""On-device (jit/vmap) Levenshtein distance.

Powers the on-chip policy-gradient reward (BASELINE north star: "sampled CTC
paths scored by negative-WER rewards ... fully on-chip"). The reference
computes edit distance on the host in a Python double loop per reward call
(reference metrics.py:4-21, policy_grad.py:10-15).

Algorithm: row recurrence over the hypothesis with the within-row dependency
  d[j] = min(h[j], d[j-1] + 1)
closed into a prefix-min:  d[j] = j + min_{k<=j}(h[k] - k),
computed with an associative scan — so each DP row is fully vectorized on
the VPU and the only sequential loop is lax.scan over hypothesis positions.

Also exposes the per-prefix distance vector ED(ref, hyp[:i]) for i=0..Lh in
the same single pass — exactly what the reference's incremental per-step
reward needs (reference policy_grad.py:10-15), without recomputing the DP
per prefix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# plain Python int, NOT jnp.int32 — a module-level jax array binds a
# leaked tracer if this module's first import happens inside a traced
# function (see decoding/beam.py:_HASH_M); int32 math semantics unchanged
BIG = 1 << 20


def _row_scan(ref: jnp.ndarray, ref_len: jnp.ndarray,
              hyp: jnp.ndarray, hyp_len: jnp.ndarray):
    """Single-pair DP. ref: (Lr,), hyp: (Lh,). Returns (final_dist,
    prefix_dists (Lh+1,)) where prefix_dists[i] = ED(ref[:ref_len], hyp[:i])
    for i <= hyp_len (frozen at hyp_len beyond)."""
    Lr = ref.shape[0]
    ar = jnp.arange(Lr + 1, dtype=jnp.int32)
    d0 = ar  # row 0: distance to empty hypothesis prefix

    def step(dprev, inp):
        i, h_sym = inp  # i in 1..Lh
        cost = (ref != h_sym).astype(jnp.int32)  # (Lr,)
        h = jnp.concatenate([
            jnp.array([0], jnp.int32) + i,
            jnp.minimum(dprev[1:] + 1, dprev[:-1] + cost),
        ])
        d = ar + jax.lax.associative_scan(jnp.minimum, h - ar)
        d = jnp.where(i <= hyp_len, d, dprev)  # freeze past true length
        return d, d

    idx = jnp.arange(1, hyp.shape[0] + 1, dtype=jnp.int32)
    d_last, rows = jax.lax.scan(step, d0, (idx, hyp))
    all_rows = jnp.concatenate([d0[None], rows], axis=0)  # (Lh+1, Lr+1)
    prefix = all_rows[:, ref_len]  # ED(ref, hyp[:i]) for each i
    return d_last[ref_len], prefix


@jax.jit
def edit_distance(ref: jnp.ndarray, ref_lens: jnp.ndarray,
                  hyp: jnp.ndarray, hyp_lens: jnp.ndarray) -> jnp.ndarray:
    """Batched Levenshtein distance between padded id sequences.

    Args: ref (B, Lr) int, ref_lens (B,), hyp (B, Lh) int, hyp_lens (B,).
    Returns (B,) int32 distances.
    """
    dist, _ = jax.vmap(_row_scan)(ref.astype(jnp.int32), ref_lens.astype(jnp.int32),
                                  hyp.astype(jnp.int32), hyp_lens.astype(jnp.int32))
    return dist


@jax.jit
def edit_distance_prefixes(ref: jnp.ndarray, ref_lens: jnp.ndarray,
                           hyp: jnp.ndarray, hyp_lens: jnp.ndarray):
    """Batched (distance, per-prefix distances (B, Lh+1)) in one DP pass."""
    return jax.vmap(_row_scan)(ref.astype(jnp.int32), ref_lens.astype(jnp.int32),
                               hyp.astype(jnp.int32), hyp_lens.astype(jnp.int32))


def cer_from_ids(ref, ref_lens, hyp, hyp_lens) -> jnp.ndarray:
    """(B,) character error rate = ED / ref_len (reference-length norm,
    reference metrics.py:23-26)."""
    d = edit_distance(ref, ref_lens, hyp, hyp_lens)
    return d.astype(jnp.float32) / jnp.maximum(ref_lens.astype(jnp.float32), 1.0)
