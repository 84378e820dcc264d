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


# ---------------------------------------------------------------------------
# Word-level (WER) edit distance — the north-star reward granularity
# ---------------------------------------------------------------------------
#
# The reference computes WER on the host by splitting the decoded string on
# " " and running the same DP over word lists (reference metrics.py:27-30).
# Python's split(" ") KEEPS empty segments ("a  b" -> ["a", "", "b"], "" ->
# [""]), so word count == (#spaces) + 1 and empty words are real tokens —
# the on-chip version reproduces exactly that contract (parity-tested
# against metrics.evaluate in tests/test_wer_onchip.py).
#
# Design: each word is reduced to ONE int32 rolling polynomial hash
# (h = h * P + id + 1 per char, int32 wraparound — deterministic on every
# XLA backend), collected into a dense (B, L+1) word-hash sequence with a
# one-hot positional add inside a single lax.scan over char positions (no
# scatters). Word-level Levenshtein is then the existing prefix-min
# edit_distance over the hash sequences. Hash collisions would need two
# words with equal 32-bit polynomial hashes inside one ref/hyp pair
# (~2^-32 per word pair) — negligible for a training reward.


def word_hash_sequences(ids: jnp.ndarray, lens: jnp.ndarray, space_id: int):
    """Segment padded char-id rows into words at `space_id`.

    Args:
      ids: (B, L) int ids, 0-padded.
      lens: (B,) true lengths.
      space_id: the alphabet id of " " (the word delimiter).
    Returns:
      hashes: (B, L+1) int32 — one rolling hash per word, 0-padded
        (empty words hash to 0; they are still counted, as split(" ") does).
      counts: (B,) int32 word counts (always >= 1, like "".split(" ")).
    """
    ids = ids.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    B, L = ids.shape
    Lw = L + 1  # all-space rows produce L+1 (empty) words
    P = jnp.int32(1_000_003)

    def step(carry, inp):
        h, count, out = carry
        i, sym = inp  # scalar position, (B,) symbols
        valid = i < lens
        is_space = valid & (sym == space_id)
        # a space ends the current word: write its hash at slot `count`
        out = out + (jax.nn.one_hot(count, Lw, dtype=jnp.int32)
                     * jnp.where(is_space, h, 0)[:, None])
        count = count + is_space.astype(jnp.int32)
        h = jnp.where(is_space, 0,
                      jnp.where(valid, h * P + sym + 1, h))
        return (h, count, out), None

    h0 = jnp.zeros((B,), jnp.int32)
    c0 = jnp.zeros((B,), jnp.int32)
    out0 = jnp.zeros((B, Lw), jnp.int32)
    (h, count, out), _ = jax.lax.scan(
        step, (h0, c0, out0),
        (jnp.arange(L, dtype=jnp.int32), jnp.swapaxes(ids, 0, 1)))
    # the trailing segment is always a word (even when empty / len == 0)
    out = out + jax.nn.one_hot(count, Lw, dtype=jnp.int32) * h[:, None]
    return out, count + 1


@partial(jax.jit, static_argnames=("space_id",))
def word_edit_distance(ref, ref_lens, hyp, hyp_lens, space_id: int):
    """Batched word-level Levenshtein distance between padded char-id rows.

    Returns (dist (B,) int32, ref_words (B,) int32)."""
    rh, rw = word_hash_sequences(ref, ref_lens, space_id)
    hh, hw = word_hash_sequences(hyp, hyp_lens, space_id)
    return edit_distance(rh, rw, hh, hw), rw


def wer_from_ids(ref, ref_lens, hyp, hyp_lens, space_id: int) -> jnp.ndarray:
    """(B,) word error rate = word-ED / ref word count (reference
    metrics.py:27-30 normalization; counts are always >= 1)."""
    d, rw = word_edit_distance(ref, ref_lens, hyp, hyp_lens, space_id)
    return d.astype(jnp.float32) / rw.astype(jnp.float32)
