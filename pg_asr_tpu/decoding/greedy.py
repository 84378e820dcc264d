"""Vectorized on-device greedy CTC decoding.

Replaces the reference's host loop (per-utterance numpy argmax + Python
collapse) with a fully batched jit path: argmax -> drop repeats -> drop
blanks -> left-compact, all as masked tensor ops. No host round-trips; the
only transfer is the final (B, L) int array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.text import BLANK_ID


def _compact_row(ids: jnp.ndarray, keep: jnp.ndarray, max_len: int):
    """Left-compact `ids[keep]` into a fixed-width row (scatter by cumsum)."""
    pos = jnp.cumsum(keep) - 1  # target slot for each kept id
    pos = jnp.where(keep, pos, max_len)  # dump non-kept into overflow slot
    out = jnp.zeros(max_len + 1, dtype=ids.dtype).at[pos].set(ids, mode="drop")
    return out[:max_len], jnp.minimum(jnp.sum(keep), max_len)


@jax.jit
def collapse_frame_ids(frame_ids: jnp.ndarray, frame_mask: jnp.ndarray):
    """CTC-collapse per-frame symbol ids: merge repeats, drop blanks, compact.

    frame_ids: (B, T) int32 raw per-frame symbols (argmax or sampled path).
    Returns (labels (B, T) 0-padded, lengths (B,)).
    """
    best = frame_ids.astype(jnp.int32)
    valid = frame_mask.astype(bool)
    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=BLANK_ID)
    # emit where symbol is non-blank and differs from the previous frame's
    # symbol (repeats merge); frames beyond length dropped
    keep = (best != BLANK_ID) & (best != prev) & valid
    T = best.shape[1]
    labels, lengths = jax.vmap(lambda i, k: _compact_row(i, k, T))(best, keep)
    return labels, lengths.astype(jnp.int32)


@jax.jit
def greedy_decode(log_probs: jnp.ndarray, frame_mask: jnp.ndarray):
    """Batched greedy CTC decode.

    Args:
      log_probs: (B, T, A) per-frame log-posteriors.
      frame_mask: (B, T) 1.0 for valid frames.
    Returns:
      labels: (B, T) int32, left-compacted label ids (0-padded).
      lengths: (B,) int32 decoded lengths.
    """
    best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # (B, T)
    return collapse_frame_ids(best, frame_mask)


def ids_to_strings(labels, lengths, alphabet) -> list[str]:
    """Host-side: map compacted id rows to strings (tokenizer-aware —
    alphabet.decode handles char joining or BPE marker→space)."""
    labels = jax.device_get(labels)
    lengths = jax.device_get(lengths)
    return [alphabet.decode(row[: int(n)])
            for row, n in zip(labels, lengths)]
