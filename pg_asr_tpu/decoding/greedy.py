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


@jax.jit
def greedy_decode_with_timing(log_probs: jnp.ndarray, frame_mask: jnp.ndarray):
    """Greedy CTC decode that also returns WHERE and HOW CONFIDENTLY each
    token was emitted (the production serving surface the reference's
    host decode loop could never offer: reference model.py:321-334 only
    returned strings).

    CTC emissions are peaky: each collapsed token is anchored at its
    onset frame (the first frame of its repeat-run), the standard CTC
    timestamp convention. Confidence is the token's log-posterior at
    that frame; exp(mean) over tokens is a geometric-mean utterance
    confidence.

    Returns:
      labels: (B, T) int32 left-compacted label ids (0-padded).
      lengths: (B,) int32 decoded lengths.
      onsets: (B, T) int32 emitting frame index per token (0-padded),
        in the MODEL's output time base (subsampled frames).
      token_logp: (B, T) f32 log-posterior of each token at its onset.
    """
    best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # (B, T)
    logp_best = jnp.max(log_probs, axis=-1).astype(jnp.float32)  # (B, T)
    valid = frame_mask.astype(bool)
    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=BLANK_ID)
    keep = (best != BLANK_ID) & (best != prev) & valid
    B, T = best.shape
    frames = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    def row(ids, frm, lp, k):
        pos = jnp.cumsum(k) - 1
        pos = jnp.where(k, pos, T)  # overflow slot for non-kept frames
        out_ids = jnp.zeros(T + 1, ids.dtype).at[pos].set(ids, mode="drop")
        out_frm = jnp.zeros(T + 1, frm.dtype).at[pos].set(frm, mode="drop")
        out_lp = jnp.zeros(T + 1, lp.dtype).at[pos].set(lp, mode="drop")
        return (out_ids[:T], out_frm[:T], out_lp[:T],
                jnp.minimum(jnp.sum(k), T))

    labels, onsets, token_logp, lengths = jax.vmap(row)(best, frames,
                                                        logp_best, keep)
    return labels, lengths.astype(jnp.int32), onsets, token_logp


def assemble_word_timings(ids, length, onsets, token_logp, alphabet,
                          sec_per_frame: float):
    """Host-side: group one utterance's per-token onsets into per-WORD
    [start, end] times + confidences.

    Word boundaries follow the tokenizer: a literal " " symbol (character
    alphabets) or a word-start-marker token (BPE, SentencePiece '▁'
    convention). A word's end is its last token's onset plus one frame —
    the CTC-peak convention (tokens anchor at emission peaks, not spans).
    Confidence is the geometric mean of the word's token posteriors.
    """
    import math

    from ..data.bpe import MARKER

    words = []
    cur: list[tuple[str, int, float]] = []  # (text, frame, logp)

    def flush():
        if not cur:
            return
        text = "".join(t for t, _, _ in cur).strip()
        if text:
            words.append({
                "word": text,
                "start": round(cur[0][1] * sec_per_frame, 3),
                "end": round((cur[-1][1] + 1) * sec_per_frame, 3),
                "conf": round(math.exp(sum(l for _, _, l in cur)
                                       / len(cur)), 4),
            })
        cur.clear()

    for j in range(int(length)):
        sym = alphabet.symbols[int(ids[j])]
        boundary = sym == " " or sym.startswith(MARKER)
        if boundary:
            flush()
        piece = alphabet.piece(int(ids[j]))
        text = piece if not boundary else piece.lstrip(" ")
        if text:
            cur.append((text, int(onsets[j]), float(token_logp[j])))
    flush()
    return words


def ids_to_strings(labels, lengths, alphabet) -> list[str]:
    """Host-side: map compacted id rows to strings (tokenizer-aware —
    alphabet.decode handles char joining or BPE marker→space)."""
    labels = jax.device_get(labels)
    lengths = jax.device_get(lengths)
    return [alphabet.decode(row[: int(n)])
            for row, n in zip(labels, lengths)]
