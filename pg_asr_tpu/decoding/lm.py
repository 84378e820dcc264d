"""Character n-gram language models for shallow fusion in beam search.

The reference decoder is purely acoustic (reference CTCdecoder.py:41-116);
standard ASR systems rescore beam extensions with an external LM:

    score(prefix) = log P_ctc(prefix) + lm_weight * log P_lm(prefix)
                    + length_bonus * |prefix|

This module trains the LM (add-k smoothed character bigram/trigram counts
from the training transcripts — no external data, no extra dependency) and
represents it as a dense table the on-device beam search consumes with ONE
one-hot matmul per frame (decoding/beam.py): contexts are encoded as rows,
so scoring every (beam, symbol) extension is an MXU contraction instead of
per-candidate gathers.

Table layout: index 0 is BOS (the blank/pad id never occurs inside a label
prefix, so slot 0 is free to mean "no character yet").
  order 2 -> (A, A):     table[prev,              next]
  order 3 -> (A, A, A):  table[prev2, prev1,      next]  (prev2=0 until
                                                          len >= 2)
Column 0 (next = blank) is NEG_LM: extensions are never blank.
"""

from __future__ import annotations

import numpy as np

NEG_LM = -1.0e30


def train_char_ngram(texts, alphabet, order: int = 2,
                     add_k: float = 1.0) -> np.ndarray:
    """Add-k smoothed character n-gram from transcripts.

    Args:
      texts: iterable of training transcripts (strings).
      alphabet: data.text.Alphabet (index 0 = pad/blank = BOS slot here).
      order: 2 (bigram) or 3 (trigram).
      add_k: additive smoothing mass per (context, symbol) cell.
    Returns:
      float32 log-prob table, (A, A) for order 2 or (A, A, A) for order 3.
    """
    if order not in (2, 3):
        raise ValueError(f"order must be 2 or 3, got {order}")
    A = alphabet.size
    counts = np.zeros((A,) * order, np.float64)
    for text in texts:
        ctx = [0] * (order - 1)
        for s in alphabet.encode(text):
            counts[tuple(ctx) + (int(s),)] += 1.0
            ctx = ctx[1:] + [int(s)]
    smoothed = counts[..., 1:] + add_k  # never predict blank
    logp = np.log(smoothed / smoothed.sum(axis=-1, keepdims=True))
    table = np.full(counts.shape, NEG_LM, np.float64)
    table[..., 1:] = logp
    return table.astype(np.float32)


def lm_from_manifest(manifest, alphabet, order: int = 2,
                     add_k: float = 1.0) -> np.ndarray:
    """Convenience: train from a loaded manifest (list of Utterance-like
    objects with .text)."""
    return train_char_ngram((u.text for u in manifest), alphabet,
                            order=order, add_k=add_k)


def score_prefix(table: np.ndarray, ids) -> float:
    """Host-side log P_lm of a full prefix (oracle / tests)."""
    order = table.ndim
    ctx = [0] * (order - 1)
    total = 0.0
    for s in ids:
        total += float(table[tuple(ctx) + (int(s),)])
        ctx = ctx[1:] + [int(s)]
    return total
