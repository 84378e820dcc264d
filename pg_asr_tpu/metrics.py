"""Host-side CER/WER metrics and prediction dumps.

Semantics-compatible with the reference (reference metrics.py:4-37):
  * edit_dist(ref, hyp) -> (levenshtein distance, len(ref))
  * evaluate(ref, hyp)  -> (CER, WER)  with CER = ED(chars)/len(ref chars),
    WER = ED(words)/len(ref words), words split on single spaces
  * save_predictions writes "<target>|<predicted>" lines to
    <model_path>/predicted.txt

Implementation is a fresh two-row vectorized DP (O(min memory), numpy inner
row update) rather than the reference's full-matrix Python double loop.
The on-device (jit/vmap) edit distance lives in ops/edit_distance.py.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def edit_dist(ref: Sequence, hyp: Sequence) -> tuple[int, int]:
    """Levenshtein distance between two sequences.

    Returns (distance, len(ref)) — the same contract as the reference
    (reference metrics.py:4-21): callers divide by the reference length.
    Accepts str (CER) or list[str] (WER).
    """
    n, m = len(ref), len(hyp)
    if n == 0:
        return m, 0
    if m == 0:
        return n, n

    # Vectorized over the row: handle the within-row dependency
    #   d[j] = min(h[j], d[j-1] + 1)
    # via the prefix-min identity d[j] = j + min_{k<=j}(h[k] - k).
    ref_arr = np.asarray(list(ref), dtype=object)
    prev = np.arange(n + 1, dtype=np.int64)
    ar = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        sub = prev[:-1] + (ref_arr != hyp[i - 1]).astype(np.int64)
        h = np.empty(n + 1, dtype=np.int64)
        h[0] = i
        h[1:] = np.minimum(prev[1:] + 1, sub)
        prev = ar + np.minimum.accumulate(h - ar)
    return int(prev[-1]), n


def evaluate(ref: str, hyp: str) -> tuple[float, float]:
    """(CER, WER) for one utterance, reference-length normalized."""
    d, n = edit_dist(ref, hyp)
    cer = d / n if n else float(d > 0)
    dw, nw = edit_dist(ref.split(" "), hyp.split(" "))
    wer = dw / nw if nw else float(dw > 0)
    return cer, wer


def evaluate_corpus(refs: Sequence[str], hyps: Sequence[str]) -> dict:
    """Corpus-level metrics: both the reference's mean-of-utterance-rates and
    the standard total-errors/total-length CER/WER."""
    assert len(refs) == len(hyps)
    cers, wers = [], []
    ed_c = len_c = ed_w = len_w = 0
    for r, h in zip(refs, hyps):
        c, w = evaluate(r, h)
        cers.append(c)
        wers.append(w)
        d, n = edit_dist(r, h)
        ed_c += d
        len_c += n
        dw, nw = edit_dist(r.split(" "), h.split(" "))
        ed_w += dw
        len_w += nw
    return {
        "cer_mean": float(np.mean(cers)) if cers else 0.0,
        "wer_mean": float(np.mean(wers)) if wers else 0.0,
        "cer": ed_c / max(len_c, 1),
        "wer": ed_w / max(len_w, 1),
        "num_utts": len(refs),
    }


def save_predictions(target: Sequence[str], predicted: Sequence[str], model_path: str) -> str:
    """Write "<target>|<predicted>" lines to <model_path>/predicted.txt
    (format parity with reference metrics.py:33-37)."""
    os.makedirs(model_path, exist_ok=True)
    path = os.path.join(model_path, "predicted.txt")
    with open(path, "w") as fo:
        for t, p in zip(target, predicted):
            fo.write(t + "|" + p + "\n")
    return path
