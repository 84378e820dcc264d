"""Greedy CTC decode: batched device path vs straightforward host collapse."""

import numpy as np
import pytest

from pg_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings
from pg_asr_tpu.data.text import Alphabet


def host_greedy(log_probs, mask, blank=0):
    out = []
    for lp, m in zip(log_probs, mask):
        best = lp.argmax(-1)
        seq, prev = [], blank
        for t in range(len(best)):
            if not m[t]:
                break
            s = int(best[t])
            if s != blank and s != prev:
                seq.append(s)
            prev = s
        out.append(seq)
    return out


def test_greedy_matches_host_reference():
    rng = np.random.default_rng(0)
    B, T, A = 4, 17, 6
    logits = rng.standard_normal((B, T, A)).astype(np.float32)
    lengths = np.array([17, 5, 1, 12])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    labels, lens = greedy_decode(logits, mask)
    expected = host_greedy(logits, mask)
    for i in range(B):
        got = list(np.asarray(labels[i][: int(lens[i])]))
        assert got == expected[i], i


def test_greedy_collapse_semantics():
    # frames: a a _ a b b -> "aab"
    A = 3
    seq = [1, 1, 0, 1, 2, 2]
    lp = np.full((1, len(seq), A), -10.0, dtype=np.float32)
    for t, s in enumerate(seq):
        lp[0, t, s] = 0.0
    mask = np.ones((1, len(seq)), np.float32)
    labels, lens = greedy_decode(lp, mask)
    assert list(np.asarray(labels[0][: int(lens[0])])) == [1, 1, 2]


def test_ids_to_strings():
    alph = Alphabet.from_symbols(list("ab"))
    labels = np.array([[1, 2, 0, 0], [2, 0, 0, 0]])
    lens = np.array([2, 1])
    assert ids_to_strings(labels, lens, alph) == ["ab", "b"]
