"""On-chip word-level edit distance / WER parity vs the host contract.

The host oracle is metrics.evaluate, which matches the reference's WER
(reference metrics.py:27-30): split(" ") — keeping empty segments — then
Levenshtein over word lists, normalized by the ref word count.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pg_asr_tpu.metrics import edit_dist, evaluate
from pg_asr_tpu.ops.edit_distance import (wer_from_ids, word_edit_distance,
                                          word_hash_sequences)
from pg_asr_tpu.rl.reward import sequence_reward

SYMS = ["<pad>", " ", "a", "b", "c", "d"]
C2I = {c: i for i, c in enumerate(SYMS)}
SPACE = C2I[" "]


def _encode(texts, L):
    ids = np.zeros((len(texts), L), np.int32)
    lens = np.zeros((len(texts),), np.int32)
    for i, t in enumerate(texts):
        enc = [C2I[c] for c in t]
        ids[i, : len(enc)] = enc
        lens[i] = len(enc)
    return jnp.asarray(ids), jnp.asarray(lens)


CASES = [
    ("abc ab", "abc ab"),
    ("abc ab", "abd ab"),
    ("a b c", "a c"),
    ("a  b", "a b"),       # double space: empty word is a real token
    (" a", "a"),           # leading space
    ("a ", "a"),           # trailing space
    ("", "a b"),           # empty ref
    ("a b", ""),           # empty hyp
    ("", ""),
    ("  ", " "),           # all spaces
    ("abc", "cba"),
    ("aa bb cc dd", "aa cc dd"),
]


def test_word_counts_match_split():
    texts = [r for r, _ in CASES]
    ids, lens = _encode(texts, 16)
    _, counts = word_hash_sequences(ids, lens, SPACE)
    for t, c in zip(texts, np.asarray(counts)):
        assert c == len(t.split(" ")), (t, c)


def test_word_edit_distance_matches_host():
    refs = [r for r, _ in CASES]
    hyps = [h for _, h in CASES]
    rids, rlens = _encode(refs, 16)
    hids, hlens = _encode(hyps, 16)
    d, rw = word_edit_distance(rids, rlens, hids, hlens, SPACE)
    d, rw = np.asarray(d), np.asarray(rw)
    for i, (r, h) in enumerate(CASES):
        dw, nw = edit_dist(r.split(" "), h.split(" "))
        assert d[i] == dw, (r, h, d[i], dw)
        assert rw[i] == nw, (r, h, rw[i], nw)


def test_wer_matches_host_evaluate():
    refs = [r for r, _ in CASES]
    hyps = [h for _, h in CASES]
    rids, rlens = _encode(refs, 16)
    hids, hlens = _encode(hyps, 16)
    wer = np.asarray(wer_from_ids(rids, rlens, hids, hlens, SPACE))
    for i, (r, h) in enumerate(CASES):
        _, w_host = evaluate(r, h)
        assert wer[i] == pytest.approx(w_host), (r, h)


def test_wer_random_strings_match_host():
    rng = np.random.default_rng(0)
    alphabet = " abcd"
    refs, hyps = [], []
    for _ in range(64):
        n = int(rng.integers(0, 24))
        m = int(rng.integers(0, 24))
        refs.append("".join(rng.choice(list(alphabet), n)))
        hyps.append("".join(rng.choice(list(alphabet), m)))
    rids, rlens = _encode(refs, 24)
    hids, hlens = _encode(hyps, 24)
    wer = np.asarray(wer_from_ids(rids, rlens, hids, hlens, SPACE))
    for i, (r, h) in enumerate(zip(refs, hyps)):
        _, w_host = evaluate(r, h)
        assert wer[i] == pytest.approx(w_host), (repr(r), repr(h))


def test_sequence_reward_neg_wer():
    rids, rlens = _encode(["abc ab"], 8)
    hids, hlens = _encode(["abc ad"], 8)
    r = np.asarray(sequence_reward(rids, rlens, hids, hlens,
                                   kind="neg_wer", space_id=SPACE))
    assert r[0] == pytest.approx(-0.5)  # 1 of 2 words wrong


def test_sequence_reward_neg_wer_requires_space_id():
    rids, rlens = _encode(["ab"], 4)
    with pytest.raises(ValueError):
        sequence_reward(rids, rlens, rids, rlens, kind="neg_wer")
