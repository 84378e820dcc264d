"""Character n-gram LM shallow fusion (decoding/lm.py + beam_decode(lm=...)):
trainer sanity, device-vs-host-oracle parity under the fused ranking key,
zero-weight equivalence, and LM steering on crafted posteriors."""

import numpy as np
import pytest

from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.decoding.beam import beam_decode
from pg_asr_tpu.decoding.host_beam import HostCTCBeamDecoder
from pg_asr_tpu.decoding.lm import score_prefix, train_char_ngram


def _rand_probs(rng, T, S, sharp=2.0):
    logits = rng.standard_normal((T, S)) * sharp
    p = np.exp(logits)
    return p / p.sum(1, keepdims=True)


@pytest.fixture(scope="module")
def alphabet():
    return Alphabet.from_symbols(list("abcde"))


def test_trainer_normalizes_and_learns(alphabet):
    texts = ["abab", "abba", "ab"] * 10
    tab = train_char_ngram(texts, alphabet, order=2, add_k=0.1)
    A = alphabet.size
    assert tab.shape == (A, A)
    # rows are distributions over non-blank symbols
    np.testing.assert_allclose(np.exp(tab[:, 1:]).sum(axis=1), 1.0, atol=1e-5)
    a, b = alphabet.char2ind["a"], alphabet.char2ind["b"]
    # 'b' follows 'a' in every text; 'a' never follows itself
    assert tab[a, b] > tab[a, a]
    # BOS row: every text starts with 'a'
    assert tab[0, a] > tab[0, b]

    tab3 = train_char_ngram(texts, alphabet, order=3, add_k=0.1)
    assert tab3.shape == (A, A, A)
    np.testing.assert_allclose(np.exp(tab3[:, :, 1:]).sum(axis=2), 1.0,
                               atol=1e-4)
    # score_prefix composes: logP(ab) = logP(a|BOS,BOS) + logP(b|BOS,a)
    ids = [a, b]
    assert score_prefix(tab3, ids) == pytest.approx(
        float(tab3[0, 0, a]) + float(tab3[0, a, b]), abs=1e-6)


@pytest.mark.parametrize("order", [2, 3])
@pytest.mark.parametrize("T,S,K", [(8, 4, 4), (12, 6, 8)])
def test_device_lm_fusion_matches_host(alphabet, order, T, S, K):
    rng = np.random.default_rng(T * 13 + S + order)
    texts = ["abcab", "bca", "cab", "abc"] * 5
    full_tab = train_char_ngram(texts, alphabet, order=order, add_k=0.5)
    tab = full_tab[(slice(None, S),) * order]  # crop to the test vocab
    # re-normalize the cropped rows so it is still a proper table
    tab = tab - np.log(np.exp(tab[..., 1:]).sum(-1, keepdims=True)
                       + 1e-30)
    host = HostCTCBeamDecoder()
    B = 3
    lam, beta = 0.5, 0.1
    probs = np.stack([_rand_probs(rng, T, S) for _ in range(B)])
    labels, lens, nll = beam_decode(
        np.log(probs).astype(np.float32), np.full(B, T), beam_size=K,
        max_label_len=T, lm=tab, lm_weight=lam, length_bonus=beta)
    for b in range(B):
        ref_seq, ref_score = host.decode(probs[b], beam_size=K, lm=tab,
                                         lm_weight=lam, length_bonus=beta)
        got = tuple(np.asarray(labels[b][: int(lens[b])]).tolist())
        assert got == tuple(ref_seq), (order, b)
        assert float(nll[b]) == pytest.approx(ref_score, rel=1e-3, abs=1e-3)


def test_zero_weight_matches_plain_beam(alphabet):
    rng = np.random.default_rng(7)
    T, S, K = 10, 5, 8
    probs = _rand_probs(rng, T, S)
    lp = np.log(probs).astype(np.float32)[None]
    tab = train_char_ngram(["abcd"] * 3, alphabet, order=2)[:S, :S]
    l0, n0, s0 = beam_decode(lp, np.array([T]), beam_size=K, max_label_len=T)
    l1, n1, s1 = beam_decode(lp, np.array([T]), beam_size=K, max_label_len=T,
                             lm=tab, lm_weight=0.0, length_bonus=0.0)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)


def test_lm_steers_ambiguous_decode(alphabet):
    """Posteriors split 50/50 between 'b' and 'c' after a clear 'a'; a
    bigram trained on 'ab' must tip the decode to 'ab'."""
    a, b, c = (alphabet.char2ind[ch] for ch in "abc")
    A = alphabet.size
    T = 3
    probs = np.full((T, A), 1e-6)
    probs[0, a] = 1.0
    probs[1, 0] = 1.0  # blank separator
    probs[2, b] = 0.499
    probs[2, c] = 0.501  # acoustics slightly favour 'c'
    probs /= probs.sum(1, keepdims=True)
    lp = np.log(probs).astype(np.float32)[None]

    tab = train_char_ngram(["ab"] * 50, alphabet, order=2, add_k=0.01)
    l0, n0, _ = beam_decode(lp, np.array([T]), beam_size=4, max_label_len=T)
    assert tuple(np.asarray(l0[0][: int(n0[0])]).tolist()) == (a, c)
    l1, n1, _ = beam_decode(lp, np.array([T]), beam_size=4, max_label_len=T,
                            lm=tab, lm_weight=0.5)
    assert tuple(np.asarray(l1[0][: int(n1[0])]).tolist()) == (a, b)


def test_lm_requires_hash_impl(alphabet):
    tab = train_char_ngram(["ab"], alphabet, order=2)
    lp = np.zeros((1, 4, alphabet.size), np.float32)
    with pytest.raises(ValueError, match="hash"):
        beam_decode(lp, np.array([4]), beam_size=4, max_label_len=4,
                    impl="buffer", lm=tab)
