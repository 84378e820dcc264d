"""CTC prefix beam search: host oracle parity vs the reference decoder."""

import numpy as np
import pytest

from pg_asr_tpu.decoding.host_beam import HostCTCBeamDecoder, collapse_repeats
from conftest import import_reference, reference_available


def _random_probs(rng, T, S, peaky=False):
    logits = rng.standard_normal((T, S))
    if peaky:
        logits = logits * 3.0
    p = np.exp(logits)
    return p / p.sum(axis=1, keepdims=True)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("T,S,beam", [(5, 4, 3), (8, 5, 5), (12, 6, 8), (20, 4, 16)])
def test_beam_parity_vs_reference(T, S, beam):
    ref_mod = import_reference("CTCdecoder")
    rng = np.random.default_rng(T * 100 + S)
    dec = HostCTCBeamDecoder()
    ref_dec = ref_mod.CTCDecoder(alphabet=list("abcdef"[:S]))
    for trial in range(5):
        probs = _random_probs(rng, T, S, peaky=(trial % 2 == 0))
        seq, nll = dec.decode(probs, beam_size=beam, blank=0)
        ref_seq, ref_nll = ref_dec.decode(probs, beam_size=beam, blank=0)
        assert tuple(seq) == tuple(ref_seq)
        assert nll == pytest.approx(ref_nll, rel=1e-9)


def test_beam_trivial_blank():
    # All mass on blank -> empty prefix, NLL = -T*log p(blank)
    T, S = 4, 3
    probs = np.full((T, S), 1e-6)
    probs[:, 0] = 1.0 - 2e-6
    dec = HostCTCBeamDecoder()
    seq, nll = dec.decode(probs, beam_size=4)
    assert seq == ()
    assert nll == pytest.approx(-T * np.log(1.0 - 2e-6), abs=1e-3)


def test_beam_merges_repeat_paths():
    # Two frames both favouring symbol 1 with some blank mass: best decode "a".
    probs = np.array([[0.2, 0.8], [0.2, 0.8]])
    # pad vocab with a third symbol to keep it non-binary
    probs = np.concatenate([probs, np.full((2, 1), 1e-9)], axis=1)
    probs = probs / probs.sum(1, keepdims=True)
    seq, _ = HostCTCBeamDecoder().decode(probs, beam_size=4)
    assert seq == (1,)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_collapse_parity():
    ref_mod = import_reference("CTCdecoder")
    for s in ["", "a", "aa", "aab", "abba", "hello  world", "mississippi"]:
        assert collapse_repeats(s) == ref_mod.collapse_fn(s)
