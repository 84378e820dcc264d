"""On-device vectorized beam search vs the host oracle (and the reference
decoder) on random posteriors: identical label sequences, close NLL."""

import numpy as np
import pytest

from pg_asr_tpu.decoding.beam import beam_decode
from pg_asr_tpu.decoding.host_beam import HostCTCBeamDecoder
from conftest import import_reference, reference_available


def _rand_probs(rng, T, S, sharp=1.0):
    logits = rng.standard_normal((T, S)) * sharp
    p = np.exp(logits)
    return p / p.sum(1, keepdims=True)


@pytest.mark.parametrize("T,S,K", [(6, 4, 4), (10, 5, 8), (15, 6, 8)])
def test_device_beam_matches_host(T, S, K):
    rng = np.random.default_rng(T * 7 + S)
    host = HostCTCBeamDecoder()
    B = 3
    probs = np.stack([_rand_probs(rng, T, S, sharp=2.0) for _ in range(B)])
    log_probs = np.log(probs).astype(np.float32)
    labels, lens, nll = beam_decode(log_probs, np.full(B, T), beam_size=K,
                                    max_label_len=T)
    for b in range(B):
        ref_seq, ref_nll = host.decode(probs[b], beam_size=K)
        got = tuple(np.asarray(labels[b][: int(lens[b])]).tolist())
        assert got == tuple(ref_seq), b
        assert float(nll[b]) == pytest.approx(ref_nll, rel=1e-3, abs=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_device_beam_matches_reference_oracle():
    ref_mod = import_reference("CTCdecoder")
    rng = np.random.default_rng(42)
    T, S, K = 12, 5, 8
    probs = _rand_probs(rng, T, S, sharp=2.5)
    ref_dec = ref_mod.CTCDecoder(alphabet=list("abcde"))
    ref_seq, ref_nll = ref_dec.decode(probs, beam_size=K, blank=0)

    labels, lens, nll = beam_decode(np.log(probs)[None].astype(np.float32),
                                    np.array([T]), beam_size=K, max_label_len=T)
    got = tuple(np.asarray(labels[0][: int(lens[0])]).tolist())
    assert got == tuple(ref_seq)
    assert float(nll[0]) == pytest.approx(ref_nll, rel=1e-3, abs=1e-3)


def test_device_beam_respects_frame_lens():
    rng = np.random.default_rng(1)
    T, S = 12, 4
    probs = _rand_probs(rng, T, S, sharp=2.0)
    lp = np.log(probs).astype(np.float32)
    # utterance truncated at 5 frames must equal decoding the first 5 frames
    labels_full, lens_full, nll_full = beam_decode(
        lp[None, :5], np.array([5]), beam_size=4, max_label_len=5)
    labels_trunc, lens_trunc, nll_trunc = beam_decode(
        lp[None], np.array([5]), beam_size=4, max_label_len=12)
    a = np.asarray(labels_full[0][: int(lens_full[0])])
    b = np.asarray(labels_trunc[0][: int(lens_trunc[0])])
    np.testing.assert_array_equal(a, b)
    assert float(nll_full[0]) == pytest.approx(float(nll_trunc[0]), rel=1e-5)


def test_device_beam_all_blank():
    T, S = 5, 3
    probs = np.full((T, S), 1e-7)
    probs[:, 0] = 1.0
    probs = probs / probs.sum(1, keepdims=True)
    labels, lens, nll = beam_decode(np.log(probs)[None].astype(np.float32),
                                    np.array([T]), beam_size=4, max_label_len=5)
    assert int(lens[0]) == 0
    assert float(nll[0]) == pytest.approx(-T * np.log(probs[0, 0]), abs=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hash_impl_matches_buffer_impl(seed):
    """The rolling-hash/backpointer fast path must reproduce the explicit
    prefix-buffer implementation exactly (labels, lens, NLL)."""
    rng = np.random.default_rng(seed)
    B, T, S, K = 4, 20, 6, 8
    probs = np.stack([_rand_probs(rng, T, S, sharp=1.5) for _ in range(B)])
    lp = np.log(probs).astype(np.float32)
    flens = np.array([20, 13, 7, 1])
    out_h = beam_decode(lp, flens, beam_size=K, max_label_len=T, impl="hash")
    out_b = beam_decode(lp, flens, beam_size=K, max_label_len=T, impl="buffer")
    np.testing.assert_array_equal(np.asarray(out_h[0]), np.asarray(out_b[0]))
    np.testing.assert_array_equal(np.asarray(out_h[1]), np.asarray(out_b[1]))
    np.testing.assert_allclose(np.asarray(out_h[2]), np.asarray(out_b[2]),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# Pallas whole-scan kernel (decoding/pallas_beam.py), interpret mode on CPU
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("T,S,K", [(6, 4, 4), (13, 5, 8), (20, 8, 16)])
def test_pallas_beam_matches_hash(T, S, K):
    """Kernel path == jnp hash path: labels, lens, nll (same candidate set,
    same tie order), including ragged frame lengths and dead-slot handling."""
    rng = np.random.default_rng(T * 13 + S + K)
    B = 4
    probs = np.stack([_rand_probs(rng, T, S, sharp=2.0) for _ in range(B)])
    lp = np.log(probs).astype(np.float32)
    flens = np.array([T, max(1, T // 2), max(1, T - 3), 2], np.int32)[:B]

    l_h, n_h, nll_h = beam_decode(lp, flens, beam_size=K, max_label_len=T,
                                  impl="hash")
    l_p, n_p, nll_p = beam_decode(lp, flens, beam_size=K, max_label_len=T,
                                  impl="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(n_h), np.asarray(n_p))
    np.testing.assert_array_equal(np.asarray(l_h), np.asarray(l_p))
    np.testing.assert_allclose(np.asarray(nll_h), np.asarray(nll_p),
                               rtol=1e-5, atol=1e-5)


def test_pallas_beam_matches_host_oracle():
    rng = np.random.default_rng(99)
    T, S, K = 12, 5, 8
    host = HostCTCBeamDecoder()
    probs = _rand_probs(rng, T, S, sharp=2.5)
    labels, lens, nll = beam_decode(np.log(probs)[None].astype(np.float32),
                                    np.array([T]), beam_size=K,
                                    max_label_len=T, impl="pallas",
                                    interpret=True)
    ref_seq, ref_nll = host.decode(probs, beam_size=K)
    got = tuple(np.asarray(labels[0][: int(lens[0])]).tolist())
    assert got == tuple(ref_seq)
    assert float(nll[0]) == pytest.approx(ref_nll, rel=1e-3, abs=1e-3)


def test_exact_prune_and_unroll_are_bit_identical():
    """prune >= K+2 is provably exact and unroll only restructures the
    scan: both must reproduce the default decode bit-for-bit."""
    rng = np.random.default_rng(123)
    T, S, K, B = 20, 8, 6, 4
    probs = np.stack([_rand_probs(rng, T, S, sharp=2.0) for _ in range(B)])
    lp = np.log(probs).astype(np.float32)
    flens = np.array([T, T - 3, T // 2, 2], np.int32)
    base = beam_decode(lp, flens, beam_size=K, max_label_len=T)
    for kw in ({"prune": K + 2}, {"unroll": 4}, {"prune": K + 2, "unroll": 2}):
        got = beam_decode(lp, flens, beam_size=K, max_label_len=T, **kw)
        for a, b in zip(base, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kw))


def test_aggressive_prune_stays_close_on_peaked_posteriors():
    """prune below the exactness threshold is an opt-in speed knob with a
    BOUNDED deviation: on peaked (trained-model-like) posteriors the top-1
    must agree on the overwhelming majority of utterances."""
    rng = np.random.default_rng(7)
    T, S, K, B = 30, 12, 8, 24
    probs = np.stack([_rand_probs(rng, T, S, sharp=4.0) for _ in range(B)])
    lp = np.log(probs).astype(np.float32)
    flens = np.full(B, T, np.int32)
    bl, bn, _ = beam_decode(lp, flens, beam_size=K, max_label_len=T)
    pl, pn, _ = beam_decode(lp, flens, beam_size=K, max_label_len=T, prune=4)
    same = [int(bn[i]) == int(pn[i])
            and bool(np.all(np.asarray(bl[i][: int(bn[i])])
                            == np.asarray(pl[i][: int(pn[i])])))
            for i in range(B)]
    assert np.mean(same) >= 0.8, np.mean(same)
