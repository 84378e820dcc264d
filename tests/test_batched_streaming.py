"""Batched multi-session streaming (serving.BatchedStreamingTranscriber):
slot isolation (each concurrent stream reproduces its single-stream
transcript exactly), idle-slot state freezing, lifecycle (open/close/
reopen), and capacity errors."""

import jax
import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig
from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.models import bilstm_ctc
from pg_asr_tpu.serving import BatchedStreamingTranscriber, StreamingTranscriber


def tiny_cfg() -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=2, dropout=0.0,
                          use_pallas_lstm=False),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = bilstm_ctc.init_params(jax.random.PRNGKey(3), cfg.model)
    alphabet = Alphabet.from_symbols(list("abcdefg"))
    rng = np.random.default_rng(0)
    waves = [(rng.standard_normal(n) * 0.3).astype(np.float32)
             for n in (1600, 2300, 900)]
    return cfg, params, alphabet, waves


def _single(cfg, params, alphabet, wave, chunk=8, right=4):
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=chunk,
                              right_context=right)
    return st.push(wave) + st.flush()


def test_concurrent_streams_match_single_stream(setup):
    """Three different-length streams interleaved through one batched
    server: every final transcript equals the single-stream path's —
    slot state (carries, norm stats, buffers) never leaks across slots."""
    cfg, params, alphabet, waves = setup
    refs = [_single(cfg, params, alphabet, w) for w in waves]

    srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=4,
                                      chunk_frames=8, right_context=4)
    slots = [srv.open() for _ in waves]
    # interleave pushes in small blocks to exercise lockstep ticks with
    # partial slot occupancy
    cursors = [0] * len(waves)
    block = 500
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for k, w in enumerate(waves):
            if cursors[k] < len(w):
                srv.push(slots[k], w[cursors[k]:cursors[k] + block])
                cursors[k] += block
        srv.drain()
    finals = [srv.flush(slots[k]) for k in range(len(waves))]
    for k in range(len(waves)):
        got = srv.text(slots[k])
        assert got == refs[k], (k, got, refs[k])
        assert srv.text(slots[k]).endswith(finals[k])


def test_slot_reuse_after_close(setup):
    """close + open recycles a slot with clean state: a reopened stream
    reproduces its fresh transcript even after the slot saw other audio."""
    cfg, params, alphabet, waves = setup
    srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=1,
                                      chunk_frames=8, right_context=4)
    a = srv.open()
    srv.push(a, waves[1])
    srv.drain()
    srv.flush(a)
    srv.close(a)

    b = srv.open()
    assert b == a  # recycled
    srv.push(b, waves[0])
    srv.drain()
    srv.flush(b)
    assert srv.text(b) == _single(cfg, params, alphabet, waves[0])


def test_batched_beam_matches_single_stream_beam(setup):
    """decoder='beam' through the batched server: each slot's final
    transcript equals the single-stream beam path's (the vmapped
    _chunk_step_beam carries one prefix beam per slot; ADVICE r3 —
    beam requests used to silently fall back to greedy)."""
    cfg, params, alphabet, waves = setup
    K, L = 4, 64

    def single_beam(wave):
        st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                                  right_context=4, decoder="beam",
                                  beam_size=K, max_label_len=L)
        return st.push(wave) + st.flush()

    refs = [single_beam(w) for w in waves]
    srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=4,
                                      chunk_frames=8, right_context=4,
                                      decoder="beam", beam_size=K,
                                      max_label_len=L)
    slots = [srv.open() for _ in waves]
    cursors = [0] * len(waves)
    block = 500
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for k, w in enumerate(waves):
            if cursors[k] < len(w):
                srv.push(slots[k], w[cursors[k]:cursors[k] + block])
                cursors[k] += block
        srv.drain()
    for k in range(len(waves)):
        srv.flush(slots[k])
        assert srv.text(slots[k]) == refs[k], (k, srv.text(slots[k]), refs[k])


def test_batched_beam_slot_reuse(setup):
    """A recycled slot's beam state resets: the reopened stream's beam
    transcript matches a fresh single-stream beam decode."""
    cfg, params, alphabet, waves = setup
    K, L = 4, 64
    srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=1,
                                      chunk_frames=8, right_context=4,
                                      decoder="beam", beam_size=K,
                                      max_label_len=L)
    a = srv.open()
    srv.push(a, waves[1])
    srv.drain()
    srv.flush(a)
    srv.close(a)
    b = srv.open()
    srv.push(b, waves[0])
    srv.drain()
    srv.flush(b)
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=4, decoder="beam",
                              beam_size=K, max_label_len=L)
    assert srv.text(b) == st.push(waves[0]) + st.flush()


def test_capacity_and_family_validation(setup):
    cfg, params, alphabet, waves = setup
    srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=2,
                                      chunk_frames=8, right_context=4)
    srv.open()
    srv.open()
    with pytest.raises(RuntimeError, match="busy"):
        srv.open()
    with pytest.raises(RuntimeError, match="not open"):
        BatchedStreamingTranscriber(params, cfg, alphabet, slots=1,
                                    chunk_frames=8, right_context=4).push(
                                        0, waves[0])

    cfg_tr = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "family": "transformer"}))
    with pytest.raises(ValueError, match="CTC"):
        BatchedStreamingTranscriber(params, cfg_tr, alphabet)
