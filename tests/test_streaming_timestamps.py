"""Streaming word timings + confidences (serving.StreamingTranscriber
timestamps=True): under the exactness setup (fixed CMVN + lookahead past
the stream end) the incremental word builder must reproduce the OFFLINE
timing decode (decoding/greedy.greedy_decode_with_timing +
assemble_word_timings) word for word."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig
from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.decoding.greedy import (assemble_word_timings,
                                        greedy_decode_with_timing)
from pg_asr_tpu.models import bilstm_ctc
from pg_asr_tpu.ops.features import extract_features
from pg_asr_tpu.serving import StreamingTranscriber


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
    # include a space so multi-word segmentation is exercised
    alphabet = Alphabet.from_symbols(list(" abcdef"))
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    return cfg, params, alphabet, wave


def _offline(cfg, params, alphabet, wave):
    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, _ = extract_features(w, ns, cfg.features)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    labels, lens, onsets, tok_lp = map(
        np.asarray, greedy_decode_with_timing(lp, mask))
    spf = cfg.features.hop_length / cfg.features.sample_rate
    words = assemble_word_timings(labels[0], int(lens[0]), onsets[0],
                                  tok_lp[0], alphabet, spf)
    m = np.asarray(mask)[0] > 0
    cells = np.asarray(feats)[0][m]
    return words, (float(cells.mean()), float(cells.var()))


def test_streaming_words_match_offline(setup):
    cfg, params, alphabet, wave = setup
    ref_words, norm = _offline(cfg, params, alphabet, wave)
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T, norm=norm, timestamps=True)
    st.push(wave)
    st.flush()
    got = st.words
    assert [w["word"] for w in got] == [w["word"] for w in ref_words]
    for g, r in zip(got, ref_words):
        assert g["start"] == pytest.approx(r["start"], abs=1e-6)
        assert g["end"] == pytest.approx(r["end"], abs=1e-6)
        assert g["conf"] == pytest.approx(r["conf"], abs=1e-3)
    # sanity: nonempty, ordered, confident in (0, 1]
    assert got, "random-weight model emitted nothing — weak fixture"
    starts = [w["start"] for w in got]
    assert starts == sorted(starts)
    assert all(0.0 < w["conf"] <= 1.0 for w in got)


def test_reset_clears_words(setup):
    cfg, params, alphabet, wave = setup
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=8, timestamps=True)
    st.push(wave)
    st.flush()
    st.reset()
    assert st.words == []
    assert st.text == ""


def test_rnnt_timestamps_rejected():
    from pg_asr_tpu.config import TransducerConfig

    cfg = tiny_cfg().replace(
        model=ModelConfig(family="transducer", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=2,
                          dropout=0.0, use_pallas_lstm=False),
        transducer=TransducerConfig(encoder="bilstm", pred_embed_dim=8,
                                    pred_hidden=8, joint_dim=8))
    from pg_asr_tpu.train import init_model_params

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    alphabet = Alphabet.from_symbols(list(" abcdef"))
    with pytest.raises(ValueError, match="label-synchronous"):
        StreamingTranscriber(params, cfg, alphabet, timestamps=True)
