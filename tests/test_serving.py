"""Streaming transcription (pg_asr_tpu/serving.py): exactness anchors vs the
offline forward pass + incremental-buffering properties.

Offline comparison note: the streaming path treats samples past the stream
end as zeros, which equals the offline path's batch zero-padding — so the
offline references here pad the wave array beyond num_samples (the common
batched-predict case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig
from pg_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings
from pg_asr_tpu.data.text import Alphabet
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
    alphabet = Alphabet.from_symbols(list("abcdefg"))
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    return cfg, params, alphabet, wave


def _offline_text(cfg, params, alphabet, wave) -> str:
    """Offline greedy decode with a zero-padded tail (batched semantics)."""
    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, _ = extract_features(w, ns, cfg.features)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    ids, lens = greedy_decode(lp, mask)
    return ids_to_strings(ids, lens, alphabet)[0]


def _offline_norm_stats(cfg, wave):
    """Scalar (mean, var) of the valid feature cells — the fixed-norm CMVN
    input (matches models.bilstm_ctc.normalize_features pooling). The wave
    is zero-padded like the offline batched reference so the FINAL frame's
    feature (whose window reads past the utterance end) matches the
    batched-predict semantics the streaming path reproduces."""
    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, _ = extract_features(w, ns, cfg.features)
    m = np.asarray(mask)[0] > 0
    cells = np.asarray(feats)[0][m]
    return float(cells.mean()), float(cells.var())


def test_single_chunk_matches_offline(setup):
    """Whole utterance in one chunk, streaming norm: the running stats see
    every frame, so the step reproduces the offline pass."""
    cfg, params, alphabet, wave = setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=T + 4,
                              right_context=0)
    out = st.push(wave) + st.flush()
    assert out == _offline_text(cfg, params, alphabet, wave)


def test_multi_chunk_fixed_norm_full_lookahead_matches_offline(setup):
    """chunk=8 with lookahead past the utterance end + fixed CMVN: the
    forward carries and windowed backward passes must compose to exactly
    the offline forward pass."""
    cfg, params, alphabet, wave = setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T,
                              norm=_offline_norm_stats(cfg, wave))
    out = st.push(wave) + st.flush()
    assert out == _offline_text(cfg, params, alphabet, wave)


def test_push_block_size_invariance(setup):
    """Arbitrary push() block sizes (incl. 1-sample dribble at the start)
    must produce identical output — pins the sample buffering/window
    assembly."""
    cfg, params, alphabet, wave = setup
    outs = []
    for blocks in ([wave],
                   np.array_split(wave, 7),
                   [wave[:1], wave[1:400], wave[400:]]):
        st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                                  right_context=4)
        text = "".join(st.push(b) for b in blocks) + st.flush()
        outs.append(text)
        assert st.text == text
    assert outs[0] == outs[1] == outs[2]


def test_limited_lookahead_is_close_to_offline(setup):
    """Small right context approximates offline: the emitted text must be
    deterministic and mostly agree with the offline decode (random-init
    models emit blanks almost everywhere, so exact equality is typical,
    but the contract here is determinism + no crash at the LC boundary)."""
    cfg, params, alphabet, wave = setup
    st1 = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                               right_context=3)
    out1 = st1.push(wave) + st1.flush()
    st2 = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                               right_context=3)
    out2 = st2.push(wave) + st2.flush()
    assert out1 == out2


def test_reset_reuses_compilation(setup):
    cfg, params, alphabet, wave = setup
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                              right_context=4)
    a = st.push(wave) + st.flush()
    st.reset()
    b = st.push(wave) + st.flush()
    assert a == b


def test_family_and_feature_validation(setup):
    cfg, params, alphabet, _ = setup
    bad_family = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "family": "seq2seq"}))
    with pytest.raises(ValueError, match="no streaming path"):
        StreamingTranscriber(params, bad_family, alphabet)
    from pg_asr_tpu.config import TransformerConfig

    bad_moe = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "family": "transformer"}),
        transformer=TransformerConfig(num_experts=2))
    with pytest.raises(ValueError, match="MoE"):
        StreamingTranscriber(params, bad_moe, alphabet)
    bad_feats = cfg.replace(features=cfg.features.__class__(
        **{**cfg.features.__dict__, "kind": "mfcc"}))
    with pytest.raises(ValueError, match="logmel"):
        StreamingTranscriber(params, bad_feats, alphabet)


def test_flush_empty_stream(setup):
    cfg, params, alphabet, _ = setup
    st = StreamingTranscriber(params, cfg, alphabet)
    assert st.flush() == ""


# ---------------------------------------------------------------------------
# Streaming prefix beam search (decoder="beam": the buffer beam state
# carried across chunks, serving._chunk_step_beam)
# ---------------------------------------------------------------------------

BEAM_K, BEAM_L = 4, 12


@pytest.fixture(scope="module")
def beam_setup(setup):
    """Params with a perturbed CTC head so the posteriors vary per frame
    (a random init emits near-uniform blanks — beams would never diverge
    and the test would compare empty strings)."""
    cfg, params, alphabet, wave = setup
    rng = np.random.default_rng(7)
    head = dict(params["ctc_head"])
    head["b"] = params["ctc_head"]["b"] + jnp.asarray(
        rng.standard_normal(params["ctc_head"]["b"].shape) * 2.0,
        params["ctc_head"]["b"].dtype)
    return cfg, {**params, "ctc_head": head}, alphabet, wave


def _offline_beam_text(cfg, params, alphabet, wave) -> str:
    from pg_asr_tpu.decoding.beam import beam_decode

    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, flens = extract_features(w, ns, cfg.features)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    ids, lens, _ = beam_decode(lp, flens, beam_size=BEAM_K,
                               max_label_len=BEAM_L, impl="buffer")
    return ids_to_strings(ids, lens, alphabet)[0]


def test_beam_single_chunk_matches_offline(beam_setup):
    cfg, params, alphabet, wave = beam_setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=T + 4,
                              right_context=0, decoder="beam",
                              beam_size=BEAM_K, max_label_len=BEAM_L)
    out = st.push(wave) + st.flush()
    assert out == _offline_beam_text(cfg, params, alphabet, wave)
    assert out != ""  # the perturbed head must produce real text


def test_beam_multi_chunk_fixed_norm_full_lookahead_matches_offline(
        beam_setup):
    """chunk=8 + lookahead past the stream end + fixed CMVN: the carried
    beam state over per-chunk posteriors must reproduce the OFFLINE buffer
    beam bit-for-bit (same _step, same frames)."""
    cfg, params, alphabet, wave = beam_setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T,
                              norm=_offline_norm_stats(cfg, wave),
                              decoder="beam", beam_size=BEAM_K,
                              max_label_len=BEAM_L)
    out = st.push(wave) + st.flush()
    assert out == _offline_beam_text(cfg, params, alphabet, wave)


def test_beam_emitted_text_is_final(beam_setup):
    """push() emissions are the live beams' agreed prefix — they must
    never be revised: the concatenated stream equals the final text, and
    every intermediate emission is a prefix of it."""
    cfg, params, alphabet, wave = beam_setup
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                              right_context=4, decoder="beam",
                              beam_size=BEAM_K, max_label_len=BEAM_L)
    sofar, checkpoints = "", []
    for block in np.array_split(wave, 5):
        sofar += st.push(block)
        checkpoints.append(sofar)
        assert st.partial_text.startswith(sofar)  # best extends the agreed
    final = sofar + st.flush()
    assert st.text == final
    for c in checkpoints:
        assert final.startswith(c)


def test_beam_push_block_size_invariance(beam_setup):
    cfg, params, alphabet, wave = beam_setup
    outs = []
    for blocks in ([wave], np.array_split(wave, 7)):
        st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                                  right_context=4, decoder="beam",
                                  beam_size=BEAM_K, max_label_len=BEAM_L)
        outs.append("".join(st.push(b) for b in blocks) + st.flush())
    assert outs[0] == outs[1]


def _lm_table(alphabet, order):
    from pg_asr_tpu.decoding.lm import train_char_ngram

    texts = ["abcabc", "bca", "cabba", "abacaba", "bbcc"]
    return train_char_ngram(texts, alphabet, order=order)


@pytest.mark.parametrize("order", [2, 3])
def test_beam_lm_fusion_matches_offline(beam_setup, order):
    """Streamed n-gram fusion (chunked _step_lm_buffer carry) must equal
    the offline beam_decode(lm=...) hash scan under full lookahead + fixed
    norm — same candidates, same merge rule, same fused top-K."""
    from pg_asr_tpu.decoding.beam import beam_decode

    cfg, params, alphabet, wave = beam_setup
    tab = _lm_table(alphabet, order)
    T = len(wave) // cfg.features.hop_length + 1

    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, flens = extract_features(w, ns, cfg.features)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    ids, lens, _ = beam_decode(lp, flens, beam_size=BEAM_K,
                               max_label_len=BEAM_L, lm=tab, lm_weight=0.4,
                               length_bonus=0.1)
    offline = ids_to_strings(ids, lens, alphabet)[0]

    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T,
                              norm=_offline_norm_stats(cfg, wave),
                              decoder="beam", beam_size=BEAM_K,
                              max_label_len=BEAM_L, lm=tab, lm_weight=0.4,
                              length_bonus=0.1)
    assert st.push(wave) + st.flush() == offline


def test_beam_lm_emitted_text_is_final(beam_setup):
    cfg, params, alphabet, wave = beam_setup
    tab = _lm_table(alphabet, 2)
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                              right_context=4, decoder="beam",
                              beam_size=BEAM_K, max_label_len=BEAM_L,
                              lm=tab, lm_weight=0.4)
    sofar = ""
    for block in np.array_split(wave, 5):
        sofar += st.push(block)
    final = sofar + st.flush()
    assert st.text == final
    assert final.startswith(sofar)


def test_beam_validation(beam_setup):
    cfg, params, alphabet, _ = beam_setup
    with pytest.raises(ValueError, match="timestamps"):
        StreamingTranscriber(params, cfg, alphabet, decoder="beam",
                             timestamps=True)
    with pytest.raises(ValueError, match="greedy or beam"):
        StreamingTranscriber(params, cfg, alphabet, decoder="nope")
    with pytest.raises(ValueError, match="decoder='beam'"):
        StreamingTranscriber(params, cfg, alphabet,
                             lm=np.zeros((9, 9), np.float32))


# ---------------------------------------------------------------------------
# Streaming transducer (RNN-T over the LC-BLSTM encoder)
# ---------------------------------------------------------------------------

def rnnt_cfg() -> Config:
    from pg_asr_tpu.config import TransducerConfig

    base = tiny_cfg()
    return base.replace(
        model=base.model.__class__(**{**base.model.__dict__,
                                      "family": "transducer"}),
        transducer=TransducerConfig(encoder="bilstm", pred_embed_dim=8,
                                    pred_hidden=8, joint_dim=12))


@pytest.fixture(scope="module")
def rnnt_setup():
    from pg_asr_tpu.models import transducer

    cfg = rnnt_cfg()
    params = transducer.init_params(jax.random.PRNGKey(5), cfg)
    alphabet = Alphabet.from_symbols(list("abcdefg"))
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    return cfg, params, alphabet, wave


def _offline_rnnt_text(cfg, params, alphabet, wave) -> str:
    from pg_asr_tpu.decoding.transducer import transducer_greedy_decode
    from pg_asr_tpu.models import transducer

    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, flens = extract_features(w, ns, cfg.features)
    enc, _, olens = transducer.encode(params, feats, mask, flens, cfg)
    labels, lens = transducer_greedy_decode(params, enc, olens, cfg,
                                            max_label_len=256)
    return ids_to_strings(labels, lens, alphabet)[0]


def test_rnnt_single_chunk_matches_offline(rnnt_setup):
    cfg, params, alphabet, wave = rnnt_setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=T + 4,
                              right_context=0)
    out = st.push(wave) + st.flush()
    assert out == _offline_rnnt_text(cfg, params, alphabet, wave)
    assert out != ""  # random-init transducers emit labels (unlike CTC)


def test_rnnt_multi_chunk_fixed_norm_full_lookahead_matches_offline(rnnt_setup):
    """Exactness anchor: same encoder states (full lookahead + fixed CMVN)
    => the streamed frame-synchronous decode EQUALS the offline decode."""
    cfg, params, alphabet, wave = rnnt_setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T,
                              norm=_offline_norm_stats(cfg, wave))
    out = st.push(wave) + st.flush()
    assert out == _offline_rnnt_text(cfg, params, alphabet, wave)


def test_rnnt_push_block_size_invariance(rnnt_setup):
    cfg, params, alphabet, wave = rnnt_setup
    outs = []
    for blocks in ([wave], np.array_split(wave, 5),
                   [wave[:1], wave[1:700], wave[700:]]):
        st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=6,
                                  right_context=4)
        text = "".join(st.push(b) for b in blocks) + st.flush()
        outs.append(text)
        assert st.text == text
    assert outs[0] == outs[1] == outs[2]


def test_rnnt_backbone_validation(rnnt_setup):
    from pg_asr_tpu.config import TransducerConfig

    cfg, params, alphabet, _ = rnnt_setup
    bad = cfg.replace(transducer=TransducerConfig(encoder="conformer"))
    with pytest.raises(ValueError, match="bilstm"):
        StreamingTranscriber(params, bad, alphabet)


def test_rnnt_emission_cap_matches_offline(rnnt_setup):
    """decode.max_label_len truncation: the streamed decode must stop
    emitting (and freeze its state) exactly where the offline decode does."""
    from pg_asr_tpu.config import DecodeConfig

    cfg, params, alphabet, wave = rnnt_setup
    cfg = cfg.replace(decode=DecodeConfig(max_label_len=3))
    T = len(wave) // cfg.features.hop_length + 1

    from pg_asr_tpu.decoding.transducer import transducer_greedy_decode
    from pg_asr_tpu.models import transducer as tmod
    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, flens = extract_features(w, ns, cfg.features)
    enc, _, olens = tmod.encode(params, feats, mask, flens, cfg)
    labels, lens = transducer_greedy_decode(params, enc, olens, cfg,
                                            max_label_len=3)
    offline = ids_to_strings(labels, lens, alphabet)[0]
    assert len(offline) == 3  # the cap binds (random init emits plenty)

    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=T,
                              norm=_offline_norm_stats(cfg, wave))
    assert st.push(wave) + st.flush() == offline


# ---------------------------------------------------------------------------
# Attention families (transformer/conformer): Emformer-style block
# processing with overlapping windows (serving._chunk_step_attention)
# ---------------------------------------------------------------------------

def _attn_cfg(family: str) -> Config:
    from pg_asr_tpu.config import ConformerConfig, TransformerConfig

    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family=family, vocab_size=8, input_dim=16,
                          dropout=0.0),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        conformer=ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                                  ffn_dim=64, conv_kernel=7, dropout=0.0,
                                  subsample=2),
    )


def _attn_params(cfg):
    from pg_asr_tpu.train import init_model_params

    return init_model_params(jax.random.PRNGKey(7), cfg)


def _attn_offline_text(cfg, params, alphabet, wave) -> str:
    from pg_asr_tpu.models import acoustic_forward

    w = jnp.asarray(np.pad(wave, (0, 512)))[None, :]
    ns = jnp.asarray([len(wave)], jnp.int32)
    feats, mask, flens = extract_features(w, ns, cfg.features)
    lp, omask, olens = acoustic_forward(params, feats, mask, flens, cfg,
                                        train=False)
    ids, lens = greedy_decode(lp, omask)
    return ids_to_strings(ids, lens, alphabet)[0]


@pytest.fixture(scope="module", params=["transformer", "conformer"])
def attn_setup(request):
    cfg = _attn_cfg(request.param)
    params = _attn_params(cfg)
    alphabet = Alphabet.from_symbols(list("abcdefg"))
    rng = np.random.default_rng(11)
    wave = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    return cfg, params, alphabet, wave


def test_attention_single_chunk_matches_offline(attn_setup):
    """Whole utterance in one window, streaming norm: running stats see
    every frame and the window IS the full context, so the streamed output
    equals the offline forward exactly."""
    cfg, params, alphabet, wave = attn_setup
    T = len(wave) // cfg.features.hop_length + 1
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=T + 4,
                              right_context=0)
    out = st.push(wave) + st.flush()
    assert out == _attn_offline_text(cfg, params, alphabet, wave)


def test_attention_multi_chunk_full_context_matches_offline(attn_setup):
    """chunk=8 with left and right context covering the whole utterance +
    fixed CMVN: every window spans the full utterance, so each committed
    chunk's outputs must equal the offline forward's."""
    cfg, params, alphabet, wave = attn_setup
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=32, left_context=32,
                              norm=_offline_norm_stats(cfg, wave))
    out = st.push(wave) + st.flush()
    assert out == _attn_offline_text(cfg, params, alphabet, wave)


def test_attention_push_block_size_invariance(attn_setup):
    """Limited context (the real streaming regime): emitted text must not
    depend on how the audio is pushed."""
    cfg, params, alphabet, wave = attn_setup

    def run(block):
        st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                                  right_context=4, left_context=16)
        out = []
        for i in range(0, len(wave), block):
            out.append(st.push(wave[i:i + block]))
        out.append(st.flush())
        return "".join(out)

    a = run(100)
    b = run(700)
    c = run(len(wave))
    assert a == b == c


def test_attention_frames_accounting(attn_setup):
    """Every frame is committed exactly once; total emitted subframe count
    equals the offline ceil(T/s)."""
    cfg, params, alphabet, wave = attn_setup
    st = StreamingTranscriber(params, cfg, alphabet, chunk_frames=8,
                              right_context=4, left_context=16)
    st.push(wave)
    st.flush()
    T = len(wave) // cfg.features.hop_length + 1
    assert st._frames_done == T
