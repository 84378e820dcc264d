"""Word-level timestamps + confidence scores from the greedy CTC decode
(decoding/greedy.greedy_decode_with_timing + assemble_word_timings,
surfaced as `--timestamps`): tokens anchor at their CTC emission peaks
(onset frame of each repeat-run), words group tokens between space /
word-marker boundaries, confidences are posterior geometric means. The
reference's host decode loop only returned strings
(reference model.py:321-334)."""

import json
import os

import numpy as np
import pytest

from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.decoding.greedy import (assemble_word_timings, greedy_decode,
                                        greedy_decode_with_timing)


def _peaky_log_probs(frame_ids, vocab, peak=0.9):
    """(1, T, A) log-probs whose argmax path is `frame_ids`."""
    T = len(frame_ids)
    p = np.full((1, T, vocab), (1.0 - peak) / (vocab - 1), np.float32)
    for t, s in enumerate(frame_ids):
        p[0, t, s] = peak
    return np.log(p)


def test_timing_matches_greedy_and_onsets():
    # alphabet: 0=<pad>/blank, 1=" ", 2="a", 3="b"
    frames = [2, 2, 0, 3, 0, 1, 0, 2]  # -> "ab a"
    lp = _peaky_log_probs(frames, 4)
    mask = np.ones((1, len(frames)), np.float32)

    ref_labels, ref_lens = greedy_decode(lp, mask)
    labels, lens, onsets, tok_lp = greedy_decode_with_timing(lp, mask)

    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))
    n = int(lens[0])
    assert n == 4
    # emission onsets: 'a' run starts at frame 0, 'b' at 3, ' ' at 5, 'a' at 7
    np.testing.assert_array_equal(np.asarray(onsets)[0, :n], [0, 3, 5, 7])
    # confidence = the argmax log-posterior at the onset frame
    np.testing.assert_allclose(np.asarray(tok_lp)[0, :n],
                               np.log(0.9) * np.ones(4), rtol=1e-5)


def test_timing_respects_frame_mask():
    frames = [2, 0, 3, 3, 3]
    lp = _peaky_log_probs(frames, 4)
    mask = np.array([[1, 1, 1, 0, 0]], np.float32)  # 'b' run mostly padded
    labels, lens, onsets, _ = greedy_decode_with_timing(lp, mask)
    n = int(lens[0])
    assert n == 2
    np.testing.assert_array_equal(np.asarray(labels)[0, :n], [2, 3])
    np.testing.assert_array_equal(np.asarray(onsets)[0, :n], [0, 2])


def test_assemble_word_timings_char_units():
    alphabet = Alphabet(("<pad>", " ", "a", "b"))
    ids = np.array([2, 3, 1, 2])       # "ab a"
    onsets = np.array([0, 3, 5, 7])
    tok_lp = np.log(np.array([0.9, 0.8, 0.95, 0.7], np.float32))
    spf = 0.04  # seconds per model frame
    words = assemble_word_timings(ids, 4, onsets, tok_lp, alphabet, spf)
    assert [w["word"] for w in words] == ["ab", "a"]
    assert words[0]["start"] == pytest.approx(0.0)
    assert words[0]["end"] == pytest.approx((3 + 1) * spf)
    assert words[1]["start"] == pytest.approx(7 * spf)
    assert words[1]["end"] == pytest.approx(8 * spf)
    # geometric mean of the word's token posteriors
    assert words[0]["conf"] == pytest.approx(np.sqrt(0.9 * 0.8), abs=1e-3)
    assert words[1]["conf"] == pytest.approx(0.7, abs=1e-3)


def test_assemble_word_timings_bpe_marker():
    from pg_asr_tpu.data.bpe import BpeAlphabet

    tok = BpeAlphabet(("<pad>", "▁ab", "▁a", "b"), ())
    ids = np.array([1, 2, 3])          # "ab ab"
    onsets = np.array([0, 4, 6])
    tok_lp = np.log(np.array([0.9, 0.8, 0.8], np.float32))
    words = assemble_word_timings(ids, 3, onsets, tok_lp, tok, 0.1)
    assert [w["word"] for w in words] == ["ab", "ab"]
    assert words[1]["start"] == pytest.approx(0.4)
    assert words[1]["end"] == pytest.approx(0.7)


def test_predict_timestamps_end_to_end(tmp_path):
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TrainConfig)
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=7, min_dur=0.2, max_dur=0.35)
    model_dir = str(tmp_path / "model")
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(num_epochs=1, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )
    train(corpus, model_dir, config=cfg, resume=False)
    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, timestamps=True)
    assert stats["num_utts"] >= 1

    ts_path = os.path.join(model_dir, "timestamps.jsonl")
    rows = [json.loads(l) for l in open(ts_path)]
    assert len(rows) == stats["num_utts"]
    for row in rows:
        assert 0.0 <= row["confidence"] <= 1.0
        # words reassemble the predicted string (modulo spacing)
        assert (" ".join(w["word"] for w in row["words"])
                == " ".join(row["predicted"].split()))
        for w in row["words"]:
            assert 0.0 <= w["start"] < w["end"]
            assert 0.0 < w["conf"] <= 1.0
        # monotonic non-overlapping starts
        starts = [w["start"] for w in row["words"]]
        assert starts == sorted(starts)


def test_predict_timestamps_validation(tmp_path):
    from pg_asr_tpu.predict import predict

    with pytest.raises(ValueError, match="greedy"):
        predict("x.tsv", "clips", "alphabet.txt", str(tmp_path),
                decoder="beam", timestamps=True)
