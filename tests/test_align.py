"""CTC forced alignment (ops/align.py): Viterbi score parity against a
brute-force path enumeration oracle, span validity/coverage, ragged
batches, and infeasible lattices."""

import itertools

import numpy as np
import pytest

from pg_asr_tpu.ops.align import ctc_forced_align, ctc_viterbi_backpointers


def _collapse(path):
    out = []
    prev = 0
    for s in path:
        if s != 0 and s != prev:
            out.append(s)
        prev = s
    return tuple(out)


def _brute_best(lp, T, labels):
    """Max path log-prob over ALL frame sequences collapsing to `labels`."""
    A = lp.shape[1]
    best = -np.inf
    best_path = None
    for path in itertools.product(range(A), repeat=T):
        if _collapse(path) != tuple(labels):
            continue
        s = sum(lp[t, path[t]] for t in range(T))
        if s > best:
            best, best_path = s, path
    return best, best_path


def _rand_lp(rng, T, A):
    logits = rng.standard_normal((T, A)).astype(np.float32)
    return np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))


@pytest.mark.parametrize("T,A,labels", [
    (4, 3, [1]),
    (5, 3, [1, 2]),
    (6, 3, [1, 1]),      # repeat needs an intervening blank
    (6, 4, [2, 3, 2]),
    (7, 3, [1, 2, 1]),
])
def test_viterbi_matches_brute_force(T, A, labels):
    rng = np.random.default_rng(T * 31 + A + len(labels))
    lp = _rand_lp(rng, T, A)
    L = len(labels)
    lab = np.zeros((1, L), np.int32)
    lab[0, :L] = labels
    _, _, score = ctc_viterbi_backpointers(
        lp[None], np.array([T], np.int32), lab, np.array([L], np.int32))
    brute, _ = _brute_best(lp, T, labels)
    assert float(score[0]) == pytest.approx(brute, abs=1e-5)


def test_spans_cover_labels_in_order():
    rng = np.random.default_rng(0)
    T, A = 12, 4
    labels = [1, 3, 3, 2]
    lp = _rand_lp(rng, T, A)
    lab = np.zeros((1, 6), np.int32)
    lab[0, :4] = labels
    spans = ctc_forced_align(lp[None], np.array([T], np.int32), lab,
                             np.array([4], np.int32))[0]
    assert [p for p, _, _ in spans] == [0, 1, 2, 3]  # every token, in order
    prev_end = 0
    for _, s, e in spans:
        assert 0 <= s < e <= T
        assert s >= prev_end  # non-overlapping, ordered
        prev_end = e
    # the spans' frames all emit the right symbol under the viterbi path:
    # re-score the aligned path and compare against the brute-force best
    brute, _ = _brute_best(lp, T, labels)
    _, _, score = ctc_viterbi_backpointers(
        lp[None], np.array([T], np.int32), lab, np.array([4], np.int32))
    assert float(score[0]) == pytest.approx(brute, abs=1e-5)


def test_ragged_batch_matches_per_utterance():
    rng = np.random.default_rng(5)
    A = 4
    rows = [([1, 2], 6), ([3], 4), ([2, 2, 1], 9)]
    T = max(t for _, t in rows)
    L = max(len(l) for l, _ in rows)
    lp = np.stack([np.pad(_rand_lp(rng, t, A), ((0, T - t), (0, 0)))
                   for _, t in rows])
    labels = np.zeros((3, L), np.int32)
    lens = np.zeros((3,), np.int32)
    flens = np.array([t for _, t in rows], np.int32)
    for i, (l, _) in enumerate(rows):
        labels[i, :len(l)] = l
        lens[i] = len(l)
    batch = ctc_forced_align(lp, flens, labels, lens)
    for i, (l, t) in enumerate(rows):
        one = ctc_forced_align(lp[i:i + 1, :t], np.array([t], np.int32),
                               labels[i:i + 1], lens[i:i + 1])[0]
        assert batch[i] == one
        assert [p for p, _, _ in batch[i]] == list(range(len(l)))


def test_infeasible_lattice_returns_empty():
    rng = np.random.default_rng(1)
    lp = _rand_lp(rng, 2, 3)
    # "aa" needs >= 3 frames (a, blank, a)
    labels = np.array([[1, 1]], np.int32)
    out = ctc_forced_align(lp[None], np.array([2], np.int32), labels,
                           np.array([2], np.int32))
    assert out == [[]]


def test_align_corpus_end_to_end(tmp_path):
    """--mode align through the driver: train a tiny model, force-align the
    test manifest's REFERENCE texts, check alignments.jsonl invariants."""
    import json
    import os

    from pg_asr_tpu.alignment import align_corpus
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TrainConfig)
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=11, min_dur=0.25,
                          max_dur=0.4)
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
    out = align_corpus(os.path.join(corpus, "test.tsv"),
                       os.path.join(corpus, "clips"),
                       os.path.join(corpus, "alphabet.txt"),
                       model_dir, batch_size=4)
    assert out["num_utts"] >= 1

    rows = [json.loads(l) for l in open(out["path"])]
    assert len(rows) == out["num_utts"]
    for row in rows:
        if not row["aligned"]:
            continue
        # words reassemble the reference text (modulo spacing), in order,
        # with valid non-overlapping spans and sane confidences
        assert (" ".join(w["word"] for w in row["words"])
                == " ".join(row["text"].split()))
        prev_end = 0.0
        for w in row["words"]:
            assert 0.0 <= w["start"] < w["end"]
            assert w["start"] >= prev_end - 1e-9
            prev_end = w["end"]
            assert 0.0 < w["conf"] <= 1.0
    # a 1-epoch model on a clean synthetic corpus aligns most rows
    assert out["num_aligned"] >= out["num_utts"] // 2


def test_align_rejects_label_synchronous_families(tmp_path):
    from pg_asr_tpu.alignment import align_corpus
    from pg_asr_tpu.config import Config, ModelConfig

    cfg = Config(model=ModelConfig(family="seq2seq"))
    with pytest.raises((ValueError, FileNotFoundError)):
        align_corpus("x.tsv", "c", "a.txt", str(tmp_path), config=cfg)
