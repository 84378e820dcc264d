"""Two-pass n-best rescoring with the neural LM (decoding/rescore.py):
zero-weight equivalence with the plain beam's top-1, host-oracle score
parity, LM steering of the re-ranking, and the --lm_pass CLI surface."""

import os

import numpy as np
import pytest

from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.decoding.beam import beam_decode, beam_decode_nbest
from pg_asr_tpu.decoding.neural_lm import (score_prefix_neural,
                                           train_neural_lm)
from pg_asr_tpu.decoding.rescore import rescore_nbest


def _rand_probs(rng, T, S, sharp=2.0):
    logits = rng.standard_normal((T, S)) * sharp
    p = np.exp(logits)
    return p / p.sum(1, keepdims=True)


@pytest.fixture(scope="module")
def alphabet():
    return Alphabet.from_symbols(list("abcde"))


@pytest.fixture(scope="module")
def lm(alphabet):
    texts = ["abab", "abba", "ababab", "ab"] * 8
    return train_neural_lm(texts, alphabet, steps=150, batch=16, lr=1e-2,
                           seed=0, embed_dim=16, hidden=32, layers=2)


def test_zero_weight_matches_plain_beam(alphabet, lm):
    """lm_weight=0 re-ranking must return exactly the AM beam's top-1
    (slot-0 parity, first-max tie-break)."""
    rng = np.random.default_rng(3)
    B, T, S = 3, 10, alphabet.size
    probs = np.stack([_rand_probs(rng, T, S) for _ in range(B)])
    lp = np.log(probs, dtype=np.float32)[None].reshape(B, T, S)
    flens = np.array([T, T - 2, T - 4], np.int32)

    ref_labels, ref_lens, _ = beam_decode(lp, flens, beam_size=8,
                                          max_label_len=16)
    labels, lens, _ = rescore_nbest(lp, flens, lm, beam_size=8,
                                    max_label_len=16, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))
    for i in range(B):
        n = int(lens[i])
        np.testing.assert_array_equal(np.asarray(labels)[i, :n],
                                      np.asarray(ref_labels)[i, :n])


def test_rescore_picks_combined_argmax(alphabet, lm):
    """The winner must be the argmax of -nll + w*lm over the live n-best,
    with the LM term matching the host prefix scorer."""
    rng = np.random.default_rng(11)
    T, S, K, W = 12, alphabet.size, 8, 0.7
    lp = np.log(_rand_probs(rng, T, S), dtype=np.float32)[None]
    flens = np.array([T], np.int32)

    hyps, lens, nll = map(np.asarray,
                          beam_decode_nbest(lp, flens, beam_size=K,
                                            max_label_len=16))
    best_score, best_k = -np.inf, -1
    for k in range(K):
        if nll[0, k] > 1e29:
            continue
        ids = [int(x) for x in hyps[0, k, : int(lens[0, k])]]
        s = -nll[0, k] + W * score_prefix_neural(lm, ids)
        if s > best_score:
            best_score, best_k = s, k

    labels, out_lens, scores = rescore_nbest(lp, flens, lm, beam_size=K,
                                             max_label_len=16, lm_weight=W)
    n = int(out_lens[0])
    np.testing.assert_array_equal(np.asarray(labels)[0, :n],
                                  hyps[0, best_k, :n])
    assert float(scores[0]) == pytest.approx(best_score, abs=1e-3)


def test_lm_steers_reranking(alphabet, lm):
    """With an AM that makes 'abab' and a shuffled variant nearly tied,
    a strong ab-alternation LM must flip the ranking toward 'abab'."""
    a, b = alphabet.char2ind["a"], alphabet.char2ind["b"]
    T, S = 8, alphabet.size
    # frames emitting a b a b with mild ambiguity toward b b a a
    p = np.full((T, S), 0.02, np.float32)
    seq = [a, 0, b, 0, a, 0, b, 0]
    alt = [b, 0, b, 0, a, 0, a, 0]
    for t in range(T):
        p[t, seq[t]] = 0.46
        p[t, alt[t]] += 0.44
    p /= p.sum(1, keepdims=True)
    lp = np.log(p)[None]
    flens = np.array([T], np.int32)

    plain, plain_lens, _ = beam_decode(lp, flens, beam_size=8,
                                       max_label_len=8)
    rer, rer_lens, _ = rescore_nbest(lp, flens, lm, beam_size=8,
                                     max_label_len=8, lm_weight=3.0)
    rer_ids = [int(x) for x in np.asarray(rer)[0, : int(rer_lens[0])]]
    assert rer_ids == [a, b, a, b]
    # and the LM actually changed something vs some plain candidate set
    assert score_prefix_neural(lm, rer_ids) >= score_prefix_neural(
        lm, [int(x) for x in np.asarray(plain)[0, : int(plain_lens[0])]])


def test_cli_lm_pass_rescore_end_to_end(tmp_path):
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
                    model_dir, batch_size=4, decoder="beam", beam_size=4,
                    lm_order=2, lm_type="neural", lm_steps=20,
                    lm_pass="rescore",
                    lm_train_tsv=os.path.join(corpus, "train.tsv"))
    assert stats["num_utts"] >= 1

    with pytest.raises(ValueError, match="rescore"):
        predict("x.tsv", "c", "a.txt", model_dir, lm_pass="rescore",
                lm_type="ngram")
