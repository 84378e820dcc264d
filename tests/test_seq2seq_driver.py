"""End-to-end seq2seq family through the train/predict drivers: synthetic
corpus -> train --model seq2seq -> checkpoints/curves -> predict (greedy EOS
cut + batched attention-decoder beam search).

The reference's train() targets exactly this model (reference
model.py:200,232), but its decoder returns None (model.py:117); this
exercises the fixed-up driver path for the family.
"""

import os

import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               Seq2SeqConfig, TrainConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus


def tiny_config() -> Config:
    cfg = Config()
    return cfg.replace(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="seq2seq", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1,
                          dropout=0.0),
        seq2seq=Seq2SeqConfig(vocab_size=8, embed_dim=16, dec_hidden=32),
        train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_s2s"))
    make_synthetic_corpus(root, n_utts=10, seed=3, min_dur=0.2, max_dur=0.4)
    return root


def test_seq2seq_train_and_predict(corpus, tmp_path):
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model")
    out = train(corpus, model_dir, config=tiny_config(), resume=False)
    assert np.isfinite(out["train_losses"]).all()
    assert out["config"].model.family == "seq2seq"
    assert os.path.exists(out["best_path"])

    # family round-trips through config.json; greedy = EOS-cut generation
    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, decoder="greedy")
    assert os.path.exists(os.path.join(model_dir, "predicted.txt"))
    assert stats["num_utts"] >= 1

    # true attention-decoder beam search (models/seq2seq.beam_generate)
    stats_beam = predict(os.path.join(corpus, "test.tsv"),
                         os.path.join(corpus, "clips"),
                         os.path.join(corpus, "alphabet.txt"),
                         model_dir, batch_size=4, decoder="beam", beam_size=4)
    assert stats_beam["num_utts"] >= 1


def test_seq2seq_loss_decreases_on_overfit(corpus):
    import jax

    from pg_asr_tpu.data.dataset import BatchIterator, load_manifest
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.parallel.mesh import make_mesh, shard_batch_arrays
    from pg_asr_tpu.train import (init_model_params, make_optimizer,
                                  make_train_step)

    cfg = tiny_config()
    cfg = cfg.replace(train=TrainConfig(**{**cfg.train.__dict__,
                                           "learning_rate": 1e-2}))
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    cfg = cfg.replace(
        model=ModelConfig(**{**cfg.model.__dict__, "vocab_size": alphabet.size}),
        seq2seq=Seq2SeqConfig(**{**cfg.seq2seq.__dict__,
                                 "vocab_size": alphabet.size}))
    it = BatchIterator(load_manifest(os.path.join(corpus, "train.tsv"),
                                     os.path.join(corpus, "clips")),
                       alphabet, 4, shuffle=False)
    batch = next(iter(it))

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    assert "embed" in params and "dec_lstm" in params
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    mesh = make_mesh()
    arrays = shard_batch_arrays(
        (batch.wave, batch.num_samples, batch.labels, batch.label_lens), mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(30):
        params, opt_state, rng, loss = step(params, opt_state, rng, *arrays)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses


def test_seq2seq_nll_loss_eos_semantics():
    """The first pad slot after each target is IN the loss (EOS training);
    later pads are out; per-step means match a hand computation."""
    import jax.numpy as jnp

    from pg_asr_tpu.losses import seq2seq_nll_loss

    B, T, A = 2, 4, 5
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, T, A)).astype(np.float32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    targets = np.array([[1, 2, 0, 0], [3, 0, 0, 0]], np.int32)
    lens = np.array([2, 1], np.int32)

    got = float(seq2seq_nll_loss(jnp.asarray(lp), jnp.asarray(targets),
                                 jnp.asarray(lens)))
    keep = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32)  # len+1 slots
    nll = -np.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    per_step = (nll * keep).sum(0) / np.maximum(keep.sum(0), 1.0)
    assert np.isclose(got, per_step.sum(), rtol=1e-5)
