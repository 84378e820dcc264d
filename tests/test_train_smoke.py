"""End-to-end integration smoke (BASELINE config 1/2 analogue, CPU-sized):
synthetic corpus -> train a tiny BiLSTM-CTC for a few steps -> loss drops ->
checkpoints + loss-curve artifacts exist -> predict produces predicted.txt.
"""

import os

import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.data.dataset import make_synthetic_corpus


def tiny_config() -> Config:
    cfg = Config()
    return cfg.replace(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_synthetic_corpus(root, n_utts=10, seed=0, min_dur=0.2, max_dur=0.4)
    return root


def test_train_and_predict_end_to_end(corpus, tmp_path):
    from pg_asr_tpu.train import train
    from pg_asr_tpu.predict import predict

    model_dir = str(tmp_path / "model")
    out = train(corpus, model_dir, config=tiny_config(), resume=False)

    assert np.isfinite(out["train_losses"]).all()
    assert os.path.exists(out["last_path"])
    assert os.path.exists(out["best_path"])
    assert os.path.exists(os.path.join(model_dir, "train_loss.npy"))
    assert os.path.exists(os.path.join(model_dir, "val_losses.npy"))
    curves = np.load(os.path.join(model_dir, "train_loss.npy"))
    assert curves.shape == (2,)

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, decoder="greedy")
    assert os.path.exists(os.path.join(model_dir, "predicted.txt"))
    assert 0.0 <= stats["cer_mean"]
    assert stats["num_utts"] >= 1


def test_loss_decreases_on_overfit(corpus, tmp_path):
    """One batch, repeated steps: CTC loss must fall (training signal sanity)."""
    import jax
    from pg_asr_tpu.data.dataset import BatchIterator, load_manifest
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.models import bilstm_ctc
    from pg_asr_tpu.train import make_optimizer, make_train_step
    from pg_asr_tpu.parallel.mesh import make_mesh, shard_batch_arrays

    cfg = tiny_config()
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    cfg = cfg.replace(model=ModelConfig(**{**cfg.model.__dict__,
                                           "vocab_size": alphabet.size}))
    it = BatchIterator(load_manifest(os.path.join(corpus, "train.tsv"),
                                     os.path.join(corpus, "clips")),
                       alphabet, 4, shuffle=False)
    batch = next(iter(it))

    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)
    mesh = make_mesh()
    arrays = shard_batch_arrays(
        (batch.wave, batch.num_samples, batch.labels, batch.label_lens), mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(12):
        params, opt_state, rng, loss = step(params, opt_state, rng, *arrays)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses


def test_interrupted_training_resumes(corpus, tmp_path):
    """Failure recovery (SURVEY §5): a training run killed after N epochs
    resumes from model_last — continuing the epoch counter, optimizer
    state, and the loss-curve artifacts — when train() is re-invoked on the
    same model_path (exactly what re-running the CLI does)."""
    import numpy as np

    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model_resume")
    cfg = tiny_config()
    cfg2 = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "num_epochs": 2}))
    out1 = train(corpus, model_dir, config=cfg2, resume=False)
    assert len(out1["train_losses"]) == 2

    cfg4 = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "num_epochs": 4}))
    out2 = train(corpus, model_dir, config=cfg4, resume=True)
    # epochs 3..4 ran; curves carry the full 4-epoch history
    assert len(out2["train_losses"]) == 4
    np.testing.assert_allclose(out2["train_losses"][:2],
                               out1["train_losses"], rtol=1e-6)
    curve = np.load(f"{model_dir}/train_loss.npy")
    assert curve.shape == (4,)
