"""--mode stream: incremental transcription of one WAV through the real CLI
(the user surface of serving.StreamingTranscriber)."""

import os

import numpy as np
import pytest

from pg_asr_tpu.cli import main
from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from pg_asr_tpu.train import train

    root = tmp_path_factory.mktemp("stream")
    corpus = str(root / "corpus")
    model = str(root / "model")
    make_synthetic_corpus(corpus, n_utts=8, seed=13, min_dur=0.2,
                          max_dur=0.4)
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0,
                          use_pallas_lstm=False),
        train=TrainConfig(num_epochs=1, batch_size=4, warmup_steps=0,
                          log_every=1000),
    )
    train(corpus, model, config=cfg, resume=False)
    return corpus, model


def test_stream_mode_transcribes_wav(trained, capsys):
    corpus, model = trained
    wav = os.path.join(corpus, "clips", sorted(
        os.listdir(os.path.join(corpus, "clips")))[0])
    rc = main(["--mode", "stream", "--corpus_path", corpus,
               "--model_path", model, "--wav", wav,
               "--chunk_frames", "8", "--right_context", "4",
               "--block_ms", "50"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.endswith("\n")  # printed something (possibly empty text)


def test_stream_mode_requires_wav(trained):
    corpus, model = trained
    with pytest.raises(SystemExit, match="--wav"):
        main(["--mode", "stream", "--corpus_path", corpus,
              "--model_path", model])


def test_stream_mode_conformer(tmp_path, capsys):
    """--mode stream works for --model conformer (attention-family block
    streaming through the real CLI)."""
    from pg_asr_tpu.config import ConformerConfig
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    model = str(tmp_path / "model")
    make_synthetic_corpus(corpus, n_utts=8, seed=14, min_dur=0.2,
                          max_dur=0.4)
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="conformer", vocab_size=8, input_dim=16,
                          dropout=0.0),
        conformer=ConformerConfig(num_layers=1, d_model=32, num_heads=2,
                                  ffn_dim=64, conv_kernel=7, dropout=0.0,
                                  subsample=2),
        train=TrainConfig(num_epochs=1, batch_size=4, warmup_steps=0,
                          log_every=1000),
    )
    train(corpus, model, config=cfg, resume=False)
    wav = os.path.join(corpus, "clips", sorted(
        os.listdir(os.path.join(corpus, "clips")))[0])
    rc = main(["--mode", "stream", "--corpus_path", corpus,
               "--model_path", model, "--wav", wav,
               "--chunk_frames", "8", "--right_context", "4",
               "--left_context", "16", "--block_ms", "50"])
    assert rc == 0
    assert capsys.readouterr().out.endswith("\n")
