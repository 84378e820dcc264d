"""Pseudo-labeling (--mode pseudolabel, selftrain.py): decode unlabeled
WAVs, keep the confident subset, and write a manifest train() consumes —
the self-training loop closer."""

import os

import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.selftrain import pseudo_label
from pg_asr_tpu.train import train


def _cfg(**kw):
    tr = dict(num_epochs=2, batch_size=4, learning_rate=5e-3,
              warmup_steps=0, log_every=1000)
    tr.update(kw)
    # the overfit-capable shape from test_overfit_cer (a 16-mel/hidden-16
    # model stays in the all-blank optimum for hundreds of steps)
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=24, n_fft=200,
                               win_length=200, hop_length=100),
        model=ModelConfig(vocab_size=8, input_dim=24, input_proj_dim=64,
                          hidden_size=32, num_layers=1, dropout=0.0),
        train=TrainConfig(**tr),
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("corpus_st"))
    make_synthetic_corpus(corpus, n_utts=12, seed=13, min_dur=0.3,
                          max_dur=0.5)
    model_dir = str(tmp_path_factory.mktemp("model_st"))
    # enough steps that the model leaves the all-blank optimum and emits
    train(corpus, model_dir, config=_cfg(num_epochs=60), resume=False)
    return corpus, model_dir


def test_pseudo_label_writes_confident_manifest(trained, tmp_path):
    corpus, model_dir = trained
    out_tsv = str(tmp_path / "pseudo.tsv")
    out = pseudo_label(os.path.join(corpus, "clips"),
                       os.path.join(corpus, "alphabet.txt"),
                       model_dir, out_tsv=out_tsv, batch_size=4,
                       min_conf=0.0)
    assert out["num_utts"] == 12
    assert 0 < out["num_kept"] <= 12
    lines = open(out_tsv).read().splitlines()
    assert lines[0] == "path\tsentence\tconfidence"
    assert len(lines) == 1 + out["num_kept"]
    for line in lines[1:]:
        path, text, conf = line.split("\t")
        assert os.path.exists(path)
        assert text.strip()
        assert 0.0 <= float(conf) <= 1.0

    # a min_conf above every written confidence keeps strictly fewer rows
    confs = [float(l.split("\t")[2]) for l in lines[1:]]
    cut = max(confs) + 1e-6
    out2 = pseudo_label(os.path.join(corpus, "clips"),
                        os.path.join(corpus, "alphabet.txt"),
                        model_dir, out_tsv=str(tmp_path / "p2.tsv"),
                        batch_size=4, min_conf=cut)
    assert out2["num_kept"] == 0


def test_pseudo_manifest_feeds_train(trained, tmp_path):
    """The written TSV is a valid training manifest: train() consumes it
    (path column is absolute, extra 'confidence' column is ignored)."""
    corpus, model_dir = trained
    out_tsv = str(tmp_path / "c" / "train.tsv")
    os.makedirs(str(tmp_path / "c"))
    pseudo_label(os.path.join(corpus, "clips"),
                 os.path.join(corpus, "alphabet.txt"),
                 model_dir, out_tsv=out_tsv, batch_size=4, min_conf=0.0)
    # assemble a corpus dir around the pseudo manifest
    import shutil

    shutil.copy(os.path.join(corpus, "alphabet.txt"),
                str(tmp_path / "c" / "alphabet.txt"))
    shutil.copy(os.path.join(corpus, "dev.tsv"),
                str(tmp_path / "c" / "dev.tsv"))
    os.symlink(os.path.join(corpus, "clips"), str(tmp_path / "c" / "clips"))
    out = train(str(tmp_path / "c"), str(tmp_path / "m"),
                config=_cfg(num_epochs=1), resume=False)
    assert np.isfinite(out["train_losses"]).all()


def test_pseudo_label_rejects_label_synchronous(trained, tmp_path):
    corpus, _ = trained
    cfg = _cfg().replace(model=ModelConfig(family="seq2seq"))
    with pytest.raises((ValueError, FileNotFoundError)):
        pseudo_label(os.path.join(corpus, "clips"),
                     os.path.join(corpus, "alphabet.txt"),
                     str(tmp_path / "nope"), config=cfg)
