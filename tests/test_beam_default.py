"""Production beam defaults (VERDICT r4 #5): predict() resolves the
config's beam_prune (6, measured lossless at >= 4 on trained posteriors —
docs/PERF.md beam-prune table) when no flag is given, honours an explicit
`--beam_prune 0` as the exact search, and never applies a prune where the
decode must stay exact (the rescore pass).

Anchor: the beam eval path the reference used (/root/reference/model.py:324).
"""

import os

import jax
import pytest

from pg_asr_tpu.checkpoint import CheckpointManager
from pg_asr_tpu.config import Config, DecodeConfig, FeatureConfig, ModelConfig
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.data.text import Alphabet
from pg_asr_tpu.models import bilstm_ctc
from pg_asr_tpu.predict import predict


@pytest.fixture(scope="module")
def saved_model(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("beamdef")
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    make_synthetic_corpus(corpus, n_utts=4, seed=3, min_dur=0.15, max_dur=0.3)
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=alphabet.size, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1),
        decode=DecodeConfig(beam_size=16),
    )
    model_dir = str(tmp_path / "model")
    mgr = CheckpointManager(model_dir)
    mgr.save_config(cfg.to_json())
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    mgr.save({"params": params, "opt_state": {}, "step": 0, "epoch": 1,
              "best_val_loss": 1.0}, val_loss=1.0)
    return corpus, model_dir


def _run_predict(saved_model, monkeypatch, **kw):
    """predict() with beam_decode wrapped to capture its prune kwarg."""
    corpus, model_dir = saved_model
    import pg_asr_tpu.decoding.beam as beam_mod

    seen = {}
    real = beam_mod.beam_decode

    def spy(*args, **kwargs):
        seen["prune"] = kwargs.get("prune")
        return real(*args, **kwargs)

    monkeypatch.setattr(beam_mod, "beam_decode", spy)
    predict(os.path.join(corpus, "test.tsv"),
            os.path.join(corpus, "clips"),
            os.path.join(corpus, "alphabet.txt"),
            model_dir, batch_size=4, decoder="beam", **kw)
    return seen


def test_default_prune_is_config_default(saved_model, monkeypatch):
    seen = _run_predict(saved_model, monkeypatch)
    assert seen["prune"] == 6  # DecodeConfig.beam_prune


def test_explicit_zero_means_exact(saved_model, monkeypatch):
    seen = _run_predict(saved_model, monkeypatch, beam_prune=0)
    assert seen["prune"] is None  # exact search internally


def test_explicit_prune_passthrough(saved_model, monkeypatch):
    seen = _run_predict(saved_model, monkeypatch, beam_prune=4)
    assert seen["prune"] == 4


def test_prune_validation():
    with pytest.raises(ValueError, match="beam_prune"):
        predict("x.tsv", "clips", "a.txt", "/nonexistent",
                decoder="greedy", beam_prune=6)
    with pytest.raises(ValueError, match=">= 2"):
        predict("x.tsv", "clips", "a.txt", "/nonexistent",
                decoder="beam", beam_prune=1)
