"""Deployment export (`--mode export`, pg_asr_tpu/exporting.py): the
serialized StableHLO artifact reproduces the live serving function and
runs standalone through jax.export.deserialize."""

import json
import os

import numpy as np
import pytest

import jax

from pg_asr_tpu.checkpoint import CheckpointManager
from pg_asr_tpu.config import (Config, DecodeConfig, FeatureConfig,
                               ModelConfig, Seq2SeqConfig)
from pg_asr_tpu.data.bpe import load_tokenizer
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.exporting import (EXPORT_DIR, ExportedModel, export_model,
                                  make_serving_fn)
from pg_asr_tpu.train import init_model_params


def _make_model_dir(tmp_path, family: str):
    corpus = str(tmp_path / "corpus")
    if not os.path.exists(corpus):
        make_synthetic_corpus(corpus, n_utts=4, seed=11, min_dur=0.2,
                              max_dur=0.3)
    alphabet = load_tokenizer(corpus, "char")
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16),
        model=ModelConfig(family=family, vocab_size=alphabet.size,
                          input_dim=16, input_proj_dim=32, hidden_size=16,
                          num_layers=1, dropout=0.0),
        seq2seq=Seq2SeqConfig(vocab_size=alphabet.size, embed_dim=8,
                              dec_hidden=32),  # dot-attention: == enc 2H
        decode=DecodeConfig(max_label_len=24),
    )
    params = init_model_params(jax.random.PRNGKey(3), cfg)
    model_dir = str(tmp_path / f"model_{family}")
    mgr = CheckpointManager(model_dir)
    mgr.save_config(cfg.to_json())
    mgr.save({"params": params}, val_loss=1.0)
    return corpus, model_dir, cfg, params, alphabet


def _waves(n=2, dur=0.4, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    nsamp = int(dur * sr)
    wave = (rng.standard_normal((n, nsamp)) * 0.1).astype(np.float32)
    ns = np.full((n,), nsamp, np.int32)
    return wave, ns


@pytest.mark.parametrize("family", ["ctc", "seq2seq", "transducer"])
def test_export_roundtrip_matches_live(tmp_path, family):
    corpus, model_dir, cfg, params, alphabet = _make_model_dir(tmp_path, family)
    manifest = export_model(model_dir, corpus_path=corpus, batch_size=2,
                            max_seconds=0.5)
    assert manifest["family"] == family
    assert manifest["alphabet"][0] is not None

    exported = ExportedModel(os.path.join(model_dir, EXPORT_DIR))
    wave, ns = _waves(2, dur=0.4)
    ids, lens = exported(wave, ns)

    # live reference: the same serving fn on the padded static shape
    live_fn = make_serving_fn(params, cfg)
    buf = np.zeros((2, manifest["max_samples"]), np.float32)
    buf[:, :wave.shape[1]] = wave
    want_ids, want_lens = live_fn(buf, ns)
    np.testing.assert_array_equal(ids, np.asarray(want_ids))
    np.testing.assert_array_equal(lens, np.asarray(want_lens))

    texts = exported.decode_text(ids, lens)
    assert len(texts) == 2


def test_export_pads_partial_batches(tmp_path):
    corpus, model_dir, cfg, params, alphabet = _make_model_dir(tmp_path, "ctc")
    export_model(model_dir, corpus_path=corpus, batch_size=2, max_seconds=0.5)
    exported = ExportedModel(os.path.join(model_dir, EXPORT_DIR))

    wave, ns = _waves(2, dur=0.3)
    full_ids, full_lens = exported(wave, ns)
    one_ids, one_lens = exported(wave[:1], ns[:1])
    assert one_ids.shape[0] == 1
    np.testing.assert_array_equal(one_ids[0], full_ids[0])
    assert one_lens[0] == full_lens[0]

    with pytest.raises(ValueError, match="exported batch"):
        exported(np.zeros((3, 100), np.float32), np.full((3,), 100, np.int32))


def test_cli_export(tmp_path):
    from pg_asr_tpu import cli

    corpus, model_dir, cfg, params, alphabet = _make_model_dir(tmp_path, "ctc")
    rc = cli.main(["--mode", "export", "--corpus_path", corpus,
                   "--model_path", model_dir, "--export_batch", "2",
                   "--export_seconds", "0.5"])
    assert rc == 0
    out = os.path.join(model_dir, EXPORT_DIR)
    assert os.path.exists(os.path.join(out, "serving.jaxexport"))
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert m["batch_size"] == 2 and m["decoder"] == "greedy"
