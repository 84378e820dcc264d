"""Torch-checkpoint import (models/torch_import.py): forward parity between
the reference's torch modules and our params after import — the migration
path for reference users' `model_best.pth` (reference model.py:270-288)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.models import bilstm_ctc
from pg_asr_tpu.models.torch_import import (init_from_torch_checkpoint,
                                            load_torch_state_dict)


class _RefEncoder(torch.nn.Module):
    """Reference Encoder interface (reference model.py:34-56): InstanceNorm2d
    over the whole (F, T) plane, Linear(120->512) + leaky_relu, 3-layer
    bidirectional LSTM(512->256/dir) over packed sequences."""

    def __init__(self, in_dim=120, proj=512, hidden=256, layers=3):
        super().__init__()
        self.inst_norm = torch.nn.InstanceNorm2d(in_dim)
        self.input_layer = torch.nn.Linear(in_dim, proj)
        self.blstm = torch.nn.LSTM(input_size=proj, hidden_size=hidden,
                                   num_layers=layers, bidirectional=True,
                                   batch_first=True)

    def forward(self, x, lengths):  # x: (B, F, T)
        x = self.inst_norm(x.unsqueeze(1))
        x = torch.transpose(x.squeeze(1), 1, 2)  # (B, T, F)
        x = torch.nn.functional.leaky_relu(self.input_layer(x))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, lengths, enforce_sorted=False, batch_first=True)
        out, _ = self.blstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, total_length=x.shape[1], batch_first=True)
        return out


class _RefDecoder(torch.nn.Module):
    def __init__(self, alphabet_size, hidden=512):
        super().__init__()
        self.embed_layer = torch.nn.Embedding(alphabet_size, 128)
        self.lstm = torch.nn.LSTM(input_size=128, hidden_size=hidden,
                                  num_layers=1, batch_first=True)


class _RefSeq2Seq(torch.nn.Module):
    def __init__(self, alphabet_size):
        super().__init__()
        self.encoder = _RefEncoder()
        self.decoder = _RefDecoder(alphabet_size)


def _ctc_cfg(vocab=7):
    return Config(
        features=FeatureConfig(kind="mfcc"),
        model=ModelConfig(family="ctc", vocab_size=vocab, input_dim=120,
                          input_proj_dim=512, hidden_size=256, num_layers=3,
                          dropout=0.0),
    )


def _save_sd(module, path, prefix=""):
    sd = module.state_dict()
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    torch.save(sd, path)


def test_encoder_forward_parity(tmp_path):
    """Full-length batch: reference torch encoder forward == our encode()
    after import (the InstanceNorm is padding-free at full lengths, where
    the two norms agree by construction)."""
    torch.manual_seed(0)
    ref = _RefSeq2Seq(alphabet_size=7).eval()
    path = str(tmp_path / "model_best.pth")
    _save_sd(ref, path)

    cfg = _ctc_cfg()
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    params, report = init_from_torch_checkpoint(path, params, cfg)
    assert "ctc_head" in report  # stays fresh, and the report says so

    B, T, F = 3, 17, 120
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((B, T, F)).astype(np.float32)
    with torch.no_grad():
        want = ref.encoder(torch.from_numpy(np.swapaxes(feats, 1, 2)),
                           torch.full((B,), T)).numpy()
    got = np.asarray(bilstm_ctc.encode(
        params, jnp.asarray(feats), jnp.ones((B, T), np.float32),
        cfg.model, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_lstm_stack_ragged_parity(tmp_path):
    """Ragged lengths through the imported 3-layer BiLSTM stack alone
    (packed sequences vs our mask discipline), bypassing the norm — the
    reference norms over padding, ours is mask-aware by design."""
    torch.manual_seed(1)
    ref = _RefSeq2Seq(alphabet_size=7).eval()
    path = str(tmp_path / "model_best.pth")
    _save_sd(ref, path)
    cfg = _ctc_cfg()
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    params, _ = init_from_torch_checkpoint(path, params, cfg)

    B, T, H = 3, 13, 512
    lengths = [13, 6, 9]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    for b, n in enumerate(lengths):
        x[b, n:] = 0.0
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.tensor(lengths),
            enforce_sorted=False, batch_first=True)
        out, _ = ref.encoder.blstm(packed)
        want, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, total_length=T, batch_first=True)
        want = want.numpy()

    from pg_asr_tpu.ops.lstm import bilstm_layer

    mask = (np.arange(T)[None, :] < np.array(lengths)[:, None]).astype(np.float32)
    got = jnp.asarray(x)
    for layer in params["lstm"]:
        got = bilstm_layer(layer, got, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_seq2seq_decoder_import_parity(tmp_path):
    """Imported embedding + decoder LSTM reproduce the torch decoder's
    hidden-state sequence."""
    torch.manual_seed(2)
    A = 9
    ref = _RefSeq2Seq(alphabet_size=A).eval()
    path = str(tmp_path / "model_best.pth")
    _save_sd(ref, path)

    from pg_asr_tpu.config import Seq2SeqConfig
    from pg_asr_tpu.models import seq2seq

    cfg = Config(
        features=FeatureConfig(kind="mfcc"),
        model=ModelConfig(family="seq2seq", vocab_size=A, input_dim=120,
                          input_proj_dim=512, hidden_size=256, num_layers=3,
                          dropout=0.0),
    )
    dec_cfg = Seq2SeqConfig(vocab_size=A, embed_dim=128, dec_hidden=512)
    cfg = cfg.replace(seq2seq=dec_cfg)
    params = seq2seq.init_params(jax.random.PRNGKey(0), cfg.model, dec_cfg)
    params, report = init_from_torch_checkpoint(path, params, cfg)
    assert "output" in report  # no torch source for the projection

    B, Td = 2, 11
    rng = np.random.default_rng(3)
    ids = rng.integers(0, A, (B, Td))
    with torch.no_grad():
        emb = ref.decoder.embed_layer(torch.from_numpy(ids))
        want, _ = ref.decoder.lstm(emb)
        want = want.numpy()

    from pg_asr_tpu.ops.lstm import lstm_scan

    x = params["embed"][jnp.asarray(ids)]
    xp = jnp.einsum("bti,ih->bth", x, params["dec_lstm"]["W"]) + params["dec_lstm"]["b"]
    got = lstm_scan(xp, params["dec_lstm"]["U"],
                    jnp.ones((B, Td), jnp.float32), dec_cfg.dec_hidden)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_dataparallel_prefix_and_pickled_module(tmp_path):
    """`module.`-prefixed state dicts (saved from the reference's
    nn.DataParallel wrapper) and whole pickled modules both load."""
    torch.manual_seed(3)
    ref = _RefSeq2Seq(alphabet_size=7)
    p1 = str(tmp_path / "dp.pth")
    _save_sd(ref, p1, prefix="module.")
    sd1 = load_torch_state_dict(p1)
    assert "encoder.input_layer.weight" in sd1

    p2 = str(tmp_path / "module.pth")
    torch.save(ref, p2)
    # pickled modules are rejected by default (weights_only safety) ...
    import pytest
    with pytest.raises(ValueError, match="trust_torch_pickle"):
        load_torch_state_dict(p2)
    # ... and load only behind the explicit opt-in
    sd2 = load_torch_state_dict(p2, allow_pickle=True)
    assert set(sd1) == set(sd2)
    np.testing.assert_array_equal(sd1["encoder.input_layer.weight"],
                                  sd2["encoder.input_layer.weight"])


def test_refusals_and_shape_hint(tmp_path):
    torch.manual_seed(4)
    ref = _RefSeq2Seq(alphabet_size=7)
    path = str(tmp_path / "model_best.pth")
    _save_sd(ref, path)

    cfg = _ctc_cfg().replace(model=ModelConfig(family="transformer",
                                               vocab_size=7, input_dim=120))
    with pytest.raises(ValueError, match="no reference torch counterpart"):
        init_from_torch_checkpoint(path, {}, cfg)

    # logmel-80 model vs the reference's 120-dim input -> actionable hint
    cfg80 = Config(model=ModelConfig(family="ctc", vocab_size=7, input_dim=80,
                                     input_proj_dim=512, hidden_size=256,
                                     num_layers=3))
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg80.model)
    with pytest.raises(ValueError, match="mfcc"):
        init_from_torch_checkpoint(path, params, cfg80)


def test_cli_train_warm_start(tmp_path):
    """End-to-end: --init_from_torch through the real CLI on a synthetic
    corpus; the run trains and records the import in stdout via train()."""
    from pg_asr_tpu import cli
    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=6, seed=5, min_dur=0.2, max_dur=0.3)
    from pg_asr_tpu.data.bpe import load_tokenizer

    vocab = load_tokenizer(corpus, "char").size

    torch.manual_seed(5)
    ref = _RefSeq2Seq(alphabet_size=vocab)
    pth = str(tmp_path / "model_best.pth")
    _save_sd(ref, pth, prefix="module.")

    model_dir = str(tmp_path / "model")
    rc = cli.main([
        "--mode", "train", "--corpus_path", corpus, "--model_path", model_dir,
        "--num_epochs", "1", "--batch_size", "3", "--features", "mfcc",
        "--init_from_torch", pth,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(model_dir, "model_last.ckpt"))
    saved = Config.from_json(
        open(os.path.join(model_dir, "config.json")).read())
    assert saved.train.init_from_torch == pth
