"""Checkpointing: best/last policy, atomic round trip, resume metadata, and
the predict-side loader (including the beam decode path on a saved model)."""

import os

import jax
import numpy as np
import pytest

from pg_asr_tpu.checkpoint import CheckpointManager, load_checkpoint, save_checkpoint


def _state(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "params": {"w": jax.random.normal(k, (3, 4)), "b": np.zeros(4, np.float32)},
        "opt_state": {"mu": np.ones((3, 4), np.float32)},
        "step": seed * 10,
        "epoch": seed,
        "best_val_loss": float("inf"),
    }


def test_roundtrip(tmp_path):
    path = str(tmp_path / "x.ckpt")
    s = _state(1)
    save_checkpoint(path, s)
    loaded = load_checkpoint(path, _state(0))
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                               np.asarray(s["params"]["w"]))
    assert loaded["step"] == 10 and loaded["epoch"] == 1


def test_best_last_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.save(_state(1), val_loss=5.0) is True      # first -> best
    assert mgr.save(_state(2), val_loss=7.0) is False     # worse -> last only
    assert mgr.save(_state(3), val_loss=3.0) is True      # better -> best
    best = load_checkpoint(mgr.best_path, _state(0))
    last = load_checkpoint(mgr.last_path, _state(0))
    assert best["epoch"] == 3 and last["epoch"] == 3
    # the epoch-2 save must not have been promoted to best
    assert mgr.best_val == 3.0


def test_tmp_cleanup_gated(tmp_path):
    """Crash-debris cleanup must not race a live writer (ADVICE r3): a
    FRESH tmp file (another host's in-flight mkstemp) survives manager
    construction; only STALE debris is removed, and read-only managers
    (cleanup_tmp=False, the predict path) delete nothing."""
    fresh = tmp_path / "tmpabc123.tmp"
    stale = tmp_path / "tmpdef456.tmp"
    fresh.write_bytes(b"live writer")
    stale.write_bytes(b"debris")
    old = os.path.getmtime(str(stale)) - 3600
    os.utime(str(stale), (old, old))

    CheckpointManager(str(tmp_path), cleanup_tmp=False)  # read-only
    assert fresh.exists() and stale.exists()

    CheckpointManager(str(tmp_path))  # the writing manager
    assert fresh.exists()          # in-flight save untouched
    assert not stale.exists()      # hour-old debris removed


def test_try_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.try_restore(_state(0)) is None
    mgr.save(_state(4), val_loss=1.0)
    mgr2 = CheckpointManager(str(tmp_path))
    restored = mgr2.try_restore(_state(0))
    assert restored is not None and restored["epoch"] == 4
    assert mgr2.best_val == 1.0


def test_predict_beam_path_from_saved_model(tmp_path):
    """Full predict() with the on-device beam decoder over a random (but
    saved/loaded) model on a synthetic corpus."""
    from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.models import bilstm_ctc
    from pg_asr_tpu.predict import predict

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    make_synthetic_corpus(corpus, n_utts=6, seed=2, min_dur=0.15, max_dur=0.3)
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=alphabet.size, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1),
    )
    model_dir = str(tmp_path / "model")
    mgr = CheckpointManager(model_dir)
    mgr.save_config(cfg.to_json())
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    mgr.save({"params": params, "opt_state": {}, "step": 0, "epoch": 1,
              "best_val_loss": 1.0}, val_loss=1.0)

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=3, decoder="beam", beam_size=4)
    assert os.path.exists(os.path.join(model_dir, "predicted.txt"))
    assert stats["num_utts"] >= 1


def test_background_save_snapshot_isolation(tmp_path):
    """A background save must snapshot the device arrays BEFORE returning:
    deleting (donating) the originals right after save() returns must not
    corrupt the written checkpoint, and in-order writes mean the last
    save wins."""
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path))
    final = None
    for i in range(5):
        x = jnp.full((16, 16), float(i))
        st = {"params": {"w": x}, "step": i, "epoch": 0,
              "best_val_loss": float("inf")}
        mgr.save(st, background=True)
        x.delete()  # simulate the train step donating the buffer
        final = i
    mgr.flush()
    got = load_checkpoint(mgr.last_path,
                          {"params": {"w": jnp.zeros((16, 16))}, "step": 0,
                           "epoch": 0, "best_val_loss": 0.0})
    assert int(got["step"]) == final
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.full((16, 16), float(final)))


def test_background_then_sync_save_ordering(tmp_path):
    """A synchronous save (epoch end) flushes pending background saves
    first, so the sync state is what lands last on disk."""
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path))
    for i in range(3):
        mgr.save({"params": {"w": jnp.full((4,), float(i))}, "step": i,
                  "epoch": 0, "best_val_loss": float("inf")},
                 background=True)
    is_best = mgr.save({"params": {"w": jnp.full((4,), 99.0)}, "step": 99,
                        "epoch": 1, "best_val_loss": float("inf")},
                       val_loss=1.0)
    assert is_best
    got = load_checkpoint(mgr.last_path,
                          {"params": {"w": jnp.zeros((4,))}, "step": 0,
                           "epoch": 0, "best_val_loss": 0.0})
    assert int(got["step"]) == 99
    best = load_checkpoint(mgr.best_path,
                           {"params": {"w": jnp.zeros((4,))}, "step": 0,
                            "epoch": 0, "best_val_loss": 0.0})
    assert int(best["step"]) == 99


def test_background_save_error_surfaces_on_flush(tmp_path, monkeypatch):
    """A failed background write must not be silently lost."""
    import pg_asr_tpu.checkpoint as ck

    mgr = ck.CheckpointManager(str(tmp_path))

    def boom(path, state):
        raise OSError("disk full")

    monkeypatch.setattr(ck, "save_checkpoint", boom)
    mgr.save({"step": 1}, background=True)
    with pytest.raises(OSError, match="disk full"):
        mgr.flush()


def test_rolling_snapshots_retention(tmp_path):
    """save_rolling keeps only the newest K model_epochNNNN.ckpt files."""
    mgr = CheckpointManager(str(tmp_path))
    for e in range(1, 6):
        mgr.save_rolling({"params": {"w": np.full((2,), float(e))}},
                         epoch=e, keep=3)
    snaps = mgr.epoch_snapshots()
    assert [os.path.basename(p) for p in snaps] == [
        "model_epoch0003.ckpt", "model_epoch0004.ckpt",
        "model_epoch0005.ckpt"]


def test_average_checkpoints_uniform_mean(tmp_path):
    from pg_asr_tpu.checkpoint import average_checkpoints

    tpl = {"params": {"w": np.zeros((3,), np.float32)}, "step": 0}
    for i, v in enumerate((1.0, 2.0, 6.0)):
        save_checkpoint(str(tmp_path / f"c{i}.ckpt"),
                        {"params": {"w": np.full((3,), v, np.float32)},
                         "step": 10 * i})
    out = average_checkpoints([str(tmp_path / f"c{i}.ckpt")
                               for i in range(3)], tpl)
    np.testing.assert_allclose(out["params"]["w"], 3.0)  # (1+2+6)/3
    assert int(out["step"]) == 20  # non-float leaves: LAST checkpoint
    assert out["params"]["w"].dtype == np.float32
    with pytest.raises(ValueError):
        average_checkpoints([], tpl)


def test_train_keep_ckpts_and_predict_avg(tmp_path):
    """--keep_ckpts retention through train() + predict --ckpt avg: the
    served params equal the uniform mean of the retained snapshots."""
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TrainConfig)
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.predict import load_model, predict
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=9, min_dur=0.2, max_dur=0.3)
    model_dir = str(tmp_path / "model")
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(num_epochs=3, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000, keep_ckpts=2),
    )
    train(corpus, model_dir, config=cfg, resume=False)
    mgr = CheckpointManager(model_dir)
    snaps = mgr.epoch_snapshots()
    assert len(snaps) == 2  # epochs 2 and 3 retained

    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    avg_params, _ = load_model(model_dir, alphabet, cfg, which="avg")
    # hand-average the two snapshots and compare one leaf tree
    from pg_asr_tpu.checkpoint import average_checkpoints
    from pg_asr_tpu.train import init_model_params

    tpl = {"params": init_model_params(jax.random.PRNGKey(0), cfg)}
    manual = average_checkpoints(snaps, tpl)["params"]
    for a, b in zip(jax.tree_util.tree_leaves(avg_params),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, which_ckpt="avg")
    assert stats["num_utts"] >= 1

    with pytest.raises(FileNotFoundError, match="keep_ckpts"):
        load_model(str(tmp_path / "empty_model"), alphabet, cfg, which="avg")
