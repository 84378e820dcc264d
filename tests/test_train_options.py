"""Training-loop options beyond the reference: lr schedules (warmup+cosine),
gradient accumulation (optax.MultiSteps), and best-checkpoint selection on
validation CER instead of loss."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.train import make_optimizer


def _tiny_train(**kw) -> TrainConfig:
    base = dict(num_epochs=2, batch_size=4, learning_rate=3e-3,
                warmup_steps=0, log_every=1000)
    base.update(kw)
    return TrainConfig(**base)


def tiny_config(**train_kw) -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=_tiny_train(**train_kw),
    )


def test_warmup_cosine_schedule_shape():
    """lr rises over warmup, then decays towards lr * lr_end_factor."""
    cfg = tiny_config(warmup_steps=10, lr_schedule="warmup_cosine",
                      decay_steps=100, learning_rate=1e-3,
                      lr_end_factor=0.01)
    import optax

    t = cfg.train
    sched = optax.warmup_cosine_decay_schedule(
        0.0, t.learning_rate, t.warmup_steps, t.decay_steps,
        t.learning_rate * t.lr_end_factor)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(55)) < 1e-3
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)
    # make_optimizer accepts the config (smoke: builds + initializes)
    opt = make_optimizer(cfg)
    opt.init({"w": jnp.zeros((2, 2))})


def test_accum_steps_updates_params_every_k():
    """With accum_steps=2, params change only on every 2nd train_step call."""
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = tiny_config(accum_steps=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt)

    rng = jax.random.PRNGKey(1)
    npr = np.random.default_rng(0)
    B, n = 4, 800
    wave = jnp.asarray(npr.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.zeros((B, 4), jnp.int32).at[:, :2].set(1)
    label_lens = jnp.full((B,), 2, jnp.int32)

    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    params, opt_state, rng, _ = step(params, opt_state, rng, wave, ns,
                                     labels, label_lens)
    # first micro-step: gradients accumulated, params unchanged
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    params, opt_state, rng, _ = step(params, opt_state, rng, wave, ns,
                                     labels, label_lens)
    # second micro-step: the optimizer update applies
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(params)))
    assert changed


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_opts"))
    make_synthetic_corpus(root, n_utts=10, seed=11, min_dur=0.2, max_dur=0.4)
    return root


def test_train_val_cer_cosine_accum_end_to_end(corpus, tmp_path):
    """All three options through train(): runs, selects on CER, derives the
    cosine horizon, checkpoints restore."""
    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model")
    cfg = tiny_config(val_metric="cer", lr_schedule="warmup_cosine",
                      warmup_steps=2, accum_steps=2)
    out = train(corpus, model_dir, config=cfg, resume=False)
    assert np.isfinite(out["train_losses"]).all()
    assert os.path.exists(out["best_path"])
    saved = json.load(open(os.path.join(model_dir, "config.json")))
    assert saved["train"]["decay_steps"] > 0  # derived from the manifest
    assert saved["train"]["val_metric"] == "cer"

    # the checkpoint (incl. MultiSteps optimizer state) restores for resume
    out2 = train(corpus, model_dir, config=cfg, resume=True)
    assert out2["steps"] >= 0


def test_ema_weights(tmp_path):
    """--ema_decay: EMA follows the params, the checkpoint stores it, and
    predict serves the averaged weights."""
    import jax
    import jax.numpy as jnp

    from pg_asr_tpu.checkpoint import load_checkpoint
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.predict import load_model
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.train import _ema_update, train

    # unit: the update rule is the exact convex mix
    ema = {"w": jnp.ones((3,))}
    p = {"w": jnp.full((3,), 2.0)}
    out = _ema_update(ema, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.1, rtol=1e-6)

    corpus = str(tmp_path / "corpus")
    model = str(tmp_path / "model")
    make_synthetic_corpus(corpus, n_utts=8, seed=21, min_dur=0.2,
                          max_dur=0.4)
    cfg = tiny_config(num_epochs=1, ema_decay=0.8)
    out = train(corpus, model, config=cfg, resume=False)

    # checkpoint holds ema_params distinct from the live params
    tpl = {"params": out["params"], "ema_params": out["params"]}
    state = load_checkpoint(out["last_path"], tpl)
    diffs = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                             jax.tree_util.tree_leaves(state["ema_params"]))]
    assert max(diffs) > 0  # decay 0.8 lags the raw params after 1 epoch

    # predict-side loader returns the EMA weights
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    served, _ = load_model(model, alphabet)
    for a, b in zip(jax.tree_util.tree_leaves(served),
                    jax.tree_util.tree_leaves(state["ema_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_enabled_mid_training_and_pg_roundtrip(tmp_path):
    """Two checkpoint-compat regressions: (1) resuming WITH --ema_decay on a
    checkpoint saved without EMA starts the average fresh instead of
    crashing; (2) finetune_pg on an EMA-trained model keeps ema_params in
    its checkpoints so predict stays loadable."""
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.predict import load_model, predict
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    model = str(tmp_path / "model")
    make_synthetic_corpus(corpus, n_utts=8, seed=22, min_dur=0.2,
                          max_dur=0.4)

    # epoch 1 without EMA, then resume with EMA enabled
    train(corpus, model, config=tiny_config(num_epochs=1), resume=False)
    out = train(corpus, model,
                config=tiny_config(num_epochs=2, ema_decay=0.7))
    assert np.isfinite(out["train_losses"]).all()

    # PG fine-tune must preserve ema_params through its checkpoint save
    finetune_pg(corpus, model, num_steps=2, batch_size=4,
                config=tiny_config(num_epochs=2, ema_decay=0.7))
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    served, cfg = load_model(model, alphabet, which="last")
    assert cfg.train.ema_decay == 0.7
    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model, batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1


def test_mid_epoch_checkpoint_resume_is_exact(tmp_path):
    """save_every_steps + interruption mid-epoch: the resumed run must
    replay the interrupted epoch's shuffled batch order from the next
    batch, ending with THE SAME params and val losses as an uninterrupted
    run (dropout=0 => fully deterministic)."""
    from pg_asr_tpu.checkpoint import load_checkpoint
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=30, min_dur=0.2,
                          max_dur=0.4)
    cfg = tiny_config(num_epochs=3, save_every_steps=1)

    # uninterrupted reference
    model_a = str(tmp_path / "a")
    out_a = train(corpus, model_a, config=cfg, resume=False)

    # interrupted during epoch 2 (2 steps/epoch), then resumed
    model_b = str(tmp_path / "b")
    train(corpus, model_b, config=cfg, resume=False, stop_after_steps=3)
    tpl = {"epoch": 0, "batches_done": 0}
    state = load_checkpoint(os.path.join(model_b, "model_last.ckpt"),
                            {"params": out_a["params"], **tpl})
    assert state["epoch"] == 2 and state["batches_done"] == 1
    out_b = train(corpus, model_b, config=cfg)  # resume

    np.testing.assert_allclose(out_a["val_losses"], out_b["val_losses"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_a["params"]),
                    jax.tree_util.tree_leaves(out_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_skip_epochs_replays_shuffle_stream():
    """BatchIterator.skip_epochs(k) must reproduce epoch k+1's exact batch
    order (the rng stream depends only on the chunk-list length)."""
    from pg_asr_tpu.data.dataset import BatchIterator, Utterance
    from pg_asr_tpu.data.text import Alphabet

    alphabet = Alphabet.from_symbols(list("ab"))
    utts = [Utterance(audio_path=f"u{i}", text="a", num_samples=100 + i)
            for i in range(10)]

    def order_of_epoch(it):
        return [tuple(int(n) for n in b.num_samples) for b in it]

    def loader(path):
        i = int(path[1:])
        return np.zeros(100 + i, np.float32), 16000

    it1 = BatchIterator(utts, alphabet, 3, seed=7, loader=loader)
    orders = [order_of_epoch(it1) for _ in range(3)]

    it2 = BatchIterator(utts, alphabet, 3, seed=7, loader=loader)
    it2.skip_epochs(2)
    np.testing.assert_equal(order_of_epoch(it2), orders[2])

    it3 = BatchIterator(utts, alphabet, 3, seed=7, loader=loader)
    it3.skip_epochs(1)
    it3.skip_batches(2)
    np.testing.assert_equal(order_of_epoch(it3), orders[1][2:])


def test_resume_after_last_batch_mid_save_skips_completed_epoch(tmp_path):
    """Interruption AFTER an epoch's last step but BEFORE its epoch-end
    bookkeeping (the validation window): resume must move to the next
    epoch, not replay a zero-batch epoch that appends train_loss 0.0 and
    (with no dev set) falsely promotes model_best at 0.0."""
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=31, min_dur=0.2,
                          max_dur=0.4)
    os.remove(os.path.join(corpus, "dev.tsv"))  # no validation: worst case
    cfg = tiny_config(num_epochs=2, save_every_steps=1)
    model = str(tmp_path / "model")
    # 6 train utts / batch 4 = 2 steps/epoch; stop right after epoch 1's
    # last step - its mid-save recorded batches_done == epoch length
    train(corpus, model, config=cfg, resume=False, stop_after_steps=2)
    out = train(corpus, model, config=cfg)  # resume
    losses = np.load(os.path.join(model, "train_loss.npy"))
    assert len(losses) == 1 and losses[0] > 0  # epoch 2 only, no 0.0 entry
    # the promoted best is epoch 2's real mean, not a bogus 0.0
    assert out["train_losses"][-1] > 0


def test_resume_with_max_steps_per_epoch_is_exact(tmp_path):
    """ADVICE r1: save_every_steps + max_steps_per_epoch. A mid-epoch resume
    must cap the epoch at max_steps_per_epoch ABSOLUTE batches (not bd +
    max_steps more), so interrupted+resumed reproduces the uninterrupted
    run and later checkpoints never record batches_done > epoch_len."""
    from pg_asr_tpu.checkpoint import load_checkpoint
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    # 8 train utts / batch 4 = 2 natural steps/epoch; cap at 2 so the cap
    # is exactly the epoch length (the advisor's divergence scenario)
    make_synthetic_corpus(corpus, n_utts=10, seed=33, min_dur=0.2,
                          max_dur=0.4)
    cfg = tiny_config(num_epochs=3, save_every_steps=1)

    model_a = str(tmp_path / "a")
    out_a = train(corpus, model_a, config=cfg, resume=False,
                  max_steps_per_epoch=2)

    # interrupt mid-epoch-2 (after its first batch), resume WITH the cap
    model_b = str(tmp_path / "b")
    train(corpus, model_b, config=cfg, resume=False, max_steps_per_epoch=2,
          stop_after_steps=3)
    out_b = train(corpus, model_b, config=cfg, max_steps_per_epoch=2)

    assert out_a["steps"] == out_b["steps"] == 6
    np.testing.assert_allclose(out_a["val_losses"], out_b["val_losses"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_a["params"]),
                    jax.tree_util.tree_leaves(out_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # the final checkpoint records a sane epoch position
    state = load_checkpoint(os.path.join(model_b, "model_last.ckpt"),
                            {"params": out_b["params"], "epoch": 0,
                             "batches_done": 0})
    assert state["batches_done"] <= 2


def test_resume_without_model_flag_keeps_family(tmp_path):
    """ADVICE r1: resuming a non-default family WITHOUT re-passing --model
    must adopt the checkpoint's architecture instead of overwriting
    config.json with family=ctc and failing restore."""
    from pg_asr_tpu.config import TransformerConfig
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=34, min_dur=0.2,
                          max_dur=0.4)
    model = str(tmp_path / "model")
    cfg = tiny_config(num_epochs=1)
    cfg = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "family": "transformer"}),
        transformer=TransformerConfig(num_layers=1, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2))
    train(corpus, model, config=cfg, resume=False)

    # resume with the DEFAULT config tree (family "ctc", default dims) —
    # as a bare CLI resume command would
    out = train(corpus, model, config=tiny_config(num_epochs=2))
    assert np.isfinite(out["train_losses"]).all()
    saved = json.load(open(os.path.join(model, "config.json")))
    assert saved["model"]["family"] == "transformer"
    assert saved["transformer"]["d_model"] == 32

    # and the model dir is still consumable by predict
    from pg_asr_tpu.predict import predict

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model, batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1


def test_predict_falls_back_when_checkpoint_has_no_ema(tmp_path):
    """ADVICE r1: a checkpoint written before EMA was enabled (no
    ema_params) must load via the raw params, not crash, when config.json
    has ema_decay > 0."""
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.predict import load_model
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=35, min_dur=0.2,
                          max_dur=0.4)
    model = str(tmp_path / "model")
    train(corpus, model, config=tiny_config(num_epochs=1), resume=False)

    # simulate the resume that enabled EMA: config says ema_decay > 0 but
    # the (best) checkpoint predates it
    cfg_path = os.path.join(model, "config.json")
    raw = json.load(open(cfg_path))
    raw["train"]["ema_decay"] = 0.7
    json.dump(raw, open(cfg_path, "w"))

    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    served, cfg = load_model(model, alphabet)  # must not raise
    assert cfg.train.ema_decay == 0.7
    assert any(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(served))
