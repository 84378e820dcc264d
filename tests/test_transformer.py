"""Transformer-CTC family: unit (shapes, subsampled lengths, padding
invariance, gradients) + end-to-end through the train/predict drivers and
the REINFORCE fine-tune step.

The family shares the CTC loss/decoders with the flagship BiLSTM model via
models.acoustic_forward; these tests pin the subsampled time-base contract
(out_mask / out_lens) that dispatch introduces.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransformerConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.models import transformer_ctc


def tiny_cfgs():
    mcfg = ModelConfig(family="transformer", vocab_size=8, input_dim=16)
    tcfg = TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                             ffn_dim=64, dropout=0.0, subsample=2)
    return mcfg, tcfg


def tiny_config() -> Config:
    mcfg, tcfg = tiny_cfgs()
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=mcfg,
        transformer=tcfg,
        train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )


def _inputs(B=3, T=21, F=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    lens = jnp.asarray([T, T - 6, 5][:B], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    return feats, mask, lens


def test_shapes_and_lengths():
    mcfg, tcfg = tiny_cfgs()
    feats, mask, lens = _inputs()
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, tcfg)
    lp, omask, olens = transformer_ctc.apply(params, feats, mask, lens,
                                             mcfg, tcfg)
    To = -(-feats.shape[1] // tcfg.subsample)
    assert lp.shape == (3, To, mcfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(olens),
                                  -(-np.asarray(lens) // tcfg.subsample))
    # log-probs normalized on valid frames, zeroed on padding
    om = np.asarray(omask)
    lpn = np.asarray(jnp.exp(lp).sum(-1))
    np.testing.assert_allclose(lpn[om > 0], 1.0, atol=1e-5)
    assert np.all(np.asarray(lp)[om == 0] == 0.0)


def test_padding_invariance():
    """Extra time padding and extra batch rows must not change valid rows'
    outputs (the attention key-mask contract)."""
    mcfg, tcfg = tiny_cfgs()
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, tcfg)
    feats, mask, lens = _inputs()
    lp, _, olens = transformer_ctc.apply(params, feats, mask, lens, mcfg, tcfg)

    pad_t = 7
    feats_p = jnp.pad(feats, ((0, 0), (0, pad_t), (0, 0)))
    # poison the padded region to prove it cannot leak through the mask
    feats_p = feats_p.at[:, feats.shape[1]:, :].set(123.0)
    mask_p = jnp.pad(mask, ((0, 0), (0, pad_t)))
    lp_p, _, olens_p = transformer_ctc.apply(params, feats_p, mask_p, lens,
                                             mcfg, tcfg)
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(olens_p))
    To = lp.shape[1]
    for b in range(3):
        n = int(olens[b])
        np.testing.assert_allclose(np.asarray(lp)[b, :n],
                                   np.asarray(lp_p)[b, :n],
                                   atol=2e-4, rtol=2e-4)


def test_gradients_finite():
    mcfg, tcfg = tiny_cfgs()
    feats, mask, lens = _inputs()
    params = transformer_ctc.init_params(jax.random.PRNGKey(0), mcfg, tcfg)

    def loss(p):
        lp, omask, _ = transformer_ctc.apply(p, feats, mask, lens, mcfg, tcfg)
        return jnp.sum(lp * omask[:, :, None])

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_train_step_overfits_fixed_batch():
    """compute_loss dispatch + optimizer: CTC loss decreases on one batch."""
    import optax

    from pg_asr_tpu.train import (compute_loss, init_model_params,
                                  make_optimizer)

    cfg = tiny_config()
    rng = np.random.default_rng(1)
    B, n = 4, 1600
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.zeros((B, 6), jnp.int32).at[:, :3].set(
        jnp.asarray(rng.integers(1, 8, (B, 3)), jnp.int32))
    label_lens = jnp.full((B,), 3, jnp.int32)

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(p, wave, ns, labels, label_lens, cfg,
                                   train=False))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_tr"))
    make_synthetic_corpus(root, n_utts=10, seed=7, min_dur=0.2, max_dur=0.4)
    return root


def test_transformer_train_predict_pg(corpus, tmp_path):
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model")
    cfg = tiny_config()
    out = train(corpus, model_dir, config=cfg, resume=False)
    assert np.isfinite(out["train_losses"]).all()
    assert out["config"].model.family == "transformer"
    assert os.path.exists(out["best_path"])

    # family + transformer hyperparams round-trip through config.json
    from pg_asr_tpu.config import Config as C
    loaded = C.from_json(open(os.path.join(model_dir, "config.json")).read())
    assert loaded.model.family == "transformer"
    assert loaded.transformer == cfg.transformer

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, decoder="greedy")
    assert stats["num_utts"] >= 1
    stats_beam = predict(os.path.join(corpus, "test.tsv"),
                         os.path.join(corpus, "clips"),
                         os.path.join(corpus, "alphabet.txt"),
                         model_dir, batch_size=4, decoder="beam", beam_size=4)
    assert stats_beam["num_utts"] >= 1

    # REINFORCE fine-tune runs on the subsampled time base
    res = finetune_pg(corpus, model_dir, num_steps=2, batch_size=4,
                      config=cfg)
    assert np.isfinite(res["rewards"]).all()
