"""Policy-gradient fine-tuning for the seq2seq and transducer families:
SCST (sampled decoder continuations, greedy self-critic) and MWER over the
family's own n-best, re-scored with the family's differentiable sequence
log-likelihood. The reference's namesake concept targets exactly these
decoder posteriors (reference policy_grad.py:4-16, model.py:174-183)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig, RLConfig,
                               Seq2SeqConfig, TrainConfig, TransducerConfig)


def _seq2seq_cfg(objective="reinforce", **rl_kw):
    cfg = Config()
    return cfg.replace(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="seq2seq", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1,
                          dropout=0.0),
        # dot attention needs dec_hidden == 2 * enc hidden_size
        seq2seq=Seq2SeqConfig(vocab_size=8, embed_dim=8, dec_hidden=32),
        train=TrainConfig(num_epochs=1, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
        rl=RLConfig(objective=objective, num_samples=4, baseline="greedy",
                    ctc_mix_weight=0.0, entropy_weight=0.0, mwer_beam=4,
                    **rl_kw),
    )


def _transducer_cfg(**rl_kw):
    cfg = Config()
    return cfg.replace(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="transducer", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1,
                          dropout=0.0),
        transducer=TransducerConfig(encoder="bilstm", pred_embed_dim=8,
                                    pred_hidden=16, joint_dim=16,
                                    max_symbols_per_frame=2),
        train=TrainConfig(num_epochs=1, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
        rl=RLConfig(objective="mwer", mwer_beam=4, ctc_mix_weight=0.0,
                    entropy_weight=0.0, **rl_kw),
    )


def _toy_batch(cfg, B=3, seed=4, L=6):
    rng = np.random.default_rng(seed)
    n = 3200
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, cfg.model.vocab_size, (B, L)),
                         jnp.int32)
    label_lens = jnp.full((B,), L, jnp.int32)
    return wave, ns, labels, label_lens


def _supervised_warmup(cfg, params, batch, n_steps=25, lr=1e-2):
    """A few supervised steps so decodes have structure (a random init's
    beam collapses to runs of one token -> every hypothesis has the same
    risk and the MWER advantage is identically zero)."""
    import optax

    from pg_asr_tpu.train import compute_loss

    wave, ns, labels, label_lens = batch
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(compute_loss)(
            p, wave, ns, labels, label_lens, cfg, False)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    for _ in range(n_steps):
        params, opt_state = step(params, opt_state)
    return params


def _run_steps(cfg, n_steps, lr=1e-2, seed=0, params=None):
    import optax

    from pg_asr_tpu.rl.reinforce import pg_loss_fn
    from pg_asr_tpu.train import init_model_params

    if params is None:
        params = init_model_params(jax.random.PRNGKey(seed), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg)
    rng = jax.random.PRNGKey(1)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, k):
        (loss, metrics), grads = jax.value_and_grad(
            pg_loss_fn, has_aux=True)(p, wave, ns, labels, label_lens, k,
                                      cfg)
        updates, o = opt.update(grads, o, p)
        gnorm = optax.global_norm(grads)
        return optax.apply_updates(p, updates), o, loss, metrics, gnorm

    history = []
    for i in range(n_steps):
        rng, k = jax.random.split(rng)
        params, opt_state, loss, metrics, gnorm = step(params, opt_state, k)
        history.append((float(loss), {k_: float(v) for k_, v in
                                      metrics.items()}, float(gnorm)))
    return params, history


def test_scst_seq2seq_gradient_is_real_signal():
    cfg = _seq2seq_cfg()
    _, hist = _run_steps(cfg, 2)
    loss0, m0, gnorm0 = hist[0]
    assert np.isfinite(loss0)
    assert np.isfinite(m0["reward_mean"])
    assert gnorm0 > 1e-4, f"SCST gradient collapsed: {gnorm0}"
    assert -2.5 <= m0["reward_mean"] <= 0.0  # -CER of sampled outputs


def test_scst_seq2seq_improves_reward():
    """SCST pushes the sampled-decode reward up on a fixed toy batch."""
    cfg = _seq2seq_cfg()
    _, hist = _run_steps(cfg, 30, lr=2e-2)
    first = np.mean([h[1]["reward_mean"] for h in hist[:3]])
    last = np.mean([h[1]["reward_mean"] for h in hist[-3:]])
    assert last > first + 0.05, (first, last)


def test_mwer_seq2seq_reduces_expected_risk():
    cfg = _seq2seq_cfg(objective="mwer")
    _, hist = _run_steps(cfg, 15, lr=1e-2)
    _, m0, gnorm0 = hist[0]
    _, mN, _ = hist[-1]
    assert gnorm0 > 1e-4, f"seq2seq MWER gradient collapsed: {gnorm0}"
    assert np.isfinite(m0["expected_risk"]) and np.isfinite(mN["expected_risk"])
    assert mN["expected_risk"] < m0["expected_risk"] - 0.02, (m0, mN)
    # the ADVICE fix: the forward pg loss IS the expected risk, not zero
    assert abs(hist[0][0]) > 1e-3


def test_mwer_transducer_reduces_expected_risk():
    from pg_asr_tpu.train import init_model_params

    cfg = _transducer_cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = _supervised_warmup(cfg, params, _toy_batch(cfg), n_steps=30)
    _, hist = _run_steps(cfg, 12, lr=3e-3, params=params)
    _, m0, gnorm0 = hist[0]
    _, mN, _ = hist[-1]
    assert gnorm0 > 1e-4, f"transducer MWER gradient collapsed: {gnorm0}"
    assert np.isfinite(m0["expected_risk"]) and np.isfinite(mN["expected_risk"])
    assert mN["expected_risk"] < m0["expected_risk"] - 0.01, (m0, mN)
    assert mN["oracle_risk"] <= mN["expected_risk"] + 1e-6


def test_transducer_reinforce_objective_rejected():
    from pg_asr_tpu.rl.reinforce import pg_loss_fn

    cfg = _transducer_cfg()
    cfg = cfg.replace(rl=RLConfig(objective="reinforce"))
    wave, ns, labels, label_lens = _toy_batch(cfg)
    with pytest.raises(ValueError, match="mwer"):
        pg_loss_fn(None, wave, ns, labels, label_lens,
                   jax.random.PRNGKey(0), cfg)


def test_scst_seq2seq_shard_parity():
    """8-shard shard_map SCST loss == single-device (the per-shard sample
    rng is folded on the data axis, so compare metrics that are rng-free:
    use 0 samples' variance via identical rng per shard is NOT possible —
    instead check the loss is finite and the step runs; exact parity is
    covered by the MWER objective, which is sampling-free."""
    import optax

    from pg_asr_tpu.parallel.mesh import (make_mesh, replicate,
                                          shard_batch_arrays)
    from pg_asr_tpu.rl.reinforce import make_pg_step, pg_loss_fn
    from pg_asr_tpu.train import init_model_params

    cfg = _seq2seq_cfg(objective="mwer")
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "batch_size": 8}))
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg, B=8, seed=7)

    opt = optax.sgd(0.0)
    rng = jax.random.PRNGKey(3)
    loss_single, _ = pg_loss_fn(params, wave, ns, labels, label_lens, rng,
                                cfg)

    mesh = make_mesh((8,), ("data",))
    step = make_pg_step(cfg, opt, mesh)
    p = replicate(params, mesh)
    o = replicate(opt.init(params), mesh)
    arrays = shard_batch_arrays((wave, ns, labels, label_lens), mesh)
    _, _, _, loss_sharded, _ = step(p, o, rng, *arrays)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5, atol=1e-6)


def test_finetune_pg_seq2seq_end_to_end(tmp_path):
    """--mode finetune_pg works for the seq2seq family (driver surface)."""
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=2, min_dur=0.2, max_dur=0.3)
    model_dir = str(tmp_path / "model")
    cfg = _seq2seq_cfg()
    cfg = cfg.replace(rl=RLConfig(num_samples=2, baseline="greedy",
                                  ctc_mix_weight=0.1))
    train(corpus, model_dir, config=cfg, resume=False)
    out = finetune_pg(corpus, model_dir, num_steps=3, config=cfg)
    assert len(out["rewards"]) == 3
    assert all(np.isfinite(out["rewards"]))


def test_finetune_pg_transducer_end_to_end(tmp_path):
    """--mode finetune_pg works for the transducer family (auto-MWER)."""
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=3, min_dur=0.2, max_dur=0.3)
    model_dir = str(tmp_path / "model")
    cfg = _transducer_cfg()
    # default objective: the driver must auto-select MWER for this family
    cfg = cfg.replace(rl=RLConfig(objective="reinforce", mwer_beam=3))
    train(corpus, model_dir, config=cfg, resume=False)
    out = finetune_pg(corpus, model_dir, num_steps=3, config=cfg)
    assert len(out["rewards"]) == 3
    assert all(np.isfinite(out["rewards"]))
    assert all(-1.5 <= r <= 0.0 for r in out["rewards"])
