"""MWER discriminative fine-tuning (rl.objective="mwer"): the on-device
K-best list (decoding/beam.beam_decode_nbest) and the expected-CER loss
over it."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig, RLConfig,
                               TrainConfig)
from pg_asr_tpu.decoding.beam import beam_decode, beam_decode_nbest


def _rand_log_probs(rng, B, T, A):
    x = rng.standard_normal((B, T, A)).astype(np.float32) * 2.0
    return jnp.asarray(jax.nn.log_softmax(jnp.asarray(x), axis=-1))


def test_nbest_slot0_matches_beam_decode():
    rng = np.random.default_rng(0)
    B, T, A, K = 5, 12, 6, 4
    lp = _rand_log_probs(rng, B, T, A)
    lens = jnp.asarray([12, 7, 9, 12, 3], jnp.int32)
    l1, n1, s1 = beam_decode(lp, lens, beam_size=K, max_label_len=10)
    lk, nk, sk = beam_decode_nbest(lp, lens, beam_size=K, max_label_len=10)
    np.testing.assert_array_equal(np.asarray(lk[:, 0]), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(nk[:, 0]), np.asarray(n1))
    np.testing.assert_allclose(np.asarray(sk[:, 0]), np.asarray(s1),
                               rtol=1e-6)


def test_nbest_sorted_distinct_live():
    rng = np.random.default_rng(1)
    B, T, A, K = 3, 15, 5, 6
    lp = _rand_log_probs(rng, B, T, A)
    lens = jnp.full((B,), T, jnp.int32)
    labels, hlens, nll = beam_decode_nbest(lp, lens, beam_size=K,
                                           max_label_len=12)
    nll = np.asarray(nll)
    labels = np.asarray(labels)
    hlens = np.asarray(hlens)
    for b in range(B):
        live = nll[b] < 1e29
        assert np.all(np.diff(nll[b][live]) >= -1e-5)  # ascending
        seqs = {tuple(labels[b, k, :hlens[b, k]]) for k in range(K) if live[k]}
        assert len(seqs) == int(live.sum())  # distinct label sequences


def test_nbest_unpruned_matches_exhaustive_enumeration():
    """K >= #distinct sequences: the n-best scores equal the true collapsed
    posteriors from brute-force path enumeration (tiny T=3, A=3 grid)."""
    rng = np.random.default_rng(2)
    T, A, K = 3, 3, 16
    lp = _rand_log_probs(rng, 1, T, A)[0]  # (T, A)
    probs = np.exp(np.asarray(lp))

    def collapse(path):
        out = []
        prev = -1
        for s in path:
            if s != prev and s != 0:
                out.append(s)
            prev = s
        return tuple(out)

    truth = {}
    for p0 in range(A):
        for p1 in range(A):
            for p2 in range(A):
                seq = collapse((p0, p1, p2))
                truth[seq] = truth.get(seq, 0.0) + (
                    probs[0, p0] * probs[1, p1] * probs[2, p2])
    want = sorted(truth.items(), key=lambda kv: -kv[1])

    labels, hlens, nll = beam_decode_nbest(lp[None], jnp.asarray([T]),
                                           beam_size=K, max_label_len=4)
    labels, hlens, nll = (np.asarray(labels)[0], np.asarray(hlens)[0],
                          np.asarray(nll)[0])
    live = nll < 1e29
    assert int(live.sum()) == len(truth)
    for k in range(len(truth)):
        seq = tuple(labels[k, :hlens[k]])
        assert seq == want[k][0] or abs(np.exp(-nll[k]) - want[k][1]) < 1e-9
        np.testing.assert_allclose(np.exp(-nll[k]), dict(want)[seq],
                                   rtol=1e-5)


def _mwer_cfg():
    cfg = Config()
    return cfg.replace(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(num_epochs=1, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
        rl=RLConfig(objective="mwer", mwer_beam=4, ctc_mix_weight=0.0,
                    entropy_weight=0.0),
    )


def _toy_batch(cfg, B=3, seed=4):
    rng = np.random.default_rng(seed)
    n = 3200
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.full((B,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, cfg.model.vocab_size, (B, 6)),
                         jnp.int32)
    label_lens = jnp.full((B,), 6, jnp.int32)
    return wave, ns, labels, label_lens


def test_mwer_step_reduces_expected_risk():
    """Pure-MWER gradient steps reduce the n-best expected CER."""
    import optax

    from pg_asr_tpu.rl.reinforce import pg_loss_fn
    from pg_asr_tpu.train import init_model_params

    cfg = _mwer_cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg)
    rng = jax.random.PRNGKey(1)

    opt = optax.sgd(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o):
        (loss, metrics), grads = jax.value_and_grad(
            pg_loss_fn, has_aux=True)(p, wave, ns, labels, label_lens,
                                      rng, cfg)
        updates, o = opt.update(grads, o, p)
        gnorm = optax.global_norm(grads)
        return optax.apply_updates(p, updates), o, metrics, gnorm

    _, _, m0, gnorm0 = step(params, opt_state)
    # regression guard for the identically-zero-gradient form (a
    # differentiable baseline makes sum w_k (cer_k - cer_bar) == 0): the
    # pure-MWER gradient must be a real training signal, not float noise
    assert float(gnorm0) > 1e-3, f"MWER gradient collapsed: {float(gnorm0)}"
    before = float(m0["expected_risk"])
    for _ in range(12):
        params, opt_state, m, _ = step(params, opt_state)
    after = float(m["expected_risk"])
    assert np.isfinite(before) and np.isfinite(after)
    # demand a MEANINGFUL drop (numerical drift of a no-op objective is
    # orders of magnitude below this)
    assert after < before - 0.02, (before, after)
    assert float(m["oracle_risk"]) <= after + 1e-6


def test_mwer_shard_parity():
    """8-shard shard_map MWER loss == single-device (exact num/den psum)."""
    from pg_asr_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays
    from pg_asr_tpu.rl.reinforce import make_pg_step, pg_loss_fn
    from pg_asr_tpu.train import init_model_params, make_optimizer

    cfg = _mwer_cfg()
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "batch_size": 8}))
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg, B=8, seed=7)

    import optax

    opt = optax.sgd(0.0)  # loss comparison only
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


def test_finetune_pg_mwer_end_to_end(tmp_path):
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.rl.reinforce import finetune_pg
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=8, seed=2, min_dur=0.2, max_dur=0.35)
    model_dir = str(tmp_path / "model")
    cfg = _mwer_cfg()
    train(corpus, model_dir, config=cfg, resume=False)
    # >= 5 steps: the jit executable-cache bug this driver works around
    # (committed 1-device-mesh inputs + the MWER graph) only fired on the
    # THIRD pg_step call — a shorter run cannot regress it
    out = finetune_pg(corpus, model_dir, num_steps=5, config=cfg)
    assert len(out["rewards"]) == 5
    assert all(np.isfinite(out["rewards"]))
    assert all(-1.5 <= r <= 0.0 for r in out["rewards"])  # -expected_risk


def test_mwer_grads_finite_with_ragged_padding_rows():
    """A zero-frame padding row (SPMD ragged batches) must not poison the
    backward pass through the n-best softmax (double-where regression)."""
    from pg_asr_tpu.rl.reinforce import pg_loss_fn
    from pg_asr_tpu.train import init_model_params

    cfg = _mwer_cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg, B=3)
    ns = ns.at[1].set(0)  # padding row: no frames
    labels = labels.at[1].set(0)
    label_lens = label_lens.at[1].set(0)
    (loss, _), grads = jax.value_and_grad(pg_loss_fn, has_aux=True)(
        params, wave, ns, labels, label_lens, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_unknown_objective_rejected():
    from pg_asr_tpu.rl.reinforce import pg_loss_fn
    from pg_asr_tpu.train import init_model_params

    cfg = _mwer_cfg()
    cfg = cfg.replace(rl=cfg.rl.__class__(
        **{**cfg.rl.__dict__, "objective": "ppo"}))
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    wave, ns, labels, label_lens = _toy_batch(cfg)
    with pytest.raises(ValueError, match="unknown rl.objective"):
        pg_loss_fn(params, wave, ns, labels, label_lens,
                   jax.random.PRNGKey(0), cfg)


def test_decoding_modules_import_safely_under_trace():
    """Regression: decoding/beam.py (and friends) are lazily imported from
    INSIDE traced functions (_mwer_terms). A module-level `jnp.int32(...)`
    constant created during that first-import-under-trace binds a leaked
    tracer that every later trace captures as a phantom lowering input
    ("Computation compiled for N+1 inputs but called with N"). Force a
    fresh import under an active trace and assert the resulting jaxprs
    carry no captured consts."""
    import importlib
    import sys

    names = ["pg_asr_tpu.decoding.beam", "pg_asr_tpu.decoding.transducer",
             "pg_asr_tpu.ops.edit_distance"]
    saved = {n: sys.modules.pop(n) for n in names if n in sys.modules}
    try:
        def traced(lp, lens):
            from pg_asr_tpu.decoding.beam import beam_decode_nbest

            _, _, nll = beam_decode_nbest(lp, lens, beam_size=3,
                                          max_label_len=5)
            return jnp.sum(nll)

        lp1 = jnp.zeros((2, 6, 4), jnp.float32)
        lens1 = jnp.full((2,), 6, jnp.int32)
        j1 = jax.make_jaxpr(traced)(lp1, lens1)
        lp2 = jnp.zeros((2, 9, 4), jnp.float32)  # second shape: re-trace
        j2 = jax.make_jaxpr(traced)(lp2, lens1)
        assert not j1.consts, j1.consts
        assert not j2.consts, j2.consts

        import pg_asr_tpu.decoding.beam as beam_mod

        assert isinstance(beam_mod._HASH_M, int)  # plain int, never traced
    finally:
        sys.modules.update(saved)
        for n in names:  # re-import cleanly for later tests
            importlib.import_module(n)
