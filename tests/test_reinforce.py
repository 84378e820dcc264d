"""REINFORCE machinery: path sampling, collapse+reward wiring, one PG step
improves the expected reward on a trivially learnable problem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sample_paths_shape_and_support():
    from pg_asr_tpu.rl.reinforce import _sample_paths

    B, T, A, S = 2, 6, 5, 3
    lp = jax.nn.log_softmax(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, A)).astype(np.float32)))
    paths = _sample_paths(jax.random.PRNGKey(0), lp, S, 1.0)
    assert paths.shape == (S, B, T)
    assert int(paths.min()) >= 0 and int(paths.max()) < A


def test_path_rewards_perfect_path():
    from pg_asr_tpu.rl.reinforce import _path_rewards

    # path that collapses exactly to the reference gets reward 0 (= -CER of 0)
    labels = np.array([[1, 2, 0, 0]], np.int32)
    label_lens = np.array([2], np.int32)
    path = np.array([[[1, 0, 2, 2, 0, 0]]], np.int32)  # collapses to [1, 2]
    mask = np.ones((1, 6), np.float32)
    R, _, hyp_lens = _path_rewards(jnp.asarray(path), jnp.asarray(mask),
                                   jnp.asarray(labels), jnp.asarray(label_lens),
                                   "neg_cer")
    assert float(R[0, 0]) == 0.0
    assert int(hyp_lens[0, 0]) == 2


def test_path_rewards_wrong_path():
    from pg_asr_tpu.rl.reinforce import _path_rewards

    labels = np.array([[1, 2, 0, 0]], np.int32)
    label_lens = np.array([2], np.int32)
    path = np.array([[[3, 3, 0, 0, 0, 0]]], np.int32)  # collapses to [3]
    mask = np.ones((1, 6), np.float32)
    R, _, _ = _path_rewards(jnp.asarray(path), jnp.asarray(mask),
                            jnp.asarray(labels), jnp.asarray(label_lens),
                            "neg_cer")
    # ED([1,2],[3]) = 2 -> reward -1.0
    assert float(R[0, 0]) == pytest.approx(-1.0)


def test_pg_step_improves_reward():
    """Direct-logit bandit: REINFORCE on our loss must push the policy toward
    the reference labels (reward = -CER)."""
    import optax
    from pg_asr_tpu.config import Config, RLConfig
    from pg_asr_tpu.rl.reinforce import _path_rewards, _sample_paths
    from pg_asr_tpu.decoding.greedy import greedy_decode
    from pg_asr_tpu.rl.reward import sequence_reward

    B, T, A, S = 2, 8, 4, 4
    labels = np.array([[1, 2, 3, 0], [3, 1, 0, 0]], np.int32)
    label_lens = np.array([3, 2], np.int32)
    mask = jnp.ones((B, T), jnp.float32)
    rl = RLConfig(num_samples=S, baseline="mean", entropy_weight=0.0,
                  ctc_mix_weight=0.0)

    logits = jnp.zeros((B, T, A))
    opt = optax.adam(0.2)
    opt_state = opt.init(logits)

    def expected_reward(lg, key):
        lp = jax.nn.log_softmax(lg)
        paths = _sample_paths(key, lp, 16, 1.0)
        R, _, _ = _path_rewards(paths, mask, jnp.asarray(labels),
                                jnp.asarray(label_lens), "neg_cer")
        return float(jnp.mean(R))

    @jax.jit
    def step(lg, s, key):
        def loss_fn(lg):
            lp = jax.nn.log_softmax(lg)
            paths = _sample_paths(key, jax.lax.stop_gradient(lp), S, 1.0)
            R, _, _ = _path_rewards(paths, mask, jnp.asarray(labels),
                                    jnp.asarray(label_lens), "neg_cer")
            base = jnp.mean(R, axis=0, keepdims=True)
            lp_path = jnp.take_along_axis(lp[None], paths[..., None], -1)[..., 0]
            seq_lp = jnp.sum(lp_path * mask[None], axis=2)
            return -jnp.mean(jax.lax.stop_gradient(R - base) * seq_lp)

        loss, g = jax.value_and_grad(loss_fn)(lg)
        up, s = opt.update(g, s)
        return optax.apply_updates(lg, up), s, loss

    key = jax.random.PRNGKey(0)
    r0 = expected_reward(logits, jax.random.PRNGKey(99))
    for i in range(150):
        key, k = jax.random.split(key)
        logits, opt_state, _ = step(logits, opt_state, k)
    r1 = expected_reward(logits, jax.random.PRNGKey(99))
    assert r1 > r0 + 0.2, (r0, r1)

    # greedy decode of the learned policy should match the references
    ids, lens = greedy_decode(jax.nn.log_softmax(logits), mask)
    R_greedy = sequence_reward(jnp.asarray(labels), jnp.asarray(label_lens),
                               ids, lens)
    assert float(jnp.mean(R_greedy)) > -0.35
