"""SPMD data parallelism on the 8-virtual-device CPU mesh: the sharded train
step must produce the same loss/params as the single-device step (SURVEY.md
§4 'distributed without a cluster')."""

import jax
import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.models import bilstm_ctc
from pg_asr_tpu.parallel.mesh import (make_mesh, pad_batch_to_multiple,
                                      replicate, shard_batch_arrays,
                                      shard_params)
from pg_asr_tpu.train import make_optimizer, make_train_step


def tiny_cfg():
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(batch_size=8, warmup_steps=0, learning_rate=1e-3),
    )


def _data(B=8):
    rng = np.random.default_rng(0)
    n = 3200
    wave = (rng.standard_normal((B, n)) * 0.1).astype(np.float32)
    ns = np.full((B,), n, np.int32)
    labels = rng.integers(1, 8, (B, 6)).astype(np.int32)
    label_lens = np.full((B,), 6, np.int32)
    return wave, ns, labels, label_lens


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _run_steps(mesh, cfg, n_steps=2, tp=False):
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    if tp:
        params = shard_params(params, mesh)
        opt_state = replicate(opt_state, mesh)
    else:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
    step = make_train_step(cfg, opt)
    arrays = shard_batch_arrays(_data(), mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(n_steps):
        params, opt_state, rng, loss = step(params, opt_state, rng, *arrays)
        losses.append(float(loss))
    return losses, jax.device_get(params)


def test_data_parallel_matches_single_device():
    cfg = tiny_cfg()
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    losses1, params1 = _run_steps(mesh1, cfg)
    losses8, params8 = _run_steps(mesh8, cfg)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_data_plus_model_parallel_runs():
    cfg = tiny_cfg()
    mesh = make_mesh((4, 2), ("data", "model"))
    losses, _ = _run_steps(mesh, cfg, n_steps=1, tp=True)
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    losses1, _ = _run_steps(mesh1, cfg, n_steps=1)
    np.testing.assert_allclose(losses, losses1, rtol=1e-4)


def test_pad_batch_to_multiple():
    a = np.arange(6).reshape(3, 2)
    (out,) = pad_batch_to_multiple((a,), 4)
    assert out.shape == (4, 2)
    np.testing.assert_array_equal(out[3], np.zeros(2, a.dtype))
    (same,) = pad_batch_to_multiple((a,), 3)
    assert same.shape == (3, 2)


def test_ragged_batch_loss_matches_unpadded():
    """A batch padded with zero rows to fill the mesh must give the SAME
    loss as the unpadded batch on one device (padding rows excluded from
    the loss, not duplicated into it)."""
    from pg_asr_tpu.train import make_eval_step
    from pg_asr_tpu.models import bilstm_ctc

    cfg = tiny_cfg()
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)

    wave, ns, labels, label_lens = _data(B=5)  # ragged for an 8-way mesh
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))

    loss1 = float(make_eval_step(cfg, mesh1)(
        replicate(params, mesh1),
        *shard_batch_arrays((wave, ns, labels, label_lens), mesh1)))
    loss8 = float(make_eval_step(cfg, mesh8)(
        replicate(params, mesh8),
        *shard_batch_arrays((wave, ns, labels, label_lens), mesh8)))
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)


def test_shard_map_data_parallel_matches_single_device():
    """The shard_map step (the real multi-chip TPU path; scan fallback on
    CPU) must reproduce the single-device pjit step bit-for-bit at dropout=0."""
    cfg = tiny_cfg()
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))

    losses1, params1 = _run_steps(mesh1, cfg)

    from pg_asr_tpu.train import make_train_step
    from pg_asr_tpu.models import bilstm_ctc
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params = replicate(params, mesh8)
    opt_state = replicate(opt_state, mesh8)
    step = make_train_step(cfg, opt, mesh8)
    arrays = shard_batch_arrays(_data(), mesh8)
    rng = jax.random.PRNGKey(1)
    losses8 = []
    for _ in range(2):
        params, opt_state, rng, loss = step(params, opt_state, rng, *arrays)
        losses8.append(float(loss))

    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(jax.device_get(params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pg_step_shard_map_runs():
    """The REINFORCE step takes the shard_map path on data-parallel meshes
    and produces finite loss/metrics with ragged zero-padded rows."""
    import optax
    from pg_asr_tpu.models import bilstm_ctc
    from pg_asr_tpu.rl.reinforce import make_pg_step

    cfg = tiny_cfg()
    mesh8 = make_mesh((8,), ("data",))
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    params = replicate(params, mesh8)
    opt_state = replicate(opt_state, mesh8)
    step = make_pg_step(cfg, opt, mesh8)
    arrays = shard_batch_arrays(_data(B=5), mesh8)  # ragged -> 3 zero rows
    params, opt_state, rng, loss, metrics = step(
        params, opt_state, jax.random.PRNGKey(2), *arrays)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["entropy"]))


def test_transformer_shard_map_matches_single_device():
    """Transformer-CTC family through the shard_map dp step: same loss and
    params as the single-device pjit step (subsampled time base must thread
    identically through the num/den psum reduction)."""
    from pg_asr_tpu.config import TransformerConfig
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = tiny_cfg()
    cfg = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "family": "transformer"}),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2))

    import optax

    def run(mesh):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        # SGD, not Adam: attention-bias grads are ~0 and Adam's m/sqrt(v)
        # amplifies float summation-order noise between 1- and 8-way sums
        # into visible param deltas; SGD is linear in the (psum'd) grads
        opt = optax.sgd(1e-2)
        opt_state = opt.init(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = make_train_step(cfg, opt, mesh)
        arrays = shard_batch_arrays(_data(), mesh)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(2):
            params, opt_state, rng, loss = step(params, opt_state, rng,
                                                *arrays)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    losses1, params1 = run(mesh1)
    losses8, params8 = run(mesh8)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_conformer_shard_map_matches_single_device():
    """Conformer-CTC family through the shard_map dp step: same loss and
    params as the single-device pjit step (the depthwise conv and rotary
    attention must be shard-local — no cross-shard state)."""
    from pg_asr_tpu.config import ConformerConfig
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = tiny_cfg()
    cfg = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "family": "conformer"}),
        conformer=ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                                  ffn_dim=64, conv_kernel=7, dropout=0.0,
                                  subsample=2))

    import optax

    def run(mesh):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        opt = optax.sgd(1e-2)  # same rationale as the transformer test
        opt_state = opt.init(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = make_train_step(cfg, opt, mesh)
        arrays = shard_batch_arrays(_data(), mesh)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(2):
            params, opt_state, rng, loss = step(params, opt_state, rng,
                                                *arrays)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    losses1, params1 = run(mesh1)
    losses8, params8 = run(mesh8)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_transducer_shard_map_matches_single_device():
    """Transducer family through the shard_map dp step: same loss and params
    as the single-device pjit step (the lattice loss's num/den terms must
    psum-reduce exactly like the CTC families')."""
    from pg_asr_tpu.config import TransducerConfig, TransformerConfig
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = tiny_cfg()
    cfg = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__,
                                     "family": "transducer"}),
        transformer=TransformerConfig(num_layers=1, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        transducer=TransducerConfig(encoder="transformer", pred_embed_dim=16,
                                    pred_hidden=16, joint_dim=24))

    import optax

    def run(mesh):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        opt = optax.sgd(1e-2)  # same rationale as the transformer test
        opt_state = opt.init(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = make_train_step(cfg, opt, mesh)
        arrays = shard_batch_arrays(_data(), mesh)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(2):
            params, opt_state, rng, loss = step(params, opt_state, rng,
                                                *arrays)
            losses.append(float(loss))
        return losses, jax.device_get(params)

    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    losses1, params1 = run(mesh1)
    losses8, params8 = run(mesh8)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params1),
                    jax.tree_util.tree_leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("family", ["transformer", "conformer", "transducer"])
def test_tensor_parallel_families_match_single_device(family):
    """Megatron-style (data, model) pjit sharding for the attention families
    (qkv/ffn_in column-sharded, attn_out/ffn_out row-sharded, conv channels
    sharded): one step must reproduce the single-device loss."""
    from pg_asr_tpu.config import (ConformerConfig, TransducerConfig,
                                   TransformerConfig)
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = tiny_cfg()
    cfg = cfg.replace(
        model=cfg.model.__class__(**{**cfg.model.__dict__, "family": family,
                                     "input_proj_dim": 32}),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        conformer=ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                                  ffn_dim=64, conv_kernel=7, dropout=0.0,
                                  subsample=2),
        transducer=TransducerConfig(encoder="transformer", pred_embed_dim=16,
                                    pred_hidden=16, joint_dim=24))

    def run(mesh, tp):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        if tp:
            params = shard_params(params, mesh)
        else:
            params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = make_train_step(cfg, opt)
        arrays = shard_batch_arrays(_data(), mesh)
        _, _, _, loss = step(params, opt_state, jax.random.PRNGKey(1),
                             *arrays)
        return float(loss)

    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh = make_mesh((4, 2), ("data", "model"))
    np.testing.assert_allclose(run(mesh, tp=True), run(mesh1, tp=False),
                               rtol=1e-4)
