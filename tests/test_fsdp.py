"""FSDP (ZeRO-style sharded params/optimizer, parallel/fsdp.py): the
'fsdp' mesh axis shards every divisible parameter leaf + its Adam moments
across devices while computing EXACTLY the replicated-dp step (GSPMD
inserts the all-gathers/reduce-scatters). The reference's only parallelism
replicated the model per device (reference model.py:201); FSDP is the
TPU-native layout that removes the per-chip state cap."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransformerConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.parallel.driver import ParallelPlan, parse_mesh_spec
from pg_asr_tpu.parallel.fsdp import (fsdp_leaf_spec, param_specs,
                                      shardable_fraction)
from pg_asr_tpu.parallel.mesh import make_mesh
from pg_asr_tpu.train import train


def test_fsdp_leaf_spec_picks_largest_divisible_dim():
    # largest divisible dim wins; ties go trailing-most
    assert fsdp_leaf_spec((64, 128), 4) == P(None, "fsdp")
    assert fsdp_leaf_spec((128, 64), 4) == P("fsdp", None)
    assert fsdp_leaf_spec((64, 64), 4) == P(None, "fsdp")
    # no divisible dim -> replicated
    assert fsdp_leaf_spec((3, 5), 4) == P()
    # scalars / size-1 dims -> replicated
    assert fsdp_leaf_spec((), 4) == P()
    assert fsdp_leaf_spec((1,), 4) == P()
    # axis size 1 -> replicated
    assert fsdp_leaf_spec((64,), 1) == P()


def test_shardable_fraction():
    params = {"w": np.zeros((64, 64)), "ln": np.zeros((3,))}
    frac = shardable_fraction(params, 4)
    assert frac == pytest.approx(64 * 64 / (64 * 64 + 3))
    assert shardable_fraction({"ln": np.zeros((3,))}, 4) == 0.0


def test_plan_rejects_fsdp_axis_that_shards_nothing():
    cfg = _cfg()
    # axis size 5 divides none of the layer dims (powers of two, and the
    # fused qkv dim 3*d_model)
    mesh = make_mesh((5,), ("fsdp",), devices=jax.devices()[:5])
    with pytest.raises(ValueError, match="shards NO parameter leaf"):
        ParallelPlan(cfg, mesh)


def _cfg(mesh=None, **train_kw) -> Config:
    tr = dict(num_epochs=2, batch_size=4, learning_rate=3e-3,
              warmup_steps=0, log_every=1000)
    if mesh is not None:
        shape, axes = parse_mesh_spec(mesh)
        tr["mesh_shape"] = shape
        tr["mesh_axes"] = axes
    tr.update(train_kw)
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="transformer", vocab_size=8, input_dim=16,
                          dropout=0.0),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        train=TrainConfig(**tr),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_fsdp"))
    make_synthetic_corpus(root, n_utts=10, seed=50, min_dur=0.2, max_dur=0.4)
    return root


def test_state_is_actually_sharded():
    """place_params + place_opt_state leave params AND Adam moments with
    ~1/n per-device bytes (the point of FSDP), not replicated."""
    import optax

    from pg_asr_tpu.train import init_model_params, make_optimizer

    cfg = _cfg()
    mesh = make_mesh((4,), ("fsdp",), devices=jax.devices()[:4])
    plan = ParallelPlan(cfg, mesh)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    p = plan.place_params(params)
    s = plan.place_opt_state(opt_state)

    def frac_local(tree):
        tot = loc = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            n = leaf.size
            if n <= 1:
                continue
            tot += n
            loc += leaf.addressable_shards[0].data.size
        return loc / max(tot, 1)

    # coverage diagnostic says how much CAN shard; the placed trees match:
    # per-device fraction = cov/4 (sharded) + (1 - cov) (replicated)
    cov = plan.fsdp_coverage
    assert cov > 0.8  # this transformer's big leaves are all divisible
    assert frac_local(p) == pytest.approx(cov / 4 + (1 - cov), rel=0.1)
    assert frac_local(p) < 0.5
    assert frac_local(s) < 0.5  # Adam mu/nu sharded too (the ZeRO part)


@pytest.mark.heavy
def test_train_fsdp_matches_dp(corpus, tmp_path):
    """fsdp=4 training through train() reproduces the single-device run:
    same loss curves, same final params — FSDP changes WHERE tensors
    live, never what is computed. Checkpoint is canonical (global
    shapes): predict consumes it, and it resumes on a plain dp mesh."""
    ref = train(corpus, str(tmp_path / "dp"), config=_cfg(mesh="data=1"),
                resume=False)
    got = train(corpus, str(tmp_path / "fs"), config=_cfg(mesh="fsdp=4"),
                resume=False)
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["val_losses"], ref["val_losses"],
                               rtol=1e-4)
    la = jax.tree_util.tree_leaves(ref["params"])
    lb = jax.tree_util.tree_leaves(got["params"])
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-2, atol=1e-4)

    from pg_asr_tpu.predict import predict

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    str(tmp_path / "fs"), batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1

    # cross-mesh resume: continue the fsdp-trained run on a pure-dp mesh
    out3 = train(corpus, str(tmp_path / "fs"),
                 config=_cfg(mesh="data=2", num_epochs=3))
    assert len(out3["train_losses"]) == 3
    assert np.isfinite(out3["train_losses"]).all()


@pytest.mark.heavy
def test_train_hsdp_composed(corpus, tmp_path):
    """HSDP ('data','fsdp') = (2,2): params replicated across 'data',
    sharded across 'fsdp', batch split over both — matches the pure-dp
    loss curves."""
    ref = train(corpus, str(tmp_path / "dp"), config=_cfg(mesh="data=2"),
                resume=False)
    got = train(corpus, str(tmp_path / "hs"),
                config=_cfg(mesh="data=2,fsdp=2"), resume=False)
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["val_losses"], ref["val_losses"],
                               rtol=1e-4)


def test_param_specs_tree_shape():
    params = {"a": np.zeros((8, 4)), "b": {"c": np.zeros((3,))}}
    specs = param_specs(params, 4)
    assert specs["a"] == P("fsdp", None)
    assert specs["b"]["c"] == P()
