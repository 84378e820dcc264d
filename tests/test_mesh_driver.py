"""Drivable parallelism (parallel/driver.py): `--mesh data=2,pipe=2`-style
specs route train() through the pipeline/sequence/expert strategy
libraries, composed meshes reproduce the pure-dp run's losses, and the
checkpoints they write stay family-canonical (predict/resume work on any
mesh). VERDICT r1 #1."""

import json
import os

import jax
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransformerConfig)
from pg_asr_tpu.data.dataset import make_synthetic_corpus
from pg_asr_tpu.parallel.driver import (ParallelPlan, map_params_subtrees,
                                        parse_mesh_spec)
from pg_asr_tpu.parallel.mesh import make_mesh
from pg_asr_tpu.train import train


def test_parse_mesh_spec():
    assert parse_mesh_spec("data=8") == ((8,), ("data",))
    assert parse_mesh_spec("data=2,pipe=2") == ((2, 2), ("data", "pipe"))
    assert parse_mesh_spec(" data=2 , expert=4 ") == ((2, 4),
                                                     ("data", "expert"))
    for bad in ("bogus=2", "data=0", "data=x", "", "data=2,data=4"):
        with pytest.raises(ValueError):
            parse_mesh_spec(bad)


def test_map_params_subtrees_converts_opt_state():
    """Adam mu/nu (params-shaped subtrees) get converted; counts don't."""
    import optax

    params = {"a": {"w": np.ones((2,)), "b": np.ones(())},
              "blocks": [{"w": np.ones((3,))}]}
    opt = optax.adamw(1e-3)
    state = opt.init(jax.tree_util.tree_map(np.asarray, params))
    tdef = jax.tree_util.tree_structure(params)

    def tag(tree):
        return jax.tree_util.tree_map(lambda x: x + 100.0, tree)

    out = map_params_subtrees(tag, tdef, state)
    # mu/nu leaves shifted by 100, count untouched
    leaves_in = jax.tree_util.tree_leaves(state)
    leaves_out = jax.tree_util.tree_leaves(out)
    assert len(leaves_in) == len(leaves_out)
    mu = out[0].mu if hasattr(out[0], "mu") else None
    assert mu is not None and float(mu["a"]["w"][0]) == 100.0
    assert int(out[0].count) == 0


def test_plan_validation():
    cfg = _cfg()
    devices = jax.devices()[:4]
    mesh = make_mesh((2, 2), ("pipe", "seq"), devices=devices)
    with pytest.raises(ValueError, match="composes"):
        ParallelPlan(cfg, mesh)
    # pipe on a non-transformer family
    mesh = make_mesh((2, 2), ("data", "pipe"), devices=devices)
    bad = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "family": "ctc"}))
    with pytest.raises(ValueError, match="transformer"):
        ParallelPlan(bad, mesh)
    # layers not divisible into stages
    bad = cfg.replace(transformer=cfg.transformer.__class__(
        **{**cfg.transformer.__dict__, "num_layers": 3}))
    with pytest.raises(ValueError, match="divisible"):
        ParallelPlan(bad, mesh)
    # expert axis without a MoE model
    mesh = make_mesh((2, 2), ("data", "expert"), devices=devices)
    with pytest.raises(ValueError, match="expert"):
        ParallelPlan(cfg, mesh)


def _cfg(mesh=None, num_experts=0, **train_kw) -> Config:
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
                                      ffn_dim=64, dropout=0.0, subsample=2,
                                      num_experts=num_experts,
                                      capacity_factor=8.0),
        train=TrainConfig(**tr),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_mesh"))
    make_synthetic_corpus(root, n_utts=10, seed=50, min_dur=0.2, max_dur=0.4)
    return root


def _train_losses(corpus, model_dir, cfg):
    out = train(corpus, model_dir, config=cfg, resume=False)
    return out


def _assert_params_close(a, b, rtol=2e-2, atol=1e-4):
    """Integration-level closeness: gradient-level exactness per strategy
    is covered by tests/test_pipeline.py etc.; across several Adam steps
    the f32 reduction-order noise is amplified by 1/sqrt(v) early in
    training, so end-of-training params carry ~1% drift."""
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_train_dp_pipe_composed_matches_dp(corpus, tmp_path):
    """('data','pipe') = (2,2) training through train() reproduces the
    pure-dp run: same loss curves, same final params (canonical layout),
    and the checkpoint is consumable by predict + resumable on a pure-dp
    mesh."""
    ref = _train_losses(corpus, str(tmp_path / "dp"), _cfg(mesh="data=2"))
    got = _train_losses(corpus, str(tmp_path / "pp"),
                        _cfg(mesh="data=2,pipe=2"))
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["val_losses"], ref["val_losses"],
                               rtol=1e-4)
    _assert_params_close(got["params"], ref["params"])

    # the checkpoint is canonical: predict consumes it directly
    from pg_asr_tpu.predict import predict

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    str(tmp_path / "pp"), batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1

    # cross-mesh resume: continue the pipe-trained run on a pure-dp mesh
    out3 = train(corpus, str(tmp_path / "pp"),
                 config=_cfg(mesh="data=2", num_epochs=3))
    assert len(out3["train_losses"]) == 3 and np.isfinite(
        out3["train_losses"]).all()


def test_train_dp_pipe_mid_epoch_resume(corpus, tmp_path):
    """save_every_steps + interruption under the composed ('data','pipe')
    mesh: resume is exact (canonical checkpoints round-trip the stacked
    pipeline layout + optimizer state)."""
    cfg = _cfg(mesh="data=2,pipe=2", num_epochs=2, save_every_steps=1)
    model_a = str(tmp_path / "a")
    out_a = train(corpus, model_a, config=cfg, resume=False)

    model_b = str(tmp_path / "b")
    train(corpus, model_b, config=cfg, resume=False, stop_after_steps=3)
    out_b = train(corpus, model_b, config=cfg)  # resume mid-epoch-2

    np.testing.assert_allclose(out_a["val_losses"], out_b["val_losses"],
                               rtol=1e-6)
    _assert_params_close(out_a["params"], out_b["params"], rtol=1e-6,
                         atol=1e-7)


def test_train_dp_seq_composed_matches_dp(corpus, tmp_path):
    """('data','seq') = (2,2) training reproduces the pure-dp run."""
    ref = _train_losses(corpus, str(tmp_path / "dp"), _cfg(mesh="data=2"))
    got = _train_losses(corpus, str(tmp_path / "sp"),
                        _cfg(mesh="data=2,seq=2"))
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["val_losses"], ref["val_losses"],
                               rtol=1e-4)
    _assert_params_close(got["params"], ref["params"])


def test_train_dp_expert_moe_matches_single(corpus, tmp_path):
    """MoE training: the ('data','expert') = (2,2) mesh reproduces the
    single-device MoE run (GSPMD partitioning does not change the math),
    and the checkpoint serves through predict."""
    ref = _train_losses(corpus, str(tmp_path / "one"),
                        _cfg(mesh="data=1", num_experts=2))
    got = _train_losses(corpus, str(tmp_path / "ep"),
                        _cfg(mesh="data=2,expert=2", num_experts=2))
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    _assert_params_close(got["params"], ref["params"])

    saved = json.load(open(os.path.join(str(tmp_path / "ep"),
                                        "config.json")))
    assert saved["transformer"]["num_experts"] == 2

    from pg_asr_tpu.predict import predict

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    str(tmp_path / "ep"), batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1


def test_cli_mesh_flag(corpus, tmp_path):
    """The VERDICT r1 'Done =' criterion: `main.py --mode train --mesh
    data=2,pipe=2 ...` completes, writes a canonical checkpoint, and
    predict through the CLI consumes it."""
    from pg_asr_tpu.cli import main

    model = str(tmp_path / "model")
    rc = main(["--mode", "train", "--corpus_path", corpus,
               "--model_path", model, "--model", "transformer",
               "--mesh", "data=2,pipe=2", "--microbatches", "2",
               "--num_epochs", "1", "--batch_size", "4"])
    assert rc == 0
    saved = json.load(open(os.path.join(model, "config.json")))
    assert saved["train"]["mesh_axes"] == ["data", "pipe"]
    rc = main(["--mode", "predict", "--corpus_path", corpus,
               "--model_path", model, "--batch_size", "4"])
    assert rc == 0
    assert os.path.exists(os.path.join(model, "predicted.txt"))


def test_plan_composed_pairs():
    """model+pipe and model+expert compose; other pairs still refuse."""
    devices = jax.devices()[:8]
    cfg = _cfg()
    plan = ParallelPlan(cfg, make_mesh((2, 2, 2), ("data", "pipe", "model"),
                                       devices=devices))
    assert plan.strategy == "pipe" and plan.tp
    moe = _cfg(num_experts=2)
    plan = ParallelPlan(moe, make_mesh((2, 2, 2), ("data", "model", "expert"),
                                       devices=devices))
    assert plan.strategy == "expert" and plan.tp
    with pytest.raises(ValueError, match="composes"):
        ParallelPlan(cfg, make_mesh((2, 2, 2), ("data", "seq", "model"),
                                    devices=devices))
    # tp degree must divide heads/ffn for the pipeline composition
    bad = cfg.replace(transformer=cfg.transformer.__class__(
        **{**cfg.transformer.__dict__, "num_heads": 3, "d_model": 33}))
    with pytest.raises(ValueError, match="divide"):
        ParallelPlan(bad, make_mesh((2, 2, 2), ("data", "pipe", "model"),
                                    devices=devices))


def test_train_dp_pp_tp_composed_matches_dp(corpus, tmp_path):
    """3-axis ('data','pipe','model') = (2,2,2) training through train()
    reproduces the pure-dp run (VERDICT r1 #3: composed meshes), writes
    canonical checkpoints (qkv column permutation inverted on save), and
    predict consumes them."""
    ref = _train_losses(corpus, str(tmp_path / "dp"), _cfg(mesh="data=2"))
    got = _train_losses(corpus, str(tmp_path / "pptp"),
                        _cfg(mesh="data=2,pipe=2,model=2"))
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["val_losses"], ref["val_losses"],
                               rtol=1e-4)
    _assert_params_close(got["params"], ref["params"])

    from pg_asr_tpu.predict import predict

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    str(tmp_path / "pptp"), batch_size=4, which_ckpt="last")
    assert stats["num_utts"] >= 1


def test_train_dp_tp_ep_composed_matches_single(corpus, tmp_path):
    """3-axis ('data','model','expert') = (2,2,2) MoE training (GSPMD:
    expert stacks sharded expert x model, dense leaves Megatron-sharded)
    reproduces the single-device MoE run."""
    ref = _train_losses(corpus, str(tmp_path / "one"),
                        _cfg(mesh="data=1", num_experts=2))
    got = _train_losses(corpus, str(tmp_path / "tpep"),
                        _cfg(mesh="data=2,model=2,expert=2", num_experts=2))
    np.testing.assert_allclose(got["train_losses"], ref["train_losses"],
                               rtol=1e-4)
    _assert_params_close(got["params"], ref["params"])
