"""Mesh-spec parsing + the strategy router that makes EVERY parallelism
axis drivable from the training CLI.

The reference's one parallelism knob was usable from its driver
(nn.DataParallel, reference model.py:201). This module gives the TPU
framework the same property for its full mesh vocabulary: the user writes
`--mesh data=2,pipe=2` and train() routes the jitted train/eval steps
through the right strategy library —

  axis      strategy                       library
  data      SPMD batch sharding            train.make_train_step (shard_map)
  model     Megatron tensor parallelism    parallel/mesh.py rules (pjit)
  pipe      GPipe pipeline                 parallel/pipeline.py (shard_map)
  seq       sequence (time) parallelism    parallel/sequence.py (shard_map)
  expert    switch-MoE expert parallelism  parallel/moe.py (pjit/GSPMD)
  fsdp      ZeRO-style sharded state       parallel/fsdp.py (pjit/GSPMD)

Composition: 'data' composes with any one other axis (dp x tp, dp x pp,
dp x sp, dp x ep, HSDP dp x fsdp), and two THREE-axis topologies compose
on top:
dp x pp x tp (Megatron column/row splits inside every GPipe stage — one
psum over 'model' per sublayer, qkv columns permuted to the
rank-contiguous layout by pipeline.permute_qkv_for_tp) and dp x tp x ep
(GSPMD: expert stacks sharded 'expert' x 'model', dense leaves per the
Megatron rules). The loss num/den and gradients reduce over every live
axis so any composed mesh computes exactly the global-batch step (parity
tests in tests/test_mesh_driver.py, tests/test_pipeline.py). Checkpoints
are ALWAYS written in the family-canonical parameter layout (the
pipeline's stage-stacked layout — and its tp column permutation — is
converted on save/restore), so a model trained on any mesh is loadable by
predict/stream/finetune_pg and resumable on any other mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "model", "pipe", "seq", "expert", "fsdp")


def parse_mesh_spec(spec: str) -> tuple[tuple[int, ...], tuple[str, ...]]:
    """'data=2,pipe=2' -> ((2, 2), ('data', 'pipe'))."""
    shape: list[int] = []
    axes: list[str] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, eq, size = part.partition("=")
        name = name.strip()
        if name not in MESH_AXES:
            raise ValueError(
                f"unknown mesh axis {name!r} (valid: {', '.join(MESH_AXES)})")
        if name in axes:
            raise ValueError(f"mesh axis {name!r} given twice")
        try:
            n = int(size)
        except ValueError:
            raise ValueError(f"bad mesh axis size in {part!r}")
        if n < 1:
            raise ValueError(f"mesh axis {name!r} must be >= 1")
        axes.append(name)
        shape.append(n)
    if not axes:
        raise ValueError("empty mesh spec")
    return tuple(shape), tuple(axes)


def map_params_subtrees(fn: Callable, params_treedef, tree):
    """Apply `fn` to every subtree of `tree` whose pytree structure equals
    `params_treedef`. Used to convert optimizer states between parameter
    layouts: optax states (Adam mu/nu, MultiSteps accumulators) embed
    trees that mirror the parameter tree exactly, so a layout conversion
    on params extends to the whole train state without knowing the
    optimizer's internals."""
    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == params_treedef:
                return fn(node)
        except Exception:
            pass
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        return node

    return rec(tree)


def _replicate_unplaced(tree, mesh: Mesh):
    """device_put replicated for every leaf not already placed on `mesh`
    (leaves a strategy's sharded subtrees untouched)."""
    rep = NamedSharding(mesh, P())

    def f(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(f, tree)


def _live(mesh: Mesh, axis: str) -> bool:
    return mesh.shape.get(axis, 1) > 1


class ParallelPlan:
    """Everything train() needs to run one strategy: parameter placement,
    run<->canonical layout conversion, and the jitted train/eval steps."""

    def __init__(self, cfg, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        live = [a for a in ("model", "pipe", "seq", "expert", "fsdp")
                if _live(mesh, a)]
        composable = (
            {"model", "expert"},  # dp x tp x ep (GSPMD sharding rules)
            {"model", "pipe"},    # dp x pp x tp (Megatron inside GPipe)
        )
        if len(live) > 1 and set(live) not in composable:
            raise ValueError(
                f"mesh composes {live} — 'data' composes with any ONE of "
                "model/pipe/seq/expert/fsdp (plus the GSPMD pairs "
                "model+expert and model+pipe); other compositions are "
                "not supported")
        # primary routing key: the strategy that owns parameter layout and
        # the train/eval steps ('model' rides along via sharding rules)
        non_model = [a for a in live if a != "model"]
        self.strategy = (non_model[0] if non_model
                         else (live[0] if live else "data"))
        self.tp = "model" in live
        self._canon_def = None  # set on first place_params
        self._run_def = None
        is_moe = (cfg.model.family == "transformer"
                  and cfg.transformer.num_experts > 0)

        if self.strategy in ("pipe", "seq"):
            if cfg.model.family != "transformer" or is_moe:
                raise ValueError(
                    f"'{self.strategy}' axis requires the dense transformer "
                    f"family (got family={cfg.model.family!r}, "
                    f"num_experts={cfg.transformer.num_experts})")
        if self.strategy == "pipe":
            S = mesh.shape["pipe"]
            L = cfg.transformer.num_layers
            if L % S != 0:
                raise ValueError(
                    f"transformer.num_layers={L} not divisible into "
                    f"{S} pipeline stages")
            self.microbatches = cfg.train.pipeline_microbatches or S
            if self.tp:
                t = mesh.shape["model"]
                if (cfg.transformer.num_heads % t
                        or cfg.transformer.ffn_dim % t):
                    raise ValueError(
                        f"model axis size {t} must divide num_heads="
                        f"{cfg.transformer.num_heads} and ffn_dim="
                        f"{cfg.transformer.ffn_dim}")
        if self.strategy == "fsdp":
            from .fsdp import shardable_fraction
            from ..train import init_model_params

            n = mesh.shape["fsdp"]
            # shapes only — no device allocation for the probe
            probe = jax.eval_shape(
                lambda: init_model_params(jax.random.PRNGKey(0), cfg))
            frac = shardable_fraction(probe, n)
            if frac == 0.0:
                raise ValueError(
                    f"fsdp={n} shards NO parameter leaf of this model "
                    "(no dimension divisible by the axis size) — it would "
                    "silently degrade to replicated data parallelism; "
                    "pick an axis size that divides the layer dims")
            self.fsdp_coverage = frac
        if self.strategy == "expert":
            E = cfg.transformer.num_experts
            n = mesh.shape["expert"]
            if not is_moe:
                raise ValueError(
                    "'expert' axis needs a MoE model — set "
                    "--moe_experts N (transformer.num_experts)")
            if E % n != 0:
                raise ValueError(
                    f"num_experts={E} not divisible over expert axis "
                    f"size {n}")

    # -- batch handling ----------------------------------------------------
    @property
    def batch_multiple(self) -> int:
        """Zero-pad batches to this multiple (data shards x microbatches)."""
        n = self.mesh.shape.get("data", 1)
        if self.strategy == "pipe":
            n *= self.microbatches
        if self.strategy == "fsdp":
            n *= self.mesh.shape["fsdp"]  # batch splits over data x fsdp
        return n

    # -- parameter layout / placement --------------------------------------
    def place_params(self, params):
        """Canonical host/device params -> placed run-layout params."""
        if self._canon_def is None:
            self._canon_def = jax.tree_util.tree_structure(params)
        run = self._to_run(params)
        if self._run_def is None:
            self._run_def = jax.tree_util.tree_structure(run)
        return _replicate_unplaced(run, self.mesh)

    def place_opt_state(self, opt_state):
        """Canonical optimizer state -> placed run layout (maps the
        params-shaped subtrees, replicates the scalar counts)."""
        assert self._canon_def is not None, "place_params first"
        out = map_params_subtrees(self._to_run, self._canon_def, opt_state)
        return _replicate_unplaced(out, self.mesh)

    def canonical_params(self, params):
        if self.strategy != "pipe":
            return params
        from .pipeline import (permute_qkv_for_tp,
                               pipeline_params_to_canonical)

        out = pipeline_params_to_canonical(
            params, self.cfg.transformer.num_layers)
        if self.tp:
            out = permute_qkv_for_tp(out, self.cfg.transformer.num_heads,
                                     self.mesh.shape["model"], inverse=True)
        return out

    def canonical_state(self, state: dict) -> dict:
        """Checkpoint-bound state dict -> canonical layout for every
        params-shaped entry (params / ema_params / opt_state)."""
        if self.strategy != "pipe":
            return state
        out = dict(state)
        for key in ("params", "ema_params"):
            if key in out:
                out[key] = self.canonical_params(out[key])
        if "opt_state" in out and self._run_def is not None:
            out["opt_state"] = map_params_subtrees(
                self.canonical_params, self._run_def, out["opt_state"])
        return out

    def _to_run(self, params):
        mesh, cfg = self.mesh, self.cfg
        if self.strategy == "pipe":
            from .pipeline import (permute_qkv_for_tp, shard_pipeline_params,
                                   stack_pipeline_params)

            if self.tp:
                params = permute_qkv_for_tp(params, cfg.transformer.num_heads,
                                            mesh.shape["model"])
            return shard_pipeline_params(
                stack_pipeline_params(params, mesh.shape["pipe"]), mesh)
        if self.strategy == "expert":
            from .moe import shard_moe_params

            return shard_moe_params(params, mesh)
        if self.strategy == "model":
            from .mesh import shard_params

            return shard_params(params, mesh)
        if self.strategy == "fsdp":
            from .fsdp import shard_params_fsdp

            return shard_params_fsdp(params, mesh)
        return params  # 'data': replicated by _replicate_unplaced

    # -- steps -------------------------------------------------------------
    def make_train_step(self, optimizer) -> Callable:
        cfg, mesh = self.cfg, self.mesh
        if self.strategy == "pipe":
            from .pipeline import make_pipeline_loss

            dropout = cfg.transformer.dropout > 0.0
            loss_fn = make_pipeline_loss(cfg, mesh, self.microbatches,
                                         dropout=dropout)
            return _grad_step(loss_fn, optimizer, dropout)
        if self.strategy == "seq":
            from .sequence import make_sequence_parallel_loss

            dropout = cfg.transformer.dropout > 0.0
            loss_fn = make_sequence_parallel_loss(cfg, mesh, dropout=dropout)
            return _grad_step(loss_fn, optimizer, dropout)
        from ..train import make_train_step

        return make_train_step(cfg, optimizer, mesh)

    def make_eval_step(self) -> Callable:
        cfg, mesh = self.cfg, self.mesh
        if self.strategy == "pipe":
            from .pipeline import make_pipeline_loss

            return jax.jit(make_pipeline_loss(cfg, mesh, self.microbatches))
        if self.strategy == "seq":
            from .sequence import make_sequence_parallel_loss

            return jax.jit(make_sequence_parallel_loss(cfg, mesh))
        from ..train import make_eval_step

        return make_eval_step(cfg, mesh)


def _grad_step(loss_fn, optimizer, dropout: bool) -> Callable:
    """(loss_fn [, rng]) -> the standard train-step contract
    (params, opt_state, rng, *batch) -> (params, opt_state, rng, loss)."""
    def step(params, opt_state, rng, wave, num_samples, labels, label_lens):
        rng, dropout_rng = jax.random.split(rng)
        if dropout:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, wave, num_samples, labels, label_lens, dropout_rng)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, wave, num_samples, labels, label_lens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_plan(cfg, mesh: Mesh) -> ParallelPlan:
    return ParallelPlan(cfg, mesh)
