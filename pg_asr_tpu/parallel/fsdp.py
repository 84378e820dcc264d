"""ZeRO-style fully-sharded data parallelism: the 'fsdp' mesh axis.

The reference had one parallelism mode — replicate the model per device
(nn.DataParallel, reference model.py:201). Data parallelism replicates
parameters AND optimizer state on every chip, so per-chip HBM caps model
size at (params + adam mu/nu + grads) x replicas. FSDP removes that cap
the TPU-native way: every parameter leaf, its Adam moments, and its
gradient live SHARDED across the 'fsdp' axis, and XLA's GSPMD pass
inserts the just-in-time all-gathers (weights, before use) and
reduce-scatters (gradients, after the backward) over ICI.

Design (the jax.sharding recipe, not a torch-FSDP translation):

 - The train/eval steps are the plain GLOBAL-semantics jitted programs
   from train.py — no shard_map, no hand-written collectives. Committed
   input shardings drive GSPMD: batch rows sharded over ('data','fsdp'),
   parameter/optimizer leaves sharded over 'fsdp' on their largest
   divisible dimension (`fsdp_leaf_spec`). Because the step program is
   identical to the single-device one, FSDP changes WHERE tensors live,
   never what is computed — parity is tested, not hoped for.
 - Optimizer updates run on the shards directly (optax transforms are
   elementwise over leaves; the global-norm clip's reduction is a global
   reduction under GSPMD, so clipping semantics stay exact).
 - 'data' composes on top (HSDP): params replicated across 'data',
   sharded across 'fsdp', batch split over both — the 2-level
   (DCN=data, ICI=fsdp) layout for pods.
 - Checkpoints: leaves keep their GLOBAL logical shapes, so save/restore
   and cross-mesh resume (fsdp -> dp -> single-chip predict) need no
   layout conversion at all.

Per-device parameter+optimizer memory drops by ~the axis size (leaves
whose dims don't divide the axis stay replicated — LayerNorm scales,
odd-sized biases; `shardable_fraction` reports the coverage, and the
plan refuses an 'fsdp' axis that shards nothing).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "fsdp"


def fsdp_leaf_spec(shape: tuple[int, ...], n: int) -> P:
    """PartitionSpec sharding the LARGEST dimension divisible by n.

    Ties go to the trailing-most dimension (output/feature dims are the
    big ones in this codebase's (in, out) weight layout, and trailing
    dims keep lane-aligned layouts on TPU). Leaves with no divisible
    dimension are replicated."""
    if n <= 1 or not shape:
        return P()
    best = -1
    best_size = 0
    for i, s in enumerate(shape):
        if s % n == 0 and s >= best_size and s > 1:
            best, best_size = i, s
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = AXIS
    return P(*spec)


def param_specs(params, n: int):
    """Pytree of PartitionSpec mirroring `params`."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_leaf_spec(np.shape(x), n), params)


def shardable_fraction(params, n: int) -> float:
    """Fraction of parameter ELEMENTS that land sharded (coverage
    diagnostic; the rest is replicated)."""
    tot = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(params):
        size = int(np.prod(np.shape(leaf))) if np.shape(leaf) else 1
        tot += size
        if fsdp_leaf_spec(np.shape(leaf), n) != P():
            sharded += size
    return sharded / max(tot, 1)


def shard_params_fsdp(params, mesh: Mesh):
    """Place a parameter(-shaped) pytree sharded over the 'fsdp' axis."""
    n = mesh.shape.get(AXIS, 1)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_leaf_spec(np.shape(x), n))),
        params)
