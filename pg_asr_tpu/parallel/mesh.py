"""Device mesh + sharding rules: SPMD data (and optional model) parallelism.

TPU-native replacement for the reference's single-process
nn.DataParallel(scatter/replicate/gather) (reference model.py:201): we build
a jax.sharding.Mesh, place the batch on the 'data' axis and parameters
replicated (or sharded on 'model' for the tensor-parallel variant), and let
XLA insert the gradient psum over ICI. Mesh-shape-agnostic: the same code
runs 1-chip, v4-8, or a (dcn, ici) 2-level mesh.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host (DCN) training.

    On TPU pods, bare jax.distributed.initialize() self-configures from the
    metadata server; explicit args cover GCE-less clusters. Safe to call
    when already initialized or single-process. The drivers call this when
    PGASR_DISTRIBUTED=1 (cli.py) so single-host runs pay nothing.
    """
    # NB: do NOT touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes initialize() fail permanently.
    try:
        # CPU backends need an explicit cross-process collectives impl to
        # form the global device topology (TPU pods use ICI/DCN natively);
        # harmless on TPU, required for the 2-process CPU integration test
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    try:
        kwargs = {}
        if coordinator_address:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
        print(f"[mesh] jax.distributed initialized "
              f"(process {jax.process_index()}/{jax.process_count()})")
    except (RuntimeError, ValueError) as e:
        if coordinator_address or (num_processes or 0) > 1:
            # an EXPLICITLY configured cluster must FAIL, not silently fall
            # back to single-process training (each host would train alone
            # on its shard and checkpoints would race)
            raise RuntimeError(
                "jax.distributed.initialize failed for the configured "
                f"cluster (coordinator={coordinator_address!r}, "
                f"num_processes={num_processes}, process_id={process_id})"
            ) from e
        # bare auto-detect call on a non-pod box / already initialized
        print(f"[mesh] jax.distributed.initialize skipped: {e}")


def make_mesh(shape: tuple[int, ...] = (), axes: tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh; default: all devices on one 'data' axis.

    With an explicit multi-axis shape and no explicit device list, device
    placement goes through mesh_utils.create_device_mesh so the innermost
    axes land on ICI neighbours and DCN hops stay on the outermost axis —
    the 2-level (dcn, ici) layout drops in without code changes.
    """
    if devices is None and shape and int(np.prod(shape)) == len(jax.devices()):
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(shape), axes)
        except Exception:
            pass  # fall through to the simple row-major layout
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh {dict(zip(axes, shape))} needs {need} devices, "
            f"only {len(devices)} available")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the batch-carrying axes: 'data', plus
    'fsdp' when present (FSDP is data parallelism with sharded state, so
    the batch splits over both). Replicated on meshes without either,
    e.g. a pure ('pipe',) mesh)."""
    axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes) if axes else P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = replicated(mesh)
    return jax.device_put(tree, s)


def pad_batch_to_multiple(arrays: tuple[np.ndarray, ...], multiple: int):
    """Pad the leading (batch) dim to a multiple with ZERO rows (ragged
    final batches under data parallelism). Zero rows have num_samples=0 and
    label_lens=0, which the losses exclude (ops/ctc.ctc_loss_mean,
    losses.seq2seq_nll_loss) — so the padded step computes exactly the
    unpadded loss/grads, unlike row duplication which up-weights the
    repeated utterances."""
    b = arrays[0].shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arrays
    out = []
    for a in arrays:
        pad = np.zeros((rem,) + a.shape[1:], dtype=a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return tuple(out)


def shard_batch_arrays(arrays, mesh: Mesh, batch_multiple: int | None = None):
    """Host numpy batch arrays -> device arrays sharded on 'data'.

    Single-host: one device_put of the global batch. Multi-host: each
    process passes its PROCESS-LOCAL slice of the batch (feed each host
    1/process_count of the rows — see dataset.BatchIterator's shard
    arguments) and the global array is assembled without any cross-host
    data movement (jax.make_array_from_process_local_data).

    batch_multiple overrides the zero-row padding multiple (the pipeline
    strategy needs data_shards x microbatches rows)."""
    n_data = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
    mult = batch_multiple if batch_multiple is not None else n_data
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        per_proc = max(1, mult // jax.process_count())
        arrays = pad_batch_to_multiple(
            tuple(np.asarray(a) for a in arrays), per_proc)
        return tuple(jax.make_array_from_process_local_data(s, a)
                     for a in arrays)
    arrays = pad_batch_to_multiple(tuple(np.asarray(a) for a in arrays), mult)
    return tuple(jax.device_put(a, s) for a in arrays)


# ---------------------------------------------------------------------------
# Model (tensor-parallel) sharding rules, Megatron-style, for every family's
# parameter tree. Column-shard the "expanding" matmul of each block (qkv /
# ffn_in / LSTM gates), row-shard the "contracting" one that follows
# (attn_out / ffn_out): activations stay sharded between the pair and XLA
# inserts ONE all-reduce per block at the row-sharded output instead of
# resharding at every boundary. Row-sharded biases are replicated (they add
# after the reduce). With the default sizes this is optional headroom, but
# the rules keep the pjit train step valid and comms-sane on any
# ('data', 'model') mesh.
# ---------------------------------------------------------------------------

# second matmul of a Megatron pair: input (contraction) dim sharded
# (joint_out contracts the joint dim the column-sharded joint_enc/joint_pred
# produce — row-sharding it all-reduces the small (..., A) output instead of
# all-gathering the big (B, T', U+1, J) joint activation)
_ROW_SHARDED = {"attn_out", "ffn_out", "ffn1_out", "ffn2_out", "conv_out",
                "joint_out"}


def param_sharding_rules(mesh: Mesh):
    """PartitionSpec rules keyed by parameter path (parent module + leaf)."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def spec_for(path: tuple[str, ...]) -> P:
        if not has_model:
            return P()
        leaf = path[-1]
        parent = path[-2] if len(path) >= 2 else ""
        if leaf in ("W", "U"):  # LSTM (I, 4H) / (H, 4H): shard the gate dim
            return P(None, "model")
        if leaf == "conv_dw":  # depthwise (K, 1, d): shard channels
            return P(None, None, "model")
        if leaf == "pred_embed":  # (A, E): shard the embedding dim
            return P(None, "model")
        if leaf == "w":
            if parent in _ROW_SHARDED:
                return P("model", None)
            return P(None, "model")  # column-shard the output dim
        if leaf == "b":
            if parent in _ROW_SHARDED:
                return P()  # bias adds after the all-reduce: replicated
            return P("model")
        return P()  # LayerNorm scale/bias and everything else: replicated

    return spec_for


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rules to a parameter pytree."""
    spec_for = param_sharding_rules(mesh)

    def place(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "idx", "")) for k in path)
        names = tuple(str(n) for n in names)
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(names)))

    return jax.tree_util.tree_map_with_path(place, params)
