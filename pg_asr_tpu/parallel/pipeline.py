"""GPipe-style pipeline parallelism for the transformer-CTC family.

The reference has exactly one parallelism strategy (single-host
nn.DataParallel, reference model.py:201). This module adds the pipeline
axis to the framework's mesh vocabulary (data, model, pipe): encoder blocks
are split into S stages laid out on a ('pipe',) mesh axis, microbatches
flow through the stages with jax.lax.ppermute over ICI, and the whole
schedule — forward, loss, and backward — is ONE shard_map'd jitted program
differentiated end-to-end (the ppermute transposes give the reverse-order
backward pipeline for free).

Design (TPU-first):
  * stage parameters live stacked: every block tensor gains a leading
    (S, k) [stages x blocks-per-stage] axis, sharded P('pipe') on the mesh
    — each device materializes only ITS stage's blocks. Frontend
    (featurize -> subsample -> input projection) and head (final LN -> CTC
    head -> loss) are replicated.
  * schedule: lax.scan over M + S - 1 ticks. At tick t, the device at
    stage s processes microbatch i = t - s (when 0 <= i < M): stage 0
    injects frontend(microbatch[t]); inner stages transform what the
    previous tick's ppermute delivered; the last stage computes the
    microbatch's CTC loss terms. One ppermute per tick moves activations
    stage s -> s+1. Bubble fraction is the standard (S-1)/(M+S-1).
  * the per-microbatch loss numerators/denominators accumulate on the last
    stage and psum over 'pipe' at the end (only the last stage contributes
    non-zero), preserving the framework's exact ragged-batch num/den
    semantics (ops/ctc.ctc_loss_terms).
  * gradients: computed INSIDE the shard_map region (same discipline as
    train.make_train_step): stage-parameter grads stay device-local
    (out_spec P('pipe')), replicated-parameter grads psum over 'pipe'.

Scope: transformer family; dropout rides along via per-(shard, stage,
microbatch) fold_in streams. The mesh may compose 'data' (dp x pp) and
'model' (dp x pp x tp): with a live 'model' axis every stage runs
Megatron column/row-split sublayers — this rank's attention heads and ffn
slice — completed by one psum over 'model' per sublayer (see
_stage_apply / pipeline_stage_specs / permute_qkv_for_tp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.bilstm_ctc import linear
from ..models.transformer_ctc import _layer_norm, _mhsa, frontend
from ..ops.ctc import ctc_loss_terms
from ..ops.features import extract_features


def stack_pipeline_params(params: dict, num_stages: int) -> dict:
    """Transformer params -> pipeline layout: the per-block list becomes a
    stacked pytree with a leading (S, k) axis; everything else unchanged."""
    blocks = params["blocks"]
    L = len(blocks)
    assert L % num_stages == 0, (
        f"{L} blocks not divisible into {num_stages} stages")
    k = L // num_stages
    stages = []
    for s in range(num_stages):
        grp = blocks[s * k:(s + 1) * k]
        stages.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *grp))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)
    out = {kk: v for kk, v in params.items() if kk != "blocks"}
    out["stages"] = stacked  # leaves: (S, k, ...)
    return out


def unstack_pipeline_tree(stages_tree, num_layers: int):
    """Inverse layout for comparing grads/params against the list form."""
    leaves = []
    for i in range(num_layers):
        def pick(x, i=i):
            S, k = x.shape[0], x.shape[1]
            return x[i // k, i % k]
        leaves.append(jax.tree_util.tree_map(pick, stages_tree))
    return leaves


def pipeline_params_to_canonical(pparams: dict, num_layers: int) -> dict:
    """Stacked pipeline layout -> the family-canonical params tree (blocks
    as a list), so checkpoints stay loadable by predict/stream/finetune_pg
    regardless of the mesh they were trained on."""
    out = {k: v for k, v in pparams.items() if k != "stages"}
    out["blocks"] = unstack_pipeline_tree(pparams["stages"], num_layers)
    return out


def _tp_live(mesh: Mesh) -> bool:
    return "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1


def permute_qkv_for_tp(params: dict, num_heads: int, tp: int,
                       inverse: bool = False) -> dict:
    """Reorder each block's fused qkv weight columns from the canonical
    [3][h][dh] layout to [tp][3][h/tp][dh] so a contiguous 1/tp slice of
    the last dim is exactly one tensor-parallel rank's q/k/v heads — the
    layout shard_map's P(..., 'model') slicing needs. Operates on the
    canonical (blocks-as-list) tree; pure permutation, exactly inverted
    by inverse=True (checkpoints always store the canonical order)."""
    if tp <= 1:
        return params

    def perm(x, cols):
        hl = num_heads // tp
        dh = cols // (3 * num_heads)
        shp = x.shape[:-1]
        if inverse:
            y = x.reshape(*shp, tp, 3, hl, dh)
            y = jnp.moveaxis(y, -4, -3)  # [3][tp][hl][dh]
        else:
            y = x.reshape(*shp, 3, tp, hl, dh)
            y = jnp.moveaxis(y, -3, -4)  # [tp][3][hl][dh]
        return y.reshape(*shp, cols)

    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = []
    for blk in params["blocks"]:
        b = dict(blk)
        b["qkv"] = {"w": perm(blk["qkv"]["w"], blk["qkv"]["w"].shape[-1]),
                    "b": perm(blk["qkv"]["b"], blk["qkv"]["b"].shape[-1])}
        out["blocks"].append(b)
    return out


def pipeline_stage_specs(mesh: Mesh) -> dict:
    """Per-leaf PartitionSpecs for the stacked (S, k, ...) stage tree.
    Pure pipe meshes shard only the leading stage axis; with a live
    'model' axis the Megatron pattern composes in: qkv / ffn_in
    column-parallel (last dim on 'model'), attn_out / ffn_out
    row-parallel (contraction dim on 'model', bias replicated — it adds
    once after the psum), LayerNorms replicated across 'model'."""
    if not _tp_live(mesh):
        p = P("pipe")
        return {"ln1": {"scale": p, "bias": p},
                "qkv": {"w": p, "b": p},
                "attn_out": {"w": p, "b": p},
                "ln2": {"scale": p, "bias": p},
                "ffn_in": {"w": p, "b": p},
                "ffn_out": {"w": p, "b": p}}
    return {
        "ln1": {"scale": P("pipe"), "bias": P("pipe")},
        "qkv": {"w": P("pipe", None, None, "model"),
                "b": P("pipe", None, "model")},
        "attn_out": {"w": P("pipe", None, "model", None),
                     "b": P("pipe")},
        "ln2": {"scale": P("pipe"), "bias": P("pipe")},
        "ffn_in": {"w": P("pipe", None, None, "model"),
                   "b": P("pipe", None, "model")},
        "ffn_out": {"w": P("pipe", None, "model", None),
                    "b": P("pipe")},
    }


def shard_pipeline_params(pparams: dict, mesh: Mesh) -> dict:
    """Place stage stacks on 'pipe' (x 'model' when composed), the rest
    replicated."""
    specs = pipeline_stage_specs(mesh)

    def place_stage(path, leaf):
        node = specs
        for k in path:
            node = node[str(getattr(k, "key", ""))]
        return jax.device_put(leaf, NamedSharding(mesh, node))

    out = {}
    for k, v in pparams.items():
        if k == "stages":
            out[k] = jax.tree_util.tree_map_with_path(place_stage, v)
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def _mhsa_tp_partial(blk: dict, x: jnp.ndarray, key_bias: jnp.ndarray,
                     heads_local: int, head_dim: int) -> jnp.ndarray:
    """This rank's heads of masked self-attention, Megatron column/row
    split: the local qkv slice (permute_qkv_for_tp layout) produces
    heads_local heads, and the local attn_out rows yield a PARTIAL
    (mb, T, d) output — the caller psums over 'model' and adds the
    (replicated) attn_out bias once."""
    B, T, _ = x.shape
    qkv = (jnp.einsum("btd,df->btf", x, blk["qkv"]["w"],
                      preferred_element_type=x.dtype)
           + blk["qkv"]["b"]).reshape(B, T, 3, heads_local, head_dim)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2)  # (B, hl, T, dh)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / head_dim ** 0.5) + key_bias
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=x.dtype)
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, heads_local * head_dim)
    return jnp.einsum("btf,fd->btd", ctx, blk["attn_out"]["w"],
                      preferred_element_type=x.dtype)


def _stage_apply(stage_blocks, x, key_bias, num_heads: int,
                 p_drop: float = 0.0, rkey=None, tp: int = 1,
                 head_dim: int = 0):
    """Apply this stage's k stacked blocks to x (mb, T', d). With a
    dropout rate and rng key, each block consumes two fold_in subkeys
    (post-attention + post-FFN), mirroring the dense encoder.

    tp > 1 composes Megatron tensor parallelism over the 'model' axis:
    num_heads is then the LOCAL head count, the block weights are this
    rank's column/row slices, and each sublayer output is completed by
    one psum over 'model' before the (replicated) bias + residual add —
    so dropout masks and activations stay identical across model ranks
    (rkey is never folded by model index)."""
    from ..models.bilstm_ctc import _dropout

    def body(carry, blk):
        x, j = carry
        if tp > 1:
            h = _mhsa_tp_partial(blk, _layer_norm(blk["ln1"], x), key_bias,
                                 num_heads, head_dim)
            h = jax.lax.psum(h, "model") + blk["attn_out"]["b"]
        else:
            h = _mhsa(blk, _layer_norm(blk["ln1"], x), key_bias, num_heads)
        if rkey is not None and p_drop > 0.0:
            h = _dropout(h, p_drop, jax.random.fold_in(rkey, 2 * j), True)
        x = x + h
        xn = _layer_norm(blk["ln2"], x)
        if tp > 1:
            f = jax.nn.gelu(jnp.einsum("btd,df->btf", xn,
                                       blk["ffn_in"]["w"],
                                       preferred_element_type=x.dtype)
                            + blk["ffn_in"]["b"])
            h = jnp.einsum("btf,fd->btd", f, blk["ffn_out"]["w"],
                           preferred_element_type=x.dtype)
            h = jax.lax.psum(h, "model") + blk["ffn_out"]["b"]
        else:
            h = linear(blk["ffn_out"], jax.nn.gelu(linear(blk["ffn_in"], xn)))
        if rkey is not None and p_drop > 0.0:
            h = _dropout(h, p_drop, jax.random.fold_in(rkey, 2 * j + 1),
                         True)
        return (x + h, j + 1), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), stage_blocks)
    return x


def _reduce_axes(mesh: Mesh) -> tuple[str, ...]:
    """Axes the loss terms psum over: 'pipe' always, plus 'data' when the
    mesh composes data parallelism (dp x pp) — the num/den reduce across
    both so the composed mesh computes exactly the global batch mean."""
    return tuple(a for a in ("pipe", "data") if a in mesh.axis_names)


def make_pipeline_loss(cfg: Config, mesh: Mesh, num_microbatches: int,
                       dropout: bool = False):
    """Build loss_fn(pparams, wave, num_samples, labels, label_lens
    [, dropout_rng]) -> scalar mean CTC loss through the S-stage pipeline.

    The mesh may compose a 'data' axis (dp x pp): the batch arrives sharded
    on 'data' and the loss terms psum over both axes. With dropout=True the
    function takes a trailing rng key and applies the dense encoder's
    dropout pattern (frontend + 2 per block), decorrelated per stage,
    microbatch, and data shard.
    """
    from ..train import _shard_map

    tcfg = cfg.transformer
    S = mesh.shape["pipe"]
    M = num_microbatches
    has_data = "data" in mesh.axis_names
    red = _reduce_axes(mesh)
    tpn = mesh.shape.get("model", 1)
    if tpn > 1:
        if tcfg.num_heads % tpn or tcfg.ffn_dim % tpn:
            raise ValueError(
                f"tensor-parallel degree {tpn} must divide num_heads="
                f"{tcfg.num_heads} and ffn_dim={tcfg.ffn_dim}")
    heads_local = tcfg.num_heads // tpn
    head_dim = tcfg.d_model // tcfg.num_heads

    def local(pparams, wave, num_samples, labels, label_lens, drng):
        s_idx = jax.lax.axis_index("pipe")
        if dropout:
            base_rng = (jax.random.fold_in(drng, jax.lax.axis_index("data"))
                        if has_data else drng)
        stages = jax.tree_util.tree_map(lambda x: x[0], pparams["stages"])
        B = wave.shape[0]
        assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
        mb = B // M

        # frontend for ALL microbatches on every stage (shared with the
        # dense encoder — transformer_ctc.frontend): the (cheap) mask /
        # length products feed every stage's key_bias, and stage 0 consumes
        # the projected activations; the heavy per-tick head+loss below IS
        # gated to the last stage with lax.cond
        feats, mask, frame_lens = extract_features(wave, num_samples,
                                                   cfg.features)
        x, out_mask, out_lens = frontend(pparams, feats, mask, frame_lens,
                                         cfg.model, tcfg)
        if dropout and tcfg.dropout > 0.0:
            from ..models.bilstm_ctc import _dropout

            # frontend dropout: identical across stages (only stage 0's
            # injection consumes it), decorrelated across data shards
            x = _dropout(x, tcfg.dropout,
                         jax.random.fold_in(base_rng, 0), True)
        dtype = x.dtype
        To = x.shape[1]
        key_bias = jnp.where(out_mask, 0.0,
                             -1e9).astype(jnp.float32)[:, None, None, :]
        # microbatch views (M, mb, ...)
        x_mb = x.reshape(M, mb, To, -1)
        kb_mb = key_bias.reshape(M, mb, 1, 1, To)
        om_mb = out_mask.reshape(M, mb, To)
        ol_mb = out_lens.reshape(M, mb)
        lb_mb = labels.reshape(M, mb, -1)
        ll_mb = label_lens.reshape(M, mb)

        def tick(carry, t):
            x_cur, num_acc, den_acc = carry
            i = t - s_idx  # microbatch id at this stage this tick
            valid = (i >= 0) & (i < M)
            ic = jnp.clip(i, 0, M - 1)
            # stage 0 injects; others consume the ppermuted activation
            inject = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1),
                                                  keepdims=False)
            x_in = jnp.where(s_idx == 0, inject, x_cur)
            kb = jax.lax.dynamic_index_in_dim(kb_mb, ic, keepdims=False)
            if dropout and tcfg.dropout > 0.0:
                # unique stream per (data shard, stage, microbatch)
                rkey = jax.random.fold_in(
                    jax.random.fold_in(base_rng, 1 + s_idx), ic)
                y = _stage_apply(stages, x_in, kb, heads_local,
                                 p_drop=tcfg.dropout, rkey=rkey, tp=tpn,
                                 head_dim=head_dim)
            else:
                y = _stage_apply(stages, x_in, kb, heads_local, tp=tpn,
                                 head_dim=head_dim)
            y = jnp.where(valid, y, jnp.zeros_like(y))

            # last stage only: head + CTC loss terms for its current
            # microbatch. The predicate is shard-varying, which is exactly
            # what per-device lax.cond inside shard_map is for — the other
            # S-1 stages skip the O(T'·U) loss lattice entirely.
            def head_loss(y):
                z = _layer_norm(pparams["ln_final"], y)
                logits = linear(pparams["ctc_head"], z)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                om = jax.lax.dynamic_index_in_dim(om_mb, ic, keepdims=False)
                lp = lp * om.astype(jnp.float32)[:, :, None]
                num, den = ctc_loss_terms(
                    lp,
                    jax.lax.dynamic_index_in_dim(ol_mb, ic, keepdims=False),
                    jax.lax.dynamic_index_in_dim(lb_mb, ic, keepdims=False),
                    jax.lax.dynamic_index_in_dim(ll_mb, ic, keepdims=False))
                return (jnp.where(valid, num, 0.0),
                        jnp.where(valid, den, 0.0))

            num, den = jax.lax.cond(
                s_idx == S - 1, head_loss,
                lambda y: (jnp.float32(0.0), jnp.float32(0.0)), y)
            num_acc = num_acc + num
            den_acc = den_acc + den

            # move activations one stage to the right
            x_next = jax.lax.ppermute(y, "pipe",
                                      [(s, s + 1) for s in range(S - 1)])
            return (x_next, num_acc, den_acc), None

        x0 = jnp.zeros((mb, To, tcfg.d_model), dtype)
        (x_last, num, den), _ = jax.lax.scan(
            tick, (x0, jnp.float32(0.0), jnp.float32(0.0)),
            jnp.arange(M + S - 1))
        # only the last stage's num/den are non-zero; the 'data' reduction
        # (when composed) makes the result the exact global ragged mean
        num = jax.lax.psum(num, red)
        den = jax.lax.psum(den, red)
        return num / jnp.maximum(den, 1.0)

    bspec = P("data") if has_data else P()
    sharded = _shard_map(
        local, mesh,
        in_specs=({"stages": pipeline_stage_specs(mesh), "input_proj": P(),
                   "ln_final": P(), "ctc_head": P()},
                  bspec, bspec, bspec, bspec, P()),
        out_specs=P())
    if dropout:
        return sharded

    def no_rng(pparams, wave, num_samples, labels, label_lens):
        return sharded(pparams, wave, num_samples, labels, label_lens,
                       jax.random.PRNGKey(0))

    return no_rng


def make_pipeline_grad_fn(cfg: Config, mesh: Mesh, num_microbatches: int):
    """jitted (loss, grads) through the pipeline. shard_map is
    differentiable: the ppermute transposes run the backward pipeline in
    reverse stage order, stage-parameter grads land sharded on 'pipe' like
    the parameters themselves, and replicated-parameter grads come out
    replicated (the transpose inserts the psum)."""
    sm = make_pipeline_loss(cfg, mesh, num_microbatches)

    def vg(pparams, wave, num_samples, labels, label_lens):
        return jax.value_and_grad(sm)(pparams, wave, num_samples, labels,
                                      label_lens)

    return jax.jit(vg)
