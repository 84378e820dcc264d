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

Scope: transformer family, train-mode math without dropout (the parity
anchor runs dropout-free; dropout would need per-stage rng plumbing).
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


def shard_pipeline_params(pparams: dict, mesh: Mesh) -> dict:
    """Place stage stacks on 'pipe', the rest replicated."""
    def place(path, leaf):
        top = str(getattr(path[0], "key", ""))
        spec = (P("pipe") if top == "stages"
                else P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, pparams)


def _stage_apply(stage_blocks, x, key_bias, num_heads: int,
                 p_drop: float = 0.0, rkey=None):
    """Apply this stage's k stacked blocks to x (mb, T', d). With a
    dropout rate and rng key, each block consumes two fold_in subkeys
    (post-attention + post-FFN), mirroring the dense encoder."""
    from ..models.bilstm_ctc import _dropout

    def body(carry, blk):
        x, j = carry
        h = _mhsa(blk, _layer_norm(blk["ln1"], x), key_bias, num_heads)
        if rkey is not None and p_drop > 0.0:
            h = _dropout(h, p_drop, jax.random.fold_in(rkey, 2 * j), True)
        x = x + h
        h = linear(blk["ffn_out"],
                   jax.nn.gelu(linear(blk["ffn_in"],
                                      _layer_norm(blk["ln2"], x))))
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
                y = _stage_apply(stages, x_in, kb, tcfg.num_heads,
                                 p_drop=tcfg.dropout, rkey=rkey)
            else:
                y = _stage_apply(stages, x_in, kb, tcfg.num_heads)
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
        in_specs=({"stages": P("pipe"), "input_proj": P(), "ln_final": P(),
                   "ctc_head": P()}, bspec, bspec, bspec, bspec, P()),
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
