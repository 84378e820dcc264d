"""Sequence parallelism for the transformer-CTC family: the encoder's TIME
axis sharded across a ('seq',) mesh axis.

Long-context axis of the mesh vocabulary (data / model / pipe / seq). Every
device holds a (B, T'/S, d) slice of the activations through all blocks:
LayerNorms and FFNs are position-local (no communication at all), and
attention computes queries locally against the ALL-GATHERED keys/values —
one jax.lax.all_gather of k/v per block over ICI, scores (B, h, T'/S, T')
per device. This is the standard gather-based sequence parallelism; ring
attention would stream k/v blocks via ppermute instead of gathering (the
right choice when T' itself no longer fits — not the regime of
seconds-long utterances, so the simple collective wins here).

The frontend (featurize -> subsample -> input projection) is computed
replicated (cheap relative to the blocks) and sliced per device; the CTC
head + loss run on the all-gathered final states, replicated (the loss's
O(T'·U) lattice is small next to one block). The whole thing is ONE
differentiable shard_map program — the all_gather transposes to
reduce-scatter in the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models.bilstm_ctc import linear
from ..models.transformer_ctc import _layer_norm, frontend
from ..ops.ctc import ctc_loss_terms
from ..ops.features import extract_features


def _mhsa_seq(p: dict, x_local: jnp.ndarray, key_bias: jnp.ndarray,
              num_heads: int) -> jnp.ndarray:
    """Masked MHSA with time-sharded activations.

    x_local: (B, T_loc, d) this device's query slice; key_bias: (B,1,1,T)
    additive f32 over the FULL key axis (replicated). k/v are all-gathered
    over 'seq'.
    """
    B, T_loc, d = x_local.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x_local).reshape(B, T_loc, 3, num_heads, dh)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2)  # (B, h, T_loc, dh)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    # (B, h, T, dh): concatenate every device's key/value slice
    k = jax.lax.all_gather(k, "seq", axis=2, tiled=True)
    v = jax.lax.all_gather(v, "seq", axis=2, tiled=True)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / dh ** 0.5) + key_bias
    attn = jax.nn.softmax(scores, axis=-1).astype(x_local.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=x_local.dtype)
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T_loc, d)
    return linear(p["attn_out"], ctx)


def make_sequence_parallel_loss(cfg: Config, mesh: Mesh,
                                dropout: bool = False):
    """Build loss_fn(params, wave, num_samples, labels, label_lens
    [, dropout_rng]) -> scalar mean CTC loss with the encoder time axis
    sharded on 'seq'. params are the ordinary transformer_ctc params,
    replicated.

    The mesh may compose a 'data' axis (dp x sp): the batch arrives sharded
    on 'data' and the loss num/den psum over both axes for the exact global
    ragged mean. With dropout=True the function takes a trailing rng key
    and mirrors the dense encoder's dropout pattern (frontend + 2 per
    block), with masks consistent across the seq shards of one activation
    (frontend) and decorrelated across (data shard, seq shard) elsewhere.
    """
    from ..models.bilstm_ctc import _dropout
    from ..train import _shard_map

    tcfg = cfg.transformer
    S = mesh.shape["seq"]
    has_data = "data" in mesh.axis_names
    red = tuple(a for a in ("seq", "data") if a in mesh.axis_names)

    def local(params, wave, num_samples, labels, label_lens, drng):
        s_idx = jax.lax.axis_index("seq")
        if dropout:
            # frontend rng: same across seq shards (the pre-slice
            # activation must drop consistently), unique per data shard
            front_rng = (jax.random.fold_in(drng,
                                            jax.lax.axis_index("data"))
                         if has_data else drng)
            blk_rng = jax.random.fold_in(front_rng, 1 + s_idx)
        # replicated frontend (identical on every device; shared with the
        # dense encoder — transformer_ctc.frontend), T' padded to S, then
        # this device slices its time chunk
        feats, mask, frame_lens = extract_features(wave, num_samples,
                                                   cfg.features)
        x, out_mask, out_lens = frontend(params, feats, mask, frame_lens,
                                         cfg.model, tcfg,
                                         pad_to_multiple=S)
        if dropout and tcfg.dropout > 0.0:
            x = _dropout(x, tcfg.dropout, jax.random.fold_in(front_rng, 0),
                         True)
        T_loc = x.shape[1] // S
        x = jax.lax.dynamic_slice_in_dim(x, s_idx * T_loc, T_loc, axis=1)

        key_bias = jnp.where(out_mask, 0.0,
                             -1e9).astype(jnp.float32)[:, None, None, :]
        for j, blk in enumerate(params["blocks"]):
            h = _mhsa_seq(blk, _layer_norm(blk["ln1"], x), key_bias,
                          tcfg.num_heads)
            if dropout and tcfg.dropout > 0.0:
                h = _dropout(h, tcfg.dropout,
                             jax.random.fold_in(blk_rng, 2 * j), True)
            x = x + h
            h = linear(blk["ffn_out"],
                       jax.nn.gelu(linear(blk["ffn_in"],
                                          _layer_norm(blk["ln2"], x))))
            if dropout and tcfg.dropout > 0.0:
                h = _dropout(h, tcfg.dropout,
                             jax.random.fold_in(blk_rng, 2 * j + 1), True)
            x = x + h

        # head + loss on the gathered full sequence — computed on device 0
        # ONLY (lax.cond), then psum'd to every device. Running it
        # replicated would not just waste compute: differentiating through
        # shard_map psums per-device cotangents for replicated params, so S
        # identical head computations would overcount the head grads S×.
        # With a single producer, every replicated-param cotangent has
        # exactly one contribution, and the block cotangents route back to
        # their source devices through the all_gather transposes
        # (reduce-scatter).
        x = jax.lax.all_gather(x, "seq", axis=1, tiled=True)  # (B, Ts, d)

        def head_loss(x):
            z = _layer_norm(params["ln_final"], x)
            logits = linear(params["ctc_head"], z)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp = lp * out_mask.astype(jnp.float32)[:, :, None]
            return ctc_loss_terms(lp, out_lens, labels, label_lens)

        num, den = jax.lax.cond(
            s_idx == 0, head_loss,
            lambda x: (jnp.float32(0.0), jnp.float32(0.0)), x)
        # only seq-shard 0 contributes; the 'data' reduction (when
        # composed) makes this the exact global ragged batch mean
        num = jax.lax.psum(num, red)
        den = jax.lax.psum(den, red)
        return num / jnp.maximum(den, 1.0)

    bspec = P("data") if has_data else P()
    sharded = _shard_map(local, mesh,
                         in_specs=(P(), bspec, bspec, bspec, bspec, P()),
                         out_specs=P())
    if dropout:
        return sharded

    def no_rng(params, wave, num_samples, labels, label_lens):
        return sharded(params, wave, num_samples, labels, label_lens,
                       jax.random.PRNGKey(0))

    return no_rng


def make_sequence_parallel_grad_fn(cfg: Config, mesh: Mesh):
    """jitted (loss, grads); the all_gathers transpose to reduce-scatters
    in the backward pass, and replicated-param grads come out replicated."""
    sm = make_sequence_parallel_loss(cfg, mesh)

    def vg(params, wave, num_samples, labels, label_lens):
        return jax.value_and_grad(sm)(params, wave, num_samples, labels,
                                      label_lens)

    return jax.jit(vg)
