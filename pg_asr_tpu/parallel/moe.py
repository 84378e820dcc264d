"""Expert parallelism: a Mixture-of-Experts FFN transformer encoder with
the expert dimension sharded over an ('expert',) mesh axis.

Completes the framework's mesh vocabulary (data / model / pipe / seq /
expert). Each transformer block's dense FFN is replaced by E experts with
top-1 switch routing (Fedus et al. 2021), built gather-free the TPU way:

  * router: one (N, d) x (d, E) matmul + softmax; top-1 expert per token.
  * dispatch: tokens claim a slot among their expert's C capacity slots via
    an exclusive cumsum over the one-hot assignment matrix (no sort, no
    scatter); overflowing tokens fall through on the residual path (their
    combine row is zero) — standard switch semantics, static shapes.
  * expert compute: ONE einsum packs tokens into (E, C, d), the experts run
    as a single batched matmul pair over the leading E axis — the axis
    sharded P('expert') on the mesh, so XLA partitions the expert matmuls
    across devices and inserts the all-to-alls implied by the
    dispatch/combine einsums.
  * combine: the transpose einsum, scaled by the winning gate probability.
  * load-balance auxiliary loss (E * sum_e fraction_e * mean_prob_e) keeps
    routing from collapsing; returned alongside the CTC loss.

Exactness anchor (tested): with ONE expert and enough capacity the MoE
block IS the dense FFN (gate = softmax over one logit = 1), so the whole
encoder reproduces the dense transformer bit-for-bit; with many experts,
the ('expert', S) mesh reproduces the single-device MoE loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.bilstm_ctc import init_linear, linear
from ..models.transformer_ctc import (_init_ln, _layer_norm, _mhsa,
                                      frontend)
from ..ops.ctc import ctc_loss_terms
from ..ops.features import extract_features


def init_moe_params(key, cfg: Config, num_experts: int) -> dict:
    """Transformer encoder params with per-block MoE FFNs: router (d, E) +
    stacked expert kernels (E, d, ffn) / (E, ffn, d)."""
    mcfg, tcfg = cfg.model, cfg.transformer
    dtype = jnp.dtype(mcfg.dtype)
    d, f = tcfg.d_model, tcfg.ffn_dim
    keys = jax.random.split(key, 5 * tcfg.num_layers + 2)
    params = {
        "input_proj": init_linear(keys[0], tcfg.subsample * mcfg.input_dim,
                                  d, dtype),
        "blocks": [],
        "ln_final": _init_ln(d),
        "ctc_head": init_linear(keys[1], d, mcfg.vocab_size, dtype),
    }
    for i in range(tcfg.num_layers):
        k = keys[2 + 5 * i: 7 + 5 * i]
        std1 = (2.0 / (d + f)) ** 0.5
        params["blocks"].append({
            "ln1": _init_ln(d),
            "qkv": init_linear(k[0], d, 3 * d, dtype),
            "attn_out": init_linear(k[1], d, d, dtype),
            "ln2": _init_ln(d),
            "router": init_linear(k[2], d, num_experts, dtype),
            "w1": jax.random.normal(k[3], (num_experts, d, f), dtype) * std1,
            "b1": jnp.full((num_experts, f), 0.1, dtype),
            "w2": jax.random.normal(k[4], (num_experts, f, d), dtype) * std1,
            "b2": jnp.full((num_experts, d), 0.1, dtype),
        })
    return params


def moe_params_from_dense(params: dict, num_experts: int, key) -> dict:
    """Tile a dense transformer's FFN weights into every expert (test
    anchor: with 1 expert this is an exact dense equivalent)."""
    out = {kk: v for kk, v in params.items() if kk != "blocks"}
    out["blocks"] = []
    for i, blk in enumerate(params["blocks"]):
        e = dict(blk)
        w1 = jnp.broadcast_to(blk["ffn_in"]["w"][None],
                              (num_experts,) + blk["ffn_in"]["w"].shape)
        w2 = jnp.broadcast_to(blk["ffn_out"]["w"][None],
                              (num_experts,) + blk["ffn_out"]["w"].shape)
        e.pop("ffn_in"), e.pop("ffn_out")
        e["router"] = init_linear(jax.random.fold_in(key, i),
                                  blk["ffn_in"]["w"].shape[0], num_experts,
                                  blk["ffn_in"]["w"].dtype)
        e["w1"] = jnp.array(w1)
        e["b1"] = jnp.broadcast_to(blk["ffn_in"]["b"][None],
                                   (num_experts,) + blk["ffn_in"]["b"].shape)
        e["w2"] = jnp.array(w2)
        e["b2"] = jnp.broadcast_to(blk["ffn_out"]["b"][None],
                                   (num_experts,) + blk["ffn_out"]["b"].shape)
        out["blocks"].append(e)
    return out


def _moe_ffn(blk: dict, x: jnp.ndarray, token_valid: jnp.ndarray,
             capacity: int):
    """Switch-routed MoE FFN. x: (B, T, d), token_valid: (B, T) bool —
    padded frames neither route (they would claim capacity slots ahead of
    real tokens) nor count in the load-balance statistics.
    Returns (out (B, T, d), aux scalar)."""
    B, T, d = x.shape
    E = blk["router"]["w"].shape[1]
    N = B * T
    xt = x.reshape(N, d)
    tv = token_valid.reshape(N).astype(jnp.float32)  # (N,)
    logits = linear(blk["router"], xt).astype(jnp.float32)  # (N, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)  # (N,)
    gate = jnp.max(probs, axis=-1)  # (N,)
    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32) * tv[:, None]

    # slot within the chosen expert: exclusive cumsum of assignments
    pos = jnp.cumsum(onehot, axis=0) - onehot  # (N, E)
    pos_in = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # (N,)
    keep = pos_in < capacity
    slot = jax.nn.one_hot(pos_in, capacity, dtype=jnp.float32)  # (N, C)
    dispatch = (onehot[:, :, None] * slot[:, None, :]
                * keep[:, None, None].astype(jnp.float32))  # (N, E, C)

    xin = jnp.einsum("nec,nd->ecd", dispatch,
                     xt.astype(jnp.float32)).astype(x.dtype)  # (E, C, d)
    h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xin, blk["w1"],
                               preferred_element_type=x.dtype)
                    + blk["b1"][:, None, :])
    y = jnp.einsum("ecf,efd->ecd", h, blk["w2"],
                   preferred_element_type=x.dtype) + blk["b2"][:, None, :]
    out = jnp.einsum("nec,ecd->nd", dispatch, y.astype(jnp.float32))
    out = (out * gate[:, None]).astype(x.dtype).reshape(B, T, d)

    # switch load-balance loss over VALID tokens only (uniform -> 1.0)
    n_valid = jnp.maximum(jnp.sum(tv), 1.0)
    frac = jnp.sum(onehot, axis=0) / n_valid  # token fraction per expert
    mean_p = (jnp.sum(probs * tv[:, None], axis=0)
              / n_valid)                      # mean router prob per expert
    aux = E * jnp.sum(frac * mean_p)
    return out, aux


def moe_encode(params: dict, feats, frame_mask, frame_lens, cfg: Config,
               capacity: int, train: bool = False, dropout_rng=None):
    """Full MoE encoder forward, mirroring transformer_ctc.encode (same
    frontend, same dropout pattern) with the switch FFN in place of the
    dense FFN. Returns (x (B,T',d), out_mask, out_lens, aux_mean) where
    aux_mean is the load-balance loss averaged over blocks."""
    from ..models.bilstm_ctc import _dropout

    tcfg = cfg.transformer
    x, out_mask, out_lens = frontend(params, feats, frame_mask, frame_lens,
                                     cfg.model, tcfg)
    n_rngs = tcfg.num_layers * 2 + 1
    rngs = (jax.random.split(dropout_rng, n_rngs)
            if (train and dropout_rng is not None) else [None] * n_rngs)
    x = _dropout(x, tcfg.dropout, rngs[0], train)

    key_bias = jnp.where(out_mask, 0.0,
                         -1e9).astype(jnp.float32)[:, None, None, :]
    aux_total = jnp.float32(0.0)
    for i, blk in enumerate(params["blocks"]):
        h = _mhsa(blk, _layer_norm(blk["ln1"], x), key_bias, tcfg.num_heads)
        x = x + _dropout(h, tcfg.dropout, rngs[1 + 2 * i], train)
        h, aux = _moe_ffn(blk, _layer_norm(blk["ln2"], x), out_mask,
                          capacity)
        aux_total = aux_total + aux
        x = x + _dropout(h, tcfg.dropout, rngs[2 + 2 * i], train)
    x = _layer_norm(params["ln_final"], x)
    return x, out_mask, out_lens, aux_total / len(params["blocks"])


def moe_apply(params: dict, feats, frame_mask, frame_lens, cfg: Config,
              train: bool = False, dropout_rng=None):
    """(B,T,F) features -> ((B,T',A) CTC log-probs, out_mask f32,
    out_lens) — the MoE family's acoustic_forward contract, so every
    downstream component (greedy/beam decode, CER/WER, REINFORCE) works
    unchanged."""
    from ..models.bilstm_ctc import linear as _linear

    B, T, _ = feats.shape
    cap = moe_capacity(cfg, B, T, cfg.transformer.num_experts,
                       cfg.transformer.capacity_factor)
    x, out_mask, out_lens, _ = moe_encode(params, feats, frame_mask,
                                          frame_lens, cfg, cap, train=train,
                                          dropout_rng=dropout_rng)
    logits = _linear(params["ctc_head"], x)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    omask_f = out_mask.astype(jnp.float32)
    return log_probs * omask_f[:, :, None], omask_f, out_lens


def moe_loss_terms(params, feats, mask, frame_lens, labels, label_lens,
                   cfg: Config, train: bool = False, dropout_rng=None):
    """Stacked (num, den) components [ctc, aux] matching the framework's
    ragged num/den discipline: sum(num/den) = ctc_mean + aux_w * aux_mean,
    with the aux component token-weighted so cross-shard reductions stay
    meaningful. Takes FEATURES (post-SpecAugment), not raw waveforms."""
    B, T, _ = feats.shape
    tcfg = cfg.transformer
    cap = moe_capacity(cfg, B, T, tcfg.num_experts, tcfg.capacity_factor)
    x, out_mask, out_lens, aux = moe_encode(params, feats, mask, frame_lens,
                                            cfg, cap, train=train,
                                            dropout_rng=dropout_rng)
    logits = linear(params["ctc_head"], x)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = lp * out_mask.astype(jnp.float32)[:, :, None]
    num_c, den_c = ctc_loss_terms(lp, out_lens, labels, label_lens)
    nv = jnp.maximum(jnp.sum(out_mask.astype(jnp.float32)), 1.0)
    num = jnp.stack([num_c, tcfg.moe_aux_weight * aux * nv])
    den = jnp.stack([den_c, nv])
    return num, den


def moe_capacity(cfg: Config, batch: int, frames: int, num_experts: int,
                 capacity_factor: float) -> int:
    N = batch * (-(-frames // cfg.transformer.subsample))
    return max(int(np.ceil(N / num_experts * capacity_factor)), 1)


def make_moe_loss(cfg: Config, num_experts: int, capacity: int,
                  aux_weight: float = 0.01):
    """Build loss_fn(params, wave, num_samples, labels, label_lens) ->
    (ctc_mean + aux_weight * load_balance). jit/pjit-friendly: place the
    stacked expert leaves (w1/b1/w2/b2) with shard_moe_params on an
    ('expert',) mesh and XLA partitions the expert matmuls + inserts the
    dispatch/combine all-to-alls."""
    tcfg = cfg.transformer

    def loss_fn(params, wave, num_samples, labels, label_lens):
        feats, mask, frame_lens = extract_features(wave, num_samples,
                                                   cfg.features)
        # shared with the dense encoder (transformer_ctc.frontend)
        x, out_mask, out_lens = frontend(params, feats, mask, frame_lens,
                                         cfg.model, tcfg)
        key_bias = jnp.where(out_mask, 0.0,
                             -1e9).astype(jnp.float32)[:, None, None, :]
        aux_total = jnp.float32(0.0)
        for blk in params["blocks"]:
            h = _mhsa(blk, _layer_norm(blk["ln1"], x), key_bias,
                      tcfg.num_heads)
            x = x + h
            h, aux = _moe_ffn(blk, _layer_norm(blk["ln2"], x), out_mask,
                              capacity)
            aux_total = aux_total + aux
            x = x + h
        x = _layer_norm(params["ln_final"], x)
        logits = linear(params["ctc_head"], x)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = lp * out_mask.astype(jnp.float32)[:, :, None]
        num, den = ctc_loss_terms(lp, out_lens, labels, label_lens)
        ctc = num / jnp.maximum(den, 1.0)
        return ctc + aux_weight * aux_total / len(params["blocks"])

    return loss_fn


def moe_param_specs(mesh: Mesh):
    """PartitionSpec rules for the MoE parameter tree, composing the
    'expert' axis with Megatron tensor parallelism when the mesh also
    carries a live 'model' axis (dp x tp x ep): the expert stacks shard
    their leading E dim on 'expert' AND their ffn dim on 'model'
    (w1 column-parallel, w2 row-parallel — GSPMD inserts the one
    all-reduce per block at the combine), while the dense leaves (qkv /
    attn_out / input_proj / ctc_head) follow mesh.param_sharding_rules.
    The router stays replicated: its (d, E) output feeds an argmax over
    E, which must see all logits."""
    from .mesh import param_sharding_rules

    tp = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1
    expert_specs = {
        "w1": P("expert", None, "model") if tp else P("expert"),
        "b1": P("expert", "model") if tp else P("expert"),
        "w2": P("expert", "model", None) if tp else P("expert"),
        "b2": P("expert"),
    }
    dense = param_sharding_rules(mesh)

    def spec_for(path: tuple[str, ...]) -> P:
        leaf = path[-1]
        if leaf in expert_specs:
            return expert_specs[leaf]
        if len(path) >= 2 and path[-2] == "router":
            return P()
        return dense(path)

    return spec_for


def shard_moe_params(params: dict, mesh: Mesh) -> dict:
    """Place the MoE tree on the mesh per moe_param_specs (expert stacks
    on 'expert', dense leaves per the Megatron rules when 'model' is
    live, the rest replicated)."""
    spec_for = moe_param_specs(mesh)

    def place(path, leaf):
        names = tuple(str(getattr(k, "key", getattr(k, "idx", "")))
                      for k in path)
        return jax.device_put(leaf, NamedSharding(mesh, spec_for(names)))

    return jax.tree_util.tree_map_with_path(place, params)
