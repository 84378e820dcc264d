"""Transformer-CTC acoustic model: the non-recurrent encoder family.

Capability-wise this is a second take on the reference's acoustic encoder
(reference model.py:34-56 — norm, input projection, recurrent stack) that
the flagship BiLSTM family mirrors structurally; here the recurrence is
replaced by self-attention because the BiLSTM's sequential per-step matmul
chain is the measured throughput floor on TPU (docs/PERF.md). Everything
downstream (CTC head/loss, greedy + prefix-beam decoding, CER/WER,
REINFORCE fine-tuning) is shared with the flagship family unchanged.

TPU-first design decisions:
  * subsampling = frame STACKING: pad T to a multiple of `subsample`,
    reshape (B, T, F) -> (B, T/s, s*F), one Linear to d_model. A reshape +
    matmul is pure MXU work — no strided convs, no gathers. Output frame i
    covers input frames [i*s, (i+1)*s); it is valid iff any covered frame
    is valid, so out_len = ceil(frame_len / s).
  * pre-LN blocks (LN -> MHSA -> +res, LN -> FFN(gelu) -> +res): stable in
    bf16 without warmup tricks; LayerNorm and softmax run in f32, matmuls
    in the configured compute dtype.
  * padding handled by ONE additive f32 key-mask bias on the attention
    scores plus a final output mask — static shapes throughout, jit/pjit
    friendly, batch-padding invariant (tested).
  * sinusoidal positions (no params): checkpoint-size independent of the
    trained sequence length, any T' at inference.

Init parity with the framework convention: Xavier-normal weights, bias 0.1
(reference model.py:19-25), LayerNorm at (scale=1, bias=0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TransformerConfig
from .bilstm_ctc import _dropout, init_linear, linear, normalize_features


def _init_ln(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _layer_norm(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm in f32 regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_encoder_params(key, mcfg: ModelConfig, tcfg: TransformerConfig) -> dict:
    """Encoder-only parameters (no CTC head) — shared with the transducer
    family (models/transducer.py), which puts its own joint network on top."""
    dtype = jnp.dtype(mcfg.dtype)
    d = tcfg.d_model
    keys = jax.random.split(key, 4 * tcfg.num_layers + 2)
    params = {
        "input_proj": init_linear(keys[0], tcfg.subsample * mcfg.input_dim,
                                  d, dtype),
        "blocks": [],
        "ln_final": _init_ln(d),
    }
    for i in range(tcfg.num_layers):
        k = keys[2 + 4 * i : 6 + 4 * i]
        params["blocks"].append({
            "ln1": _init_ln(d),
            "qkv": init_linear(k[0], d, 3 * d, dtype),
            "attn_out": init_linear(k[1], d, d, dtype),
            "ln2": _init_ln(d),
            "ffn_in": init_linear(k[2], d, tcfg.ffn_dim, dtype),
            "ffn_out": init_linear(k[3], tcfg.ffn_dim, d, dtype),
        })
    return params


def init_params(key, mcfg: ModelConfig, tcfg: TransformerConfig) -> dict:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, mcfg, tcfg)
    params["ctc_head"] = init_linear(k_head, tcfg.d_model, mcfg.vocab_size,
                                     jnp.dtype(mcfg.dtype))
    return params


def _posenc(T: int, d: int, dtype, offset=0) -> jnp.ndarray:
    """Standard sinusoidal positional encoding, (T, d). `offset` shifts the
    absolute positions (streaming windows start mid-utterance; may be a
    traced scalar)."""
    pos = (jnp.arange(T, dtype=jnp.float32) + offset)[:, None]
    half = d // 2
    freq = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                   / half)
    ang = pos * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1).astype(dtype)


def _mhsa(p: dict, x: jnp.ndarray, key_bias: jnp.ndarray,
          num_heads: int, flash_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked multi-head self-attention. x: (B, T, d); key_bias: (B, 1, 1, T)
    additive f32 (-inf on padded keys). flash_mask (B, T) bool non-None
    routes through the Pallas flash kernel (ops/flash_attn.py) instead of
    materializing the (B, H, T, T) scores — callers pass it only when the
    kernel can run (TPU, block-aligned T)."""
    B, T, d = x.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x).reshape(B, T, 3, num_heads, dh)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2)  # (B, h, T, dh)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    if flash_mask is not None:
        from ..ops import flash_attn
        ctx = flash_attn.mhsa(q, k, v, flash_mask, 1.0 / dh ** 0.5)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / dh ** 0.5) + key_bias
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=x.dtype)
    ctx = jnp.swapaxes(ctx, 1, 2).reshape(B, T, d)
    return linear(p["attn_out"], ctx)


def subsampled_lens(frame_lens: jnp.ndarray, subsample: int) -> jnp.ndarray:
    """Output lengths after frame stacking: ceil(len / s)."""
    return -(-frame_lens // subsample)


def frontend(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
             frame_lens: jnp.ndarray, mcfg: ModelConfig,
             tcfg: TransformerConfig, pad_to_multiple: int = 1,
             pos_offset=0, pre_normalized: bool = False):
    """Shared pre-block pipeline: masked normalization -> frame-stacking
    subsample -> input projection + sinusoidal positions. Reused by the
    sequence-parallel and MoE encoders (parallel/sequence.py,
    parallel/moe.py) so the three stay in lockstep.

    Returns (x (B, T', d), out_mask (B, T') bool, out_lens (B,)); T' is
    additionally padded up to pad_to_multiple (sequence parallelism needs
    T' divisible by the mesh axis). Streaming (serving.py) passes
    pre_normalized=True (it normalizes with running/CMVN stats) and a
    pos_offset of the window's absolute first subframe."""
    dtype = jnp.dtype(mcfg.dtype)
    mask = frame_mask.astype(dtype)
    x = (feats.astype(dtype) if pre_normalized
         else normalize_features(feats.astype(dtype), mask))

    # frame stacking: (B, T, F) -> (B, T', s*F); zero-pad the time tail
    B, T, F = x.shape
    s = tcfg.subsample
    Tp = -(-T // s) * s
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    To = Tp // s
    x = x.reshape(B, To, s * F)
    if pad_to_multiple > 1:
        Ts = -(-To // pad_to_multiple) * pad_to_multiple
        if Ts != To:
            x = jnp.pad(x, ((0, 0), (0, Ts - To), (0, 0)))
        To = Ts
    out_lens = subsampled_lens(frame_lens, s)
    out_mask = (jnp.arange(To)[None, :] < out_lens[:, None])
    x = linear(params["input_proj"], x) + _posenc(To, tcfg.d_model, dtype,
                                                  offset=pos_offset)
    return x, out_mask, out_lens


def encode(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
           frame_lens: jnp.ndarray, mcfg: ModelConfig, tcfg: TransformerConfig,
           train: bool = False, dropout_rng=None, pos_offset=0,
           pre_normalized: bool = False):
    """Encoder-only forward: (B, T, F) features -> (states (B, T', d),
    out_mask (B, T') bool, out_lens (B,)) with T' = ceil(T / subsample)."""
    from ..ops import flash_attn
    pad_to = flash_attn.pad_multiple() if tcfg.flash_attention else 1
    x, out_mask, out_lens = frontend(params, feats, frame_mask, frame_lens,
                                     mcfg, tcfg, pad_to_multiple=pad_to,
                                     pos_offset=pos_offset,
                                     pre_normalized=pre_normalized)
    n_rngs = tcfg.num_layers * 2 + 1
    rngs = (jax.random.split(dropout_rng, n_rngs)
            if (train and dropout_rng is not None) else [None] * n_rngs)
    x = _dropout(x, tcfg.dropout, rngs[0], train)

    flash_mask = (out_mask if tcfg.flash_attention
                  and flash_attn.available(x.shape[1]) else None)
    key_bias = jnp.where(out_mask, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]
    for i, blk in enumerate(params["blocks"]):
        def block_fn(x, blk=blk, r1=rngs[1 + 2 * i], r2=rngs[2 + 2 * i]):
            h = _mhsa(blk, _layer_norm(blk["ln1"], x), key_bias,
                      tcfg.num_heads, flash_mask=flash_mask)
            x = x + _dropout(h, tcfg.dropout, r1, train)
            h = linear(blk["ffn_out"],
                       jax.nn.gelu(linear(blk["ffn_in"],
                                          _layer_norm(blk["ln2"], x))))
            return x + _dropout(h, tcfg.dropout, r2, train)

        # --remat: recompute the block in the backward pass instead of
        # keeping its activations (O(1) blocks live instead of O(layers))
        x = jax.checkpoint(block_fn)(x) if mcfg.remat else block_fn(x)

    x = _layer_norm(params["ln_final"], x)
    return x, out_mask, out_lens


@partial(jax.jit, static_argnames=("mcfg", "tcfg", "train"))
def apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
          frame_lens: jnp.ndarray, mcfg: ModelConfig, tcfg: TransformerConfig,
          train: bool = False, dropout_rng=None):
    """(B, T, F) features -> ((B, T', A) CTC log-probs, out_mask (B, T'),
    out_lens (B,)) with T' = ceil(T / subsample)."""
    x, out_mask, out_lens = encode(params, feats, frame_mask, frame_lens,
                                   mcfg, tcfg, train=train,
                                   dropout_rng=dropout_rng)
    logits = linear(params["ctc_head"], x)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    omask_f = out_mask.astype(jnp.float32)
    return log_probs * omask_f[:, :, None], omask_f, out_lens
