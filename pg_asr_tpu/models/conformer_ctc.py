"""Conformer-CTC acoustic model: convolution-augmented attention encoder.

Third take on the reference's acoustic encoder capability (reference
model.py:34-56 — norm, input projection, recurrent stack): the Conformer
block (Gulati et al. 2020) pairs self-attention (global context) with a
depthwise convolution module (local context), which is the standard
high-accuracy ASR encoder today. Everything downstream — CTC head/loss,
greedy + prefix-beam decoding, CER/WER, REINFORCE fine-tuning — is shared
with the other CTC families via `models.acoustic_forward`.

TPU-first design decisions (vs a literal Conformer port):
  * subsampling = frame STACKING (reshape + one matmul, shared rationale
    with models/transformer_ctc.py): pure MXU work, no strided convs.
  * ROTARY position embedding in the attention instead of Transformer-XL
    relative-position attention: rel-pos needs per-offset embedding tables
    and a skewed gather/relative-shift, which lowers to T^2 gathers on TPU;
    rotary is two elementwise sin/cos multiplies that fuse into the qkv
    matmul's epilogue and keeps the score matmul a plain (B,h,T,dh)x(B,h,dh,T)
    MXU contraction. Same relative-offset property (q_i·k_j depends on i-j).
  * depthwise conv via ONE lax.conv_general_dilated with
    feature_group_count=d (XLA lowers this to a native TPU conv); padded
    frames are zeroed BEFORE the conv so no padding leaks into the kernel
    window — batch-padding invariance is tested.
  * per-frame LayerNorm in the conv module where the paper uses BatchNorm:
    batch statistics over ragged padded batches couple utterances and make
    train/eval semantics diverge; LN is mask-independent, f32, and fuses.
  * macaron half-step FFNs (0.5x residual weight), pre-LN everywhere,
    LN in f32, matmuls in the configured compute dtype (bf16 on TPU).
    Attention scores/softmax default to the compute dtype since r5
    (ConformerConfig.attn_softmax_bf16 — measured 5.7%/step faster with
    identical convergence, docs/PERF.md small-shape section; set False
    for f32-softmax parity with r4 training curves).

Init parity with the framework convention: Xavier-normal weights, bias 0.1
(reference model.py:19-25).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ConformerConfig, ModelConfig
from .bilstm_ctc import _dropout, init_linear, linear, normalize_features
from .transformer_ctc import _init_ln, _layer_norm, subsampled_lens


def init_encoder_params(key, mcfg: ModelConfig, ccfg: ConformerConfig) -> dict:
    """Encoder-only parameters (no CTC head) — shared with the transducer
    family (models/transducer.py), which puts its own joint network on top."""
    dtype = jnp.dtype(mcfg.dtype)
    d = ccfg.d_model
    keys = jax.random.split(key, 8 * ccfg.num_layers + 2)
    params = {
        "input_proj": init_linear(keys[0], ccfg.subsample * mcfg.input_dim,
                                  d, dtype),
        "blocks": [],
        "ln_final": _init_ln(d),
    }
    for i in range(ccfg.num_layers):
        k = keys[2 + 8 * i : 10 + 8 * i]
        std = (2.0 / (ccfg.conv_kernel + 2)) ** 0.5
        params["blocks"].append({
            "ln_ffn1": _init_ln(d),
            "ffn1_in": init_linear(k[0], d, ccfg.ffn_dim, dtype),
            "ffn1_out": init_linear(k[1], ccfg.ffn_dim, d, dtype),
            "ln_attn": _init_ln(d),
            "qkv": init_linear(k[2], d, 3 * d, dtype),
            "attn_out": init_linear(k[3], d, d, dtype),
            "ln_conv": _init_ln(d),
            "conv_in": init_linear(k[4], d, 2 * d, dtype),  # -> GLU
            # depthwise kernel (K, 1, d) for ('NWC','WIO','NWC') grouped conv
            "conv_dw": jax.random.normal(k[5], (ccfg.conv_kernel, 1, d),
                                         dtype) * std,
            "ln_mid": _init_ln(d),  # post-depthwise norm (paper: BatchNorm)
            "conv_out": init_linear(k[6], d, d, dtype),
            "ln_ffn2": _init_ln(d),
            "ffn2_in": init_linear(k[7], d, ccfg.ffn_dim, dtype),
            "ffn2_out": init_linear(jax.random.fold_in(k[7], 1),
                                    ccfg.ffn_dim, d, dtype),
        })
    return params


def init_params(key, mcfg: ModelConfig, ccfg: ConformerConfig) -> dict:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, mcfg, ccfg)
    params["ctc_head"] = init_linear(k_head, ccfg.d_model, mcfg.vocab_size,
                                     jnp.dtype(mcfg.dtype))
    return params


def _rotary(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary position embedding over the last dim of (B, h, T, dh).

    Rotates dimension pairs (2i, 2i+1) of position t by t * 10000^(-2i/dh):
    elementwise sin/cos multiplies only — no tables, no gathers, and
    q_rot·k_rot depends on positions only through their offset.
    """
    B, h, T, dh = x.shape
    half = dh // 2
    freq = jnp.exp(-jnp.log(10000.0)
                   * jnp.arange(half, dtype=jnp.float32) / half)
    ang = jnp.arange(T, dtype=jnp.float32)[:, None] * freq[None, :]  # (T, half)
    cos = jnp.cos(ang).astype(x.dtype)[None, None]
    sin = jnp.sin(ang).astype(x.dtype)[None, None]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _mhsa_rotary(p: dict, x: jnp.ndarray, key_bias: jnp.ndarray,
                 num_heads: int,
                 flash_mask: jnp.ndarray | None = None,
                 softmax_bf16: bool = False) -> jnp.ndarray:
    """Masked multi-head self-attention with rotary positions.
    x: (B, T, d); key_bias: (B, 1, 1, T) additive f32 (-1e9 on padded keys).
    flash_mask (B, T) bool non-None routes through the Pallas flash kernel
    (ops/flash_attn.py) — rotary rotates q/k up front, so it composes with
    any attention implementation. softmax_bf16 keeps scores+softmax in the
    compute dtype (ConformerConfig.attn_softmax_bf16: measured 5.7%/step
    faster at bench shapes, benchmarks/attn_softmax_ab.py; max-subtract
    keeps the exp stable over <= a few hundred keys)."""
    B, T, d = x.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x).reshape(B, T, 3, num_heads, dh)
    q = _rotary(jnp.swapaxes(qkv[:, :, 0], 1, 2))  # (B, h, T, dh)
    k = _rotary(jnp.swapaxes(qkv[:, :, 1], 1, 2))
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    if flash_mask is not None:
        from ..ops import flash_attn
        ctx = flash_attn.mhsa(q, k, v, flash_mask, 1.0 / dh ** 0.5)
    else:
        score_t = x.dtype if softmax_bf16 else jnp.float32
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=score_t)
        scores = scores * (1.0 / dh ** 0.5) + key_bias.astype(score_t)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=x.dtype)
    return linear(p["attn_out"], jnp.swapaxes(ctx, 1, 2).reshape(B, T, d))


def _conv_module(p: dict, x: jnp.ndarray, mask: jnp.ndarray,
                 kernel: int) -> jnp.ndarray:
    """Conformer convolution module: pointwise(d->2d) -> GLU -> depthwise
    conv (SAME, masked input) -> LN -> swish -> pointwise(d->d).
    x: (B, T, d); mask: (B, T) in the compute dtype."""
    h = linear(p["conv_in"], x)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    # zero padded frames so the kernel window never reads across the pad
    h = h * mask[:, :, None]
    pad = (kernel - 1) // 2
    h = jax.lax.conv_general_dilated(
        h, p["conv_dw"],
        window_strides=(1,),
        padding=[(pad, kernel - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1],
    )
    h = _layer_norm(p["ln_mid"], h)
    h = h * jax.nn.sigmoid(h)  # swish
    return linear(p["conv_out"], h)


def encode(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
           frame_lens: jnp.ndarray, mcfg: ModelConfig, ccfg: ConformerConfig,
           train: bool = False, dropout_rng=None,
           pre_normalized: bool = False):
    """Encoder-only forward: (B, T, F) features -> (states (B, T', d),
    out_mask (B, T') bool, out_lens (B,)) with T' = ceil(T / subsample).

    pre_normalized=True (streaming, serving.py): the caller normalized with
    running/CMVN stats. Rotary attention depends on positions only through
    offsets, so windows need no absolute-position plumbing here."""
    dtype = jnp.dtype(mcfg.dtype)
    mask = frame_mask.astype(dtype)
    x = (feats.astype(dtype) if pre_normalized
         else normalize_features(feats.astype(dtype), mask))

    # frame stacking: (B, T, F) -> (B, T', s*F); zero-pad the time tail
    B, T, F = x.shape
    s = ccfg.subsample
    Tp = -(-T // s) * s
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    To = Tp // s
    x = x.reshape(B, To, s * F)
    if ccfg.flash_attention:
        # the flash kernel needs T' block-aligned; the pad is
        # semantics-free (masked everywhere, conv input zeroed)
        from ..ops import flash_attn
        m = flash_attn.pad_multiple()
        Ts = -(-To // m) * m
        if Ts != To:
            x = jnp.pad(x, ((0, 0), (0, Ts - To), (0, 0)))
        To = Ts
    out_lens = subsampled_lens(frame_lens, s)
    out_mask = (jnp.arange(To)[None, :] < out_lens[:, None])
    omask = out_mask.astype(dtype)

    x = linear(params["input_proj"], x)
    n_rngs = ccfg.num_layers * 4 + 1
    rngs = (jax.random.split(dropout_rng, n_rngs)
            if (train and dropout_rng is not None) else [None] * n_rngs)
    x = _dropout(x, ccfg.dropout, rngs[0], train)

    from ..ops import flash_attn
    flash_mask = (out_mask if ccfg.flash_attention
                  and flash_attn.available(x.shape[1]) else None)
    key_bias = jnp.where(out_mask, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]
    for i, blk in enumerate(params["blocks"]):
        def block_fn(x, blk=blk, r=rngs[1 + 4 * i: 5 + 4 * i]):
            h = linear(blk["ffn1_out"],
                       jax.nn.silu(linear(blk["ffn1_in"],
                                          _layer_norm(blk["ln_ffn1"], x))))
            x = x + 0.5 * _dropout(h, ccfg.dropout, r[0], train)
            h = _mhsa_rotary(blk, _layer_norm(blk["ln_attn"], x), key_bias,
                             ccfg.num_heads, flash_mask=flash_mask,
                             softmax_bf16=getattr(ccfg, "attn_softmax_bf16",
                                                  False))
            x = x + _dropout(h, ccfg.dropout, r[1], train)
            h = _conv_module(blk, _layer_norm(blk["ln_conv"], x), omask,
                             ccfg.conv_kernel)
            x = x + _dropout(h, ccfg.dropout, r[2], train)
            h = linear(blk["ffn2_out"],
                       jax.nn.silu(linear(blk["ffn2_in"],
                                          _layer_norm(blk["ln_ffn2"], x))))
            return x + 0.5 * _dropout(h, ccfg.dropout, r[3], train)

        # --remat: recompute the block in the backward pass (O(1) blocks
        # of live activations instead of O(layers))
        x = jax.checkpoint(block_fn)(x) if mcfg.remat else block_fn(x)

    x = _layer_norm(params["ln_final"], x)
    return x, out_mask, out_lens


@partial(jax.jit, static_argnames=("mcfg", "ccfg", "train"))
def apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
          frame_lens: jnp.ndarray, mcfg: ModelConfig, ccfg: ConformerConfig,
          train: bool = False, dropout_rng=None):
    """(B, T, F) features -> ((B, T', A) CTC log-probs, out_mask (B, T'),
    out_lens (B,)) with T' = ceil(T / subsample)."""
    x, out_mask, out_lens = encode(params, feats, frame_mask, frame_lens,
                                   mcfg, ccfg, train=train,
                                   dropout_rng=dropout_rng)
    logits = linear(params["ctc_head"], x)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    omask_f = out_mask.astype(jnp.float32)
    return log_probs * omask_f[:, :, None], omask_f, out_lens
