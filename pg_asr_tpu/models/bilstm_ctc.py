"""Flagship acoustic model: BiLSTM-CTC.

Structure parity with the reference encoder (reference model.py:34-56):
masked per-utterance feature normalization (<- InstanceNorm2d), input
Linear(F->proj) + leaky_relu + dropout, N stacked BiLSTM layers (hidden/dir,
inter-layer dropout), then the CTC head the reference never finished
(its active decoder returns None, reference model.py:117): Linear(2H -> A)
+ log_softmax, with alphabet index 0 = blank/pad.

Init parity: Xavier-normal weights, bias 0.1 on linear layers (reference
model.py:19-25); uniform(-1/sqrt(H), 1/sqrt(H)) on recurrent weights.

Pure-functional: params are a pytree dict; apply is jit/vmap/pjit friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.lstm import bilstm_layer, init_bilstm_params, resolve_use_pallas


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    std = (2.0 / (in_dim + out_dim)) ** 0.5  # Xavier normal
    w = jax.random.normal(key, (in_dim, out_dim), dtype) * std
    return {"w": w, "b": jnp.full((out_dim,), 0.1, dtype)}


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...i,io->...o", x, p["w"], preferred_element_type=x.dtype) + p["b"]


def init_encoder_params(key, cfg: ModelConfig) -> dict:
    """Encoder-only parameters (no CTC head) — shared with the transducer
    family (models/transducer.py)."""
    keys = jax.random.split(key, cfg.num_layers + 1)
    dtype = jnp.dtype(cfg.dtype)
    params = {
        "input_proj": init_linear(keys[0], cfg.input_dim, cfg.input_proj_dim, dtype),
        "lstm": [],
    }
    in_dim = cfg.input_proj_dim
    for i in range(cfg.num_layers):
        params["lstm"].append(init_bilstm_params(keys[1 + i], in_dim, cfg.hidden_size, dtype))
        in_dim = 2 * cfg.hidden_size
    return params


def init_params(key, cfg: ModelConfig) -> dict:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, cfg)
    params["ctc_head"] = init_linear(k_head, 2 * cfg.hidden_size,
                                     cfg.vocab_size, jnp.dtype(cfg.dtype))
    return params


def normalize_features(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked per-utterance normalization over (valid frames x channels).

    TPU-native analogue of the reference's InstanceNorm2d over the whole
    (features, time) plane of each utterance (reference model.py:37,48) —
    but mask-aware so padding doesn't pollute the statistics.
    """
    m = mask[:, :, None]
    count = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * feats.shape[-1], 1.0)
    mean = jnp.sum(feats * m, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(feats - mean) * m, axis=(1, 2), keepdims=True) / count
    return (feats - mean) * jax.lax.rsqrt(var + 1e-5) * m


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    # uint8 threshold mask, NOT bernoulli's f32 uniforms: 4x fewer random
    # bits per element. RNG was the largest non-matmul cost of the
    # transformer_large train step (~12% with the rbg generator, ~23%
    # with threefry — benchmarks/attn_breakdown.py); the drop probability
    # quantizes to 1/256, immaterial for regularization, and the keep
    # scaling uses the EXACT quantized probability so the mask stays
    # unbiased.
    # clamp the quantized threshold to [1, 255]: a rate in (0, 1) must
    # always drop something and keep something (rate < 1/512 would round
    # to thresh=0 = dropout silently OFF; rate ~1 would round to 256 =
    # keep_p 0 and a divide-by-zero in the keep branch)
    thresh = min(max(int(round(rate * 256.0)), 1), 255)
    keep_p = 1.0 - thresh / 256.0
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    return jnp.where(bits >= thresh, x / keep_p, 0.0)


def encode(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
           cfg: ModelConfig, train: bool = False, dropout_rng=None) -> jnp.ndarray:
    """Encoder-only forward: (B, T, F) features -> (B, T, 2H) states."""
    dtype = jnp.dtype(cfg.dtype)
    mask = frame_mask.astype(dtype)
    x = normalize_features(feats.astype(dtype), mask)
    x = jax.nn.leaky_relu(linear(params["input_proj"], x))
    rngs = (
        jax.random.split(dropout_rng, cfg.num_layers + 1)
        if (train and dropout_rng is not None)
        else [None] * (cfg.num_layers + 1)
    )
    x = _dropout(x, cfg.dropout, rngs[0], train)
    use_pallas = resolve_use_pallas(cfg.use_pallas_lstm)
    for i, layer in enumerate(params["lstm"]):
        x = bilstm_layer(layer, x, mask, use_pallas=use_pallas)
        if i < len(params["lstm"]) - 1:
            x = _dropout(x, cfg.dropout, rngs[i + 1], train)
    return x


@partial(jax.jit, static_argnames=("cfg", "train"))
def apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
          cfg: ModelConfig, train: bool = False, dropout_rng=None) -> jnp.ndarray:
    """Forward pass: (B, T, F) features -> (B, T, A) CTC log-probs."""
    mask = frame_mask.astype(jnp.dtype(cfg.dtype))
    x = encode(params, feats, frame_mask, cfg, train=train,
               dropout_rng=dropout_rng)
    logits = linear(params["ctc_head"], x)
    # log-softmax in f32 for numerical stability regardless of compute dtype
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return log_probs * mask.astype(jnp.float32)[:, :, None]


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
