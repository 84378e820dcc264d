"""Weight-only int8 post-training quantization for serving/export.

What it buys (measured on a v5e, 202M-param transformer_large):
  * exported artifacts shrink ~4x (the baked-in StableHLO constants are
    int8 + per-channel f32 scales instead of f32 weights) — the
    deployment-size win is the real payoff;
  * LATENCY IS A MEASURED NEGATIVE on current XLA/TPU at B=1: bf16 0.59 ms
    vs int8 0.60 ms per call at T'=125, and 0.64 vs 0.71 ms at T'=25
    (streaming-chunk regime, anti-hoist perturbation protocol). XLA-TPU
    materializes the dequantized weights instead of fusing the
    int8->bf16 convert into the dot's operand stream, so HBM traffic is
    int8-read + bf16-write + bf16-read — the 2x bandwidth saving never
    lands. An isolated scan-over-layers FFN stack DID show 1.21x (the
    per-layer slice dequantizes into VMEM), so this is an XLA fusion
    limitation, not a law; revisit when dot-operand fusion improves.

Weight-only quantization (activations stay bf16/f32) keeps the MXU
matmul in its native floating path and is near-lossless: per-channel
symmetric scales bound the element error by scale/2, and the dequantized
matmul differs from the original by <1% relative on real weight
magnitudes (tests/test_quant.py).

Tree transform, not a model rewrite: `quantize_tree` replaces every
float leaf with ndim >= 2 by {"q8": int8, "s": f32 scales}; biases,
norms, and other 1-D leaves stay float. `dequantize_tree` runs INSIDE
the jitted serving function; the int8 copy is what lives in the
serialized artifact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

def quantize_array(w: jnp.ndarray) -> dict:
    """Symmetric int8 with per-output-channel scales (last axis = output
    channels, the convention of every matmul/embedding table in this
    codebase: linear (in, out), LSTM (in, 4H), embeddings (A, E)).

    The leaf is all-arrays (the original dtype rides along as a zero-size
    array "d") so quantized trees pass through jit/pjit as arguments."""
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return {"q8": q.astype(jnp.int8), "s": scale,
            "d": jnp.zeros((0,), w.dtype)}


def dequantize_array(leaf: dict, dtype=None) -> jnp.ndarray:
    out_dtype = jnp.dtype(dtype) if dtype is not None else leaf["d"].dtype
    # int8 -> compute dtype, then scale; both ops fuse into the consumer
    return (leaf["q8"].astype(out_dtype)
            * leaf["s"].astype(out_dtype))


def is_quantized_leaf(x: Any) -> bool:
    return isinstance(x, dict) and "q8" in x and "s" in x


def quantize_tree(params, min_size: int = 1024):
    """Quantize every float leaf with ndim >= 2 and >= min_size elements
    (tiny tensors aren't worth the dequant epilogue)."""
    def q(x):
        if (hasattr(x, "ndim") and x.ndim >= 2 and x.size >= min_size
                and jnp.issubdtype(x.dtype, jnp.floating)):
            return quantize_array(x)
        return x
    return jax.tree_util.tree_map(q, params)


def dequantize_tree(qparams, dtype=None):
    """Inverse of quantize_tree; call INSIDE jit so XLA fuses the int8
    reads into consumers (the int8 copy stays the HBM-resident one)."""
    return jax.tree_util.tree_map(
        lambda x: dequantize_array(x, dtype) if is_quantized_leaf(x) else x,
        qparams, is_leaf=is_quantized_leaf)


def tree_bytes(params) -> int:
    """Parameter bytes as stored (int8 leaves count 1 byte/elem + scales)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * jnp.dtype(leaf.dtype).itemsize
    return total
