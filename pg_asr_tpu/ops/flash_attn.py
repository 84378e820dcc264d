"""Tiled (flash) multi-head self-attention for the encoder families.

The dense MHSA path (models/transformer_ctc.py:_mhsa) materializes the
(B, H, T, T) f32 score tensor in HBM twice per layer (softmax input in the
forward, again in the backward): at the bench shapes (B=64, H=4, T'=250)
that is ~64 MB of f32 traffic per layer per direction — pure HBM bandwidth
with no MXU work attached. This wrapper runs the attention through JAX's
Pallas TPU flash-attention kernel instead (online-softmax tiling: scores
live only in VMEM blocks, never in HBM), with padding expressed as
segment ids (valid=1, pad=0 — queries attend only keys of the same
segment, exactly the dense path's additive -1e9 key bias).

Semantics notes (why this is drop-in):
  * padded QUERY rows attend only padded keys; their outputs are garbage
    but finite, and every consumer masks by out_mask/out_lens downstream —
    identical to the dense path, whose padded query rows attend valid keys
    (also garbage, also masked).
  * the kernel computes softmax in f32 with a numerically-stable running
    max, same as the dense path's f32 softmax.
  * the kernel ships a custom VJP (training-safe) and composes with
    jax.checkpoint (--remat).

Constraints: T must be a multiple of the 128-frame block size (callers pad
T' up — the pad is semantics-free, see models/transformer_ctc.py frontend)
and the backend must be TPU; otherwise `available()` says no and callers
keep the dense einsum path (CPU tests, 8-virtual-device dryruns, streaming
windows of odd length all stay on dense).

Opt-in via TransformerConfig/ConformerConfig.flash_attention (CLI
--flash_attention). MEASURED AND IT LOSES at the d=256 bench shapes
(r5, benchmarks/conformer_breakdown.py, v5e): conformer full train step
12.97 ms dense vs 27.04 ms flash (B=64, h=4, T'=201→pad 256, dh=64) —
the block-grid padding and dh=64 half-filled lanes cost far more than
the 41 MB dense score tensor's HBM traffic, which XLA's fused
masked-softmax already streams near roofline. Kept opt-in for large-T
regimes (the score tensor grows as T'^2; the crossover is beyond the
bench shapes), with this header as the honest record — same treatment
as ops/quant.py / ops/pallas_joint.py.
Capability context: generalizes the reference's attention
(reference model.py:58-94) like the dense path does; this is purely a
memory-layout optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 128  # the TPU kernel's default q/k block size


def pad_multiple() -> int:
    """Time-axis multiple callers must pad T' to before calling mhsa()."""
    return _BLOCK


def available(T: int) -> bool:
    """Can the kernel run here (TPU backend, block-aligned seq len)?"""
    return T % _BLOCK == 0 and jax.default_backend() == "tpu"


def mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         valid_mask: jnp.ndarray, sm_scale: float) -> jnp.ndarray:
    """Masked MHSA via the Pallas flash kernel.

    q/k/v: (B, H, T, dh) in the compute dtype; valid_mask: (B, T) bool
    (True = real frame). Returns the context (B, H, T, dh) in q's dtype.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    seg = valid_mask.astype(jnp.int32)  # valid=1, pad=0
    ctx = flash_attention(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=sm_scale)
    return ctx.astype(q.dtype)
