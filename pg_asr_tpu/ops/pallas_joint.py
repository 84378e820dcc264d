"""Pallas fused RNN-T joint-lattice kernel (TPU): projections -> emission
log-probs without materializing the 4-D joint.

The unfused joint (models/transducer.py:joint_logits + ops/transducer.py:
joint_log_probs) materializes h = tanh(e + g) of shape (B, T, U+1, J) in
HBM (bf16 at bench shapes: 64x201x65x256 = 428 MB) plus the (B, T, U+1, A)
logits, reads them back for the head matmul / normalization, and stores h
again as an autodiff residual — the measured 3.6 ms of the 17 ms train step
(benchmarks/rnnt_breakdown.py: no-4d vs no-normalize vs full). All of that
traffic is avoidable: every lattice cell is a pure function of one row of
e (B, T, J) and one row of g (B, U+1, J), both tiny.

This kernel computes, per (batch row, T-tile) grid cell, entirely in VMEM:

    h   = tanh(e_tile[:, None, :] + g[None, :, :])      (Tb, U+1, J)
    z   = h @ W + bias                                   (Tb, U+1, A)
    lpb = z[..., 0]        - logsumexp(z)                (Tb, U+1)
    lpy = z[..., label[u]] - logsumexp(z)  (one-hot dot) (Tb, U)

and writes ONLY the two (B, T, U+1)/(B, T, U) f32 emission tables the
lattice loss consumes (ops/transducer.py:transducer_loss). HBM traffic
drops from ~1 GB to ~75 MB per step at bench shapes.

Backward (jax.custom_vjp): recomputes h and softmax(z) per tile (the
FlashAttention trade: recompute beats streaming a 428 MB residual), forms

    dz   = gb*onehot(0) + gy*onehot(label) - (gb+gy)*softmax(z)
    dpre = (dz @ W^T) * (1 - h^2)
    de   = sum_u dpre       dg += sum_t dpre   (accumulated over T-tiles)
    dW  += h^T @ dz         db += sum dz       (accumulated over the grid)

The dg/dW/db accumulations exploit the TPU grid's sequential execution:
their output blocks map to the same block across consecutive grid steps,
so they stay VMEM-resident and are initialized on the first visit
(standard Pallas reduction-over-grid pattern).

MEASURED RESULT (v5e, bench shapes B=64 T=201 U=64 J=256 A=32, bf16
inputs): this kernel is SLOWER than the unfused XLA composition — 19.2 ms
vs 3.9 ms fwd+bwd (fwd-only 7.1 vs 2.8 ms). XLA fuses tanh(e ⊕ g) into the
head matmul's operand and runs everything bf16 on the MXU, so the 4-D
traffic it does pay (~430 MB bf16 h + recompute in the backward) costs
~1 ms, while this kernel pays f32 VPU tanh over all B*T*(U+1)*J elements
and a 32/128 lane-padded head matmul per tile. The fusion the kernel
exists to provide, XLA already performs; the compute floor it cannot beat
is the VPU transcendental count. Kept as an OPT-IN
(TransducerConfig.fused_joint, default False) for shape regimes where the
4-D tensor genuinely blows HBM (very long T·U); the gate otherwise matches
the Pallas LSTM (ops/lstm.py:resolve_use_pallas), and interpret-mode
parity is tested on CPU (tests/test_pallas_joint.py). See docs/PERF.md
"RNN-T joint" — same honest-negative treatment as ops/quant.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# T rows per grid step. The in-kernel working set is O(Tb * (U+1) * J) f32
# (h, and in the backward also dpre/dh): Tb=8 at U+1=65, J=256 is ~2.1 MB
# per live tensor, comfortably inside VMEM with double-buffered streams.
T_BLK = int(os.environ.get("PGASR_JOINT_TBLK", "8"))


def _fwd_kernel(e_ref, g_ref, w_ref, b_ref, oh_ref, lpb_ref, lpy_ref):
    f32 = jnp.float32
    e = e_ref[0].astype(f32)                    # (Tb, J)
    g = g_ref[0].astype(f32)                    # (U1, J)
    Tb, J = e.shape
    U1 = g.shape[0]
    h = jnp.tanh(e[:, None, :] + g[None, :, :])  # (Tb, U1, J)
    hf = h.reshape(Tb * U1, J)
    z = jax.lax.dot_general(
        hf, w_ref[:].astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b_ref[0].astype(f32)  # (Tb*U1, A)
    m = jnp.max(z, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=-1, keepdims=True))
    lpb_ref[0] = (z[:, 0:1] - lse).reshape(Tb, U1)
    oh = oh_ref[0].astype(f32)                  # (U, A)
    U = oh.shape[0]
    A = z.shape[-1]
    z3 = z.reshape(Tb, U1, A)[:, :U, :]
    num = jnp.sum(z3 * oh[None, :, :], axis=-1)  # (Tb, U)
    lpy_ref[0] = num - lse.reshape(Tb, U1)[:, :U]


def _bwd_kernel(e_ref, g_ref, w_ref, b_ref, oh_ref, gb_ref, gy_ref,
                de_ref, dg_ref, dw_ref, db_ref):
    f32 = jnp.float32
    j = pl.program_id(1)
    first_cell = (pl.program_id(0) == 0) & (j == 0)

    e = e_ref[0].astype(f32)                    # (Tb, J)
    g = g_ref[0].astype(f32)                    # (U1, J)
    W = w_ref[:].astype(f32)                    # (J, A)
    Tb, J = e.shape
    U1 = g.shape[0]
    A = W.shape[1]
    U = U1 - 1

    h = jnp.tanh(e[:, None, :] + g[None, :, :])  # (Tb, U1, J)
    hf = h.reshape(Tb * U1, J)
    z = jax.lax.dot_general(
        hf, W, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b_ref[0].astype(f32)
    p = jax.nn.softmax(z, axis=-1).reshape(Tb, U1, A)

    gb = gb_ref[0].astype(f32)                  # (Tb, U1)
    gy = gy_ref[0].astype(f32)                  # (Tb, U)
    # pad-by-concat (Mosaic-safe): u = U has no label-advance cotangent
    gy1 = jnp.concatenate([gy, jnp.zeros((Tb, 1), f32)], axis=1)  # (Tb, U1)
    oh1 = jnp.concatenate([oh_ref[0].astype(f32),
                           jnp.zeros((1, A), f32)], axis=0)       # (U1, A)
    blank1 = (jax.lax.broadcasted_iota(jnp.int32, (1, A), 1) == 0
              ).astype(f32)
    dz = (gb[:, :, None] * blank1[None, :, :]
          + gy1[:, :, None] * oh1[None, :, :]
          - (gb + gy1)[:, :, None] * p)          # (Tb, U1, A)
    dzf = dz.reshape(Tb * U1, A)
    dh = jax.lax.dot_general(                    # dz @ W^T -> (Tb*U1, J)
        dzf, W, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dpre = dh.reshape(Tb, U1, J) * (1.0 - h * h)

    de_ref[0] = jnp.sum(dpre, axis=1)            # (Tb, J)

    dg_part = jnp.sum(dpre, axis=0)              # (U1, J)

    @pl.when(j == 0)
    def _():
        dg_ref[0] = dg_part

    @pl.when(j > 0)
    def _():
        dg_ref[0] += dg_part

    dw_part = jax.lax.dot_general(               # h^T @ dz -> (J, A)
        hf, dzf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db_part = jnp.sum(dzf, axis=0, keepdims=True)  # (1, A)

    @pl.when(first_cell)
    def _():
        dw_ref[:] = dw_part
        db_ref[:] = db_part

    @pl.when(jnp.logical_not(first_cell))
    def _():
        dw_ref[:] += dw_part
        db_ref[:] += db_part


def _pad_t(x, t_blk):
    T = x.shape[1]
    pad = (-T) % t_blk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x, T


def _cost(B, T, U1, J, A, bwd: bool = False):
    mul = 3 if bwd else 1  # bwd: recompute z + dh + dW matmuls
    return pl.CostEstimate(
        flops=mul * 2 * B * T * U1 * J * A,
        bytes_accessed=B * T * (J * 2 + U1 * 8),
        transcendentals=B * T * U1 * (J + A),
    )


def _fused_forward(e, g, W, bias, onehot, interpret):
    (e, T) = _pad_t(e, T_BLK)
    B, Tp, J = e.shape
    U1 = g.shape[1]
    U = onehot.shape[1]
    A = W.shape[1]
    nT = Tp // T_BLK
    lpb, lpy = pl.pallas_call(
        _fwd_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T_BLK, J), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, J), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, A), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T_BLK, U1), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_BLK, U), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, U1), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, U), jnp.float32),
        ],
        cost_estimate=_cost(B, Tp, U1, J, A),
        interpret=interpret,
    )(e, g, W, bias.reshape(1, A), onehot)
    return lpb[:, :T], lpy[:, :T]


def _fused_backward(e, g, W, bias, onehot, gb, gy, interpret):
    Treal = e.shape[1]
    e, _ = _pad_t(e, T_BLK)
    gb, _ = _pad_t(gb.astype(jnp.float32), T_BLK)  # zero rows: dz == 0
    gy, _ = _pad_t(gy.astype(jnp.float32), T_BLK)
    B, Tp, J = e.shape
    U1 = g.shape[1]
    U = onehot.shape[1]
    A = W.shape[1]
    nT = Tp // T_BLK
    de, dg, dW, db = pl.pallas_call(
        _bwd_kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, T_BLK, J), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, J), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, A), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_BLK, U1), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_BLK, U), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T_BLK, J), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, J), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, J), jnp.float32),
            jax.ShapeDtypeStruct((B, U1, J), jnp.float32),
            jax.ShapeDtypeStruct((J, A), jnp.float32),
            jax.ShapeDtypeStruct((1, A), jnp.float32),
        ],
        cost_estimate=_cost(B, Tp, U1, J, A, bwd=True),
        interpret=interpret,
    )(e, g, W, bias.reshape(1, A), onehot, gb, gy)
    return (de[:, :Treal].astype(e.dtype), dg.astype(g.dtype),
            dW.astype(W.dtype), db[0].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_joint_log_probs(e: jnp.ndarray, g: jnp.ndarray, W: jnp.ndarray,
                          bias: jnp.ndarray, onehot: jnp.ndarray,
                          interpret: bool = False):
    """Fused joint + normalization over the whole (T, U+1) lattice.

    Args:
      e: (B, T, J) encoder-side joint projections.
      g: (B, U+1, J) prediction-side joint projections.
      W: (J, A) joint head weight; bias: (A,) head bias.
      onehot: (B, U, A) one-hot of the 0-padded label ids (float).
    Returns:
      lp_blank (B, T, U+1) f32, lp_label (B, T, U) f32 — identical math to
      joint_log_probs(linear(joint_out, tanh(e ⊕ g)), labels) with the f32
      normalization applied to an f32-computed joint (the unfused bf16
      path rounds h and the logits to bf16 first).
    """
    return _fused_forward(e, g, W, bias, onehot, interpret)


def _vjp_fwd(e, g, W, bias, onehot, interpret):
    out = _fused_forward(e, g, W, bias, onehot, interpret)
    return out, (e, g, W, bias, onehot)


def _vjp_bwd(interpret, saved, grads):
    e, g, W, bias, onehot = saved
    gb, gy = grads
    de, dg, dW, db = _fused_backward(e, g, W, bias, onehot, gb, gy,
                                     interpret)
    # onehot is a function of integer labels — its cotangent is dead by
    # construction (one_hot's transpose w.r.t. int ids is zero); XLA DCEs it
    return de, dg, dW, db, jnp.zeros_like(onehot)


fused_joint_log_probs.defvjp(_vjp_fwd, _vjp_bwd)
