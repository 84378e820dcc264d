"""Pallas fused-gate LSTM scan kernel (TPU).

Replaces the reference's cuDNN LSTM hot loop (reference model.py:53-55) with
a single Pallas kernel that runs the WHOLE time recurrence on-core:

  * grid = (T,): TPU grid steps execute sequentially, so the hidden/cell
    state lives in VMEM scratch across all timesteps — no HBM round-trip
    per step and no per-step kernel launch;
  * the recurrent weights U (H, 4H) are a whole-array VMEM input, resident
    for the entire scan; the precomputed input projections x@W+b stream in
    one (B, 4H) block per grid step;
  * the gate math (sigmoid/sigmoid/tanh/sigmoid, elementwise combine) fuses
    into the (B, H) x (H, 4H) MXU matmul in one kernel body;
  * variable lengths: padded steps freeze the carry and emit zeros, matching
    ops/lstm.lstm_scan / pad_packed_sequence semantics.

Gradients: pallas_lstm_scan is a jax.custom_vjp whose backward recomputes
through the (mathematically identical) pure-jnp scan — rematerialization,
so training gets correct grads while the forward/inference path runs the
fused kernel. Parity with ops/lstm.lstm_scan is tested in interpret mode on
CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, u_ref, mask_ref, out_ref, h_scr, c_scr, *, hidden: int):
    """One grid step = one timestep. Shapes:
    xp_ref: (1, B, 4H) this step's input projections
    u_ref:  (H, 4H) recurrent weights (whole array, VMEM-resident)
    mask_ref: (1, B, 1) validity of this step
    out_ref: (1, B, H)
    h_scr/c_scr: (B, H) carries in VMEM scratch
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    pre = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h, u_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    # compare in f32: Mosaic (v5e) rejects bf16 vector cmpf
    m = mask_ref[0].astype(jnp.float32)  # (B, 1)
    valid = m > 0.0
    h_scr[:] = jnp.where(valid, h_new, h)
    c_scr[:] = jnp.where(valid, c_new, c)
    out_ref[0] = (h_new * m).astype(out_ref.dtype)


def _pallas_forward(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
                    reverse: bool, interpret: bool = False) -> jnp.ndarray:
    """xp: (B, T, 4H), U: (H, 4H), mask: (B, T) -> (B, T, H)."""
    B, T, H4 = xp.shape
    H = H4 // 4
    xp_t = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(xp.dtype)[:, :, None]  # (T, B, 1)

    # reverse scan = run the grid over flipped time and flip the output back
    idx = (lambda t: (T - 1 - t, 0, 0)) if reverse else (lambda t: (t, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, hidden=H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H4 + 10 * T * B * H4,
            bytes_accessed=(T * B * H4 + H * H4 + T * B * H) * 4,
            transcendentals=4 * T * B * H,
        ),
        interpret=interpret,
    )(xp_t, U, mask_t)
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)


def _jnp_reference(xp, U, mask, reverse):
    from .lstm import lstm_scan

    return lstm_scan(xp, U, mask, U.shape[0], reverse=reverse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_lstm_scan(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
                     reverse: bool = False, interpret: bool = False):
    """Fused LSTM recurrence: (B,T,4H) x-projections -> (B,T,H) outputs."""
    return _pallas_forward(xp, U, mask, reverse, interpret)


def _fwd(xp, U, mask, reverse, interpret):
    out = _pallas_forward(xp, U, mask, reverse, interpret)
    return out, (xp, U, mask)


def _bwd(reverse, interpret, res, g):
    xp, U, mask = res
    # rematerialize through the identical-math jnp scan for gradients
    _, vjp = jax.vjp(lambda a, b: _jnp_reference(a, b, mask, reverse), xp, U)
    dxp, dU = vjp(g)
    return dxp, dU, None


pallas_lstm_scan.defvjp(_fwd, _bwd)
