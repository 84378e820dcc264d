"""Pallas fused-gate LSTM scan kernels (TPU): forward AND backward.

Replaces the reference's cuDNN LSTM hot loop (reference model.py:53-55) with
Pallas kernels that run the WHOLE time recurrence on-core:

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

Gradients (jax.custom_vjp): the differentiated forward additionally streams
out the pre-step carries (h_{t-1} bf16, c_{t-1} f32) — 2H per step, the
minimum residual set. The backward kernel walks the grid in reverse time
with (dh, dc) carries and the dU accumulator in VMEM scratch (f32), and
RECOMPUTES the gates from (xp_t, h_{t-1}) — one extra MXU matmul per step
instead of streaming 4H of saved gate activations through HBM. Three
matmuls per step total (gate recompute, dpre @ U^T, h_{t-1}^T @ dpre).
Parity with jax.vjp through ops/lstm.lstm_scan is tested in interpret mode
on CPU and compiled on TPU.
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


def _kernel_train(xp_ref, u_ref, mask_ref, out_ref, hprev_ref, cprev_ref,
                  h_scr, c_scr, *, hidden: int):
    """Forward under differentiation: same math as _kernel, additionally
    streaming out the PRE-step carries (the backward's residuals)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    hprev_ref[0] = h.astype(hprev_ref.dtype)
    cprev_ref[0] = c.astype(cprev_ref.dtype)
    pre = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(u_ref.dtype), u_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = mask_ref[0].astype(jnp.float32)  # (B, 1)
    valid = m > 0.0
    h_scr[:] = jnp.where(valid, h_new, h)
    c_scr[:] = jnp.where(valid, c_new, c)
    out_ref[0] = (h_new * m).astype(out_ref.dtype)


def _kernel_bwd(xp_ref, u_ref, mask_ref, hprev_ref, cprev_ref, gy_ref,
                dxp_ref, du_ref, dh_scr, dc_scr, du_scr, *, hidden: int,
                T: int):
    """One grid step = one timestep, walked in REVERSE time. Carries
    (dh, dc) and the dU accumulator live in f32 VMEM scratch; gates are
    recomputed from (xp_t, h_{t-1}) instead of being streamed from HBM."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        du_scr[:] = jnp.zeros_like(du_scr)

    hprev = hprev_ref[0]  # (B, H) bf16/f32 (xp dtype)
    cprev = cprev_ref[0].astype(jnp.float32)  # (B, H)
    pre = xp_ref[0].astype(jnp.float32) + jnp.dot(
        hprev.astype(u_ref.dtype), u_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * cprev + i * g
    th = jnp.tanh(c_new)

    m = mask_ref[0].astype(jnp.float32)  # (B, 1)
    dh = dh_scr[:]
    dc = dc_scr[:]
    gy = gy_ref[0].astype(jnp.float32)
    # y_t = h_new * m; carry h_t = m ? h_new : h_{t-1}  (same for c)
    dhn = m * (dh + gy)
    dct = m * dc + dhn * o * (1.0 - th * th)
    do_ = dhn * th
    di = dct * g
    dg = dct * i
    df = dct * cprev
    dpre = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do_ * o * (1.0 - o),
    ], axis=1)  # (B, 4H) f32
    dxp_ref[0] = dpre.astype(dxp_ref.dtype)

    dpre_mx = dpre.astype(u_ref.dtype)  # MXU-native inputs, f32 accumulate
    du_scr[:] += jnp.dot(hprev.astype(u_ref.dtype).T, dpre_mx,
                         preferred_element_type=jnp.float32)
    dh_scr[:] = (1.0 - m) * dh + jnp.dot(dpre_mx, u_ref[:].T,
                                         preferred_element_type=jnp.float32)
    dc_scr[:] = (1.0 - m) * dc + dct * f

    @pl.when(s == T - 1)
    def _emit():
        du_ref[:] = du_scr[:].astype(du_ref.dtype)


def _pallas_forward_train(xp, U, mask, reverse, interpret=False):
    """Like _pallas_forward but also returns time-major residuals
    (hprev (T,B,H) in xp dtype, cprev (T,B,H) f32)."""
    B, T, H4 = xp.shape
    H = H4 // 4
    xp_t = jnp.swapaxes(xp, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(xp.dtype)[:, :, None]
    idx = (lambda t: (T - 1 - t, 0, 0)) if reverse else (lambda t: (t, 0, 0))

    out, hprev, cprev = pl.pallas_call(
        functools.partial(_kernel_train, hidden=H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
            jax.ShapeDtypeStruct((T, B, H), xp.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * H4 + 10 * T * B * H4,
            bytes_accessed=(T * B * H4 + H * H4 + 3 * T * B * H) * 4,
            transcendentals=4 * T * B * H,
        ),
        interpret=interpret,
    )(xp_t, U, mask_t)
    return jnp.swapaxes(out, 0, 1), hprev, cprev


def _pallas_backward(xp, U, mask, hprev, cprev, gy, reverse, interpret=False):
    """Reverse-time grad kernel -> (dxp (B,T,4H), dU (H,4H))."""
    B, T, H4 = xp.shape
    H = H4 // 4
    xp_t = jnp.swapaxes(xp, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(xp.dtype)[:, :, None]
    gy_t = jnp.swapaxes(gy, 0, 1)
    # backward visits time in the opposite order of the forward pass
    idx = (lambda s: (s, 0, 0)) if reverse else (lambda s: (T - 1 - s, 0, 0))

    dxp_t, dU = pl.pallas_call(
        functools.partial(_kernel_bwd, hidden=H, T=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), xp.dtype),
            jax.ShapeDtypeStruct((H, H4), U.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * H * H4 + 40 * T * B * H4,
            bytes_accessed=(2 * T * B * H4 + 2 * H * H4 + 4 * T * B * H) * 4,
            transcendentals=5 * T * B * H,
        ),
        interpret=interpret,
    )(xp_t, U, mask_t, hprev, cprev, gy_t)
    return jnp.swapaxes(dxp_t, 0, 1), dU


def _jnp_reference(xp, U, mask, reverse):
    from .lstm import lstm_scan

    return lstm_scan(xp, U, mask, U.shape[0], reverse=reverse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_lstm_scan(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
                     reverse: bool = False, interpret: bool = False):
    """Fused LSTM recurrence: (B,T,4H) x-projections -> (B,T,H) outputs."""
    return _pallas_forward(xp, U, mask, reverse, interpret)


def _fwd(xp, U, mask, reverse, interpret):
    out, hprev, cprev = _pallas_forward_train(xp, U, mask, reverse, interpret)
    return out, (xp, U, mask, hprev, cprev)


def _bwd(reverse, interpret, res, g):
    xp, U, mask, hprev, cprev = res
    dxp, dU = _pallas_backward(xp, U, mask, hprev, cprev, g, reverse, interpret)
    return dxp, dU, None


pallas_lstm_scan.defvjp(_fwd, _bwd)
