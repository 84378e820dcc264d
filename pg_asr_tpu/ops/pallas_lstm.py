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


import os

# Timesteps per grid step. Each grid iteration runs an unrolled CHUNK-long
# slice of the recurrence on VMEM-resident carries: fewer grid iterations
# amortize per-step sequencing overhead and batch the xp/out DMAs (the
# recurrence is latency-bound, ~1.5us/step at 1-step blocks). Time is padded
# to a CHUNK multiple with mask=0 steps (carry frozen, outputs zeroed, zero
# grads), which preserves semantics exactly. Sweepable: PGASR_LSTM_CHUNK=4.
CHUNK = int(os.environ.get("PGASR_LSTM_CHUNK", "8"))

# VMEM envelope: the per-grid-step working set (double-buffered streamed
# blocks across both kernels) is ~8-12 KB x CHUNK x B; CHUNK=8 at B=256
# measured 16.5 MB against the 16 MB scoped limit. Halve the chunk until
# CHUNK x B fits (B=128 at chunk 8 is the largest measured-good config).
_CHUNK_ROWS_BUDGET = int(os.environ.get("PGASR_LSTM_CHUNK_ROWS", "1024"))


def _effective_chunk(batch: int, budget: int = _CHUNK_ROWS_BUDGET) -> int:
    c = CHUNK
    while c > 1 and c * batch > budget:
        c //= 2
    return max(c, 1)


def _bwd_chunk(batch: int, pad_c: int) -> int:
    """The backward streams ~2x the bytes (6 inputs + 2 outputs) and its
    fixed scratch grows with B. Measured envelope: (B=128, chunk 8) fits,
    (B=256, chunk 4) does not — so above B=128 the row budget halves."""
    budget = 1024 if batch <= 128 else 512
    return min(pad_c, _effective_chunk(batch, budget))


def _cell(pre, c, hidden: int):
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _kernel(xp_ref, u_ref, mask_ref, *refs, hidden: int, chunk: int,
            flip: bool, train: bool = False):
    """One grid step = CHUNK timesteps. Shapes:
    xp_ref: (CHUNK, B, 4H) input projections
    u_ref:  (H, 4H) recurrent weights (whole array, VMEM-resident)
    mask_ref: (CHUNK, B, 1) validity
    refs (positional, outputs then scratch): out (CHUNK, B, H)
      [+ hprev/cprev (CHUNK, B, H) when train], then h_scr/c_scr (B, H)
    flip: iterate the chunk's steps in reverse local order (reverse scans)
    """
    if train:
        out_ref, hprev_ref, cprev_ref, h_scr, c_scr = refs
    else:
        out_ref, h_scr, c_scr = refs
        hprev_ref = cprev_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    steps = range(chunk - 1, -1, -1) if flip else range(chunk)
    for s in steps:
        if train:
            hprev_ref[s] = h.astype(hprev_ref.dtype)
            cprev_ref[s] = c.astype(cprev_ref.dtype)
        pre = xp_ref[s].astype(jnp.float32) + jnp.dot(
            h.astype(u_ref.dtype), u_ref[:], preferred_element_type=jnp.float32)
        h_new, c_new = _cell(pre, c, hidden)
        # compare in f32: Mosaic (v5e) rejects bf16 vector cmpf
        m = mask_ref[s].astype(jnp.float32)  # (B, 1)
        valid = m > 0.0
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        out_ref[s] = (h_new * m).astype(out_ref.dtype)
    h_scr[:] = h
    c_scr[:] = c


def _kernel_bwd(xp_ref, u_ref, mask_ref, hprev_ref, cprev_ref, gy_ref,
                dxp_ref, du_ref, dh_scr, dc_scr, du_scr, *, hidden: int,
                chunk: int, G: int, flip: bool):
    """One grid step = CHUNK timesteps walked in REVERSE time. Carries
    (dh, dc) and the dU accumulator live in f32 VMEM scratch; gates are
    recomputed from (xp_t, h_{t-1}) instead of being streamed from HBM.
    flip=False walks local steps CHUNK-1..0 (reverse of a forward scan);
    flip=True walks 0..CHUNK-1 (reverse of a reverse scan)."""
    gstep = pl.program_id(0)

    @pl.when(gstep == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        du_scr[:] = jnp.zeros_like(du_scr)

    dh = dh_scr[:]
    dc = dc_scr[:]
    du = du_scr[:]
    steps = range(chunk) if flip else range(chunk - 1, -1, -1)
    for s in steps:
        hprev = hprev_ref[s]  # (B, H) xp dtype
        cprev = cprev_ref[s].astype(jnp.float32)  # (B, H)
        pre = xp_ref[s].astype(jnp.float32) + jnp.dot(
            hprev.astype(u_ref.dtype), u_ref[:],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :hidden])
        f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
        g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(pre[:, 3 * hidden :])
        c_new = f * cprev + i * g
        th = jnp.tanh(c_new)

        m = mask_ref[s].astype(jnp.float32)  # (B, 1)
        gy = gy_ref[s].astype(jnp.float32)
        # y_t = h_new * m; carry h_t = m ? h_new : h_{t-1}  (same for c)
        dhn = m * (dh + gy)
        dct = m * dc + dhn * o * (1.0 - th * th)
        dpre = jnp.concatenate([
            dct * g * i * (1.0 - i),
            dct * cprev * f * (1.0 - f),
            dct * i * (1.0 - g * g),
            dhn * th * o * (1.0 - o),
        ], axis=1)  # (B, 4H) f32
        dxp_ref[s] = dpre.astype(dxp_ref.dtype)

        dpre_mx = dpre.astype(u_ref.dtype)  # MXU-native, f32 accumulate
        du = du + jnp.dot(hprev.astype(u_ref.dtype).T, dpre_mx,
                          preferred_element_type=jnp.float32)
        dh = (1.0 - m) * dh + jnp.dot(dpre_mx, u_ref[:].T,
                                      preferred_element_type=jnp.float32)
        dc = (1.0 - m) * dc + dct * f
    dh_scr[:] = dh
    dc_scr[:] = dc
    du_scr[:] = du

    @pl.when(gstep == G - 1)
    def _emit():
        du_ref[:] = du_scr[:].astype(du_ref.dtype)


def _pad_chunk(arr_t: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Zero-pad a time-major (T, B, ...) array to a chunk multiple."""
    T = arr_t.shape[0]
    Tp = -(-T // chunk) * chunk
    if Tp == T:
        return arr_t
    return jnp.pad(arr_t, [(0, Tp - T)] + [(0, 0)] * (arr_t.ndim - 1))


def _pallas_forward(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
                    reverse: bool, interpret: bool = False,
                    train: bool = False):
    """xp: (B, T, 4H), U: (H, 4H), mask: (B, T) -> (B, T, H) [+ residuals
    hprev/cprev (Tp, B, H) time-major when train]."""
    B, T, H4 = xp.shape
    H = H4 // 4
    chunk = _effective_chunk(B)
    xp_t = _pad_chunk(jnp.swapaxes(xp, 0, 1), chunk)  # (Tp, B, 4H)
    mask_t = _pad_chunk(
        jnp.swapaxes(mask, 0, 1).astype(xp.dtype)[:, :, None], chunk)
    Tp = xp_t.shape[0]
    G = Tp // chunk

    # reverse scan = run the grid over flipped time (block order + local
    # order inside the chunk) and the padded mask=0 tail freezes the carry
    idx = (lambda t: (G - 1 - t, 0, 0)) if reverse else (lambda t: (t, 0, 0))

    n_out = 3 if train else 1
    outs = pl.pallas_call(
        functools.partial(_kernel, hidden=H, chunk=chunk, flip=reverse,
                          train=train),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((chunk, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((chunk, B, H), idx,
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((Tp, B, H), xp.dtype),
                   jax.ShapeDtypeStruct((Tp, B, H), xp.dtype),
                   jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)][:n_out],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * B * H * H4 + 10 * Tp * B * H4,
            bytes_accessed=(Tp * B * H4 + H * H4 + n_out * Tp * B * H) * 4,
            transcendentals=4 * Tp * B * H,
        ),
        interpret=interpret,
    )(xp_t, U, mask_t)
    if train:
        out, hprev, cprev = outs
        return jnp.swapaxes(out[:T], 0, 1), hprev, cprev
    return jnp.swapaxes(outs[0][:T], 0, 1)


def _pallas_forward_train(xp, U, mask, reverse, interpret=False):
    return _pallas_forward(xp, U, mask, reverse, interpret, train=True)


def _pallas_backward(xp, U, mask, hprev, cprev, gy, reverse, interpret=False):
    """Reverse-time grad kernel -> (dxp (B,T,4H), dU (H,4H)). hprev/cprev
    arrive time-major already CHUNK-padded (forward residuals)."""
    B, T, H4 = xp.shape
    H = H4 // 4
    # residuals were padded with the FORWARD chunk; the backward may need a
    # smaller chunk (more streams) — both are powers of two, so the forward
    # padding stays divisible by the backward chunk
    pad_c = _effective_chunk(B)
    chunk = _bwd_chunk(B, pad_c)
    xp_t = _pad_chunk(jnp.swapaxes(xp, 0, 1), pad_c)
    mask_t = _pad_chunk(jnp.swapaxes(mask, 0, 1).astype(xp.dtype)[:, :, None],
                        pad_c)
    gy_t = _pad_chunk(jnp.swapaxes(gy, 0, 1), pad_c)
    Tp = xp_t.shape[0]
    G = Tp // chunk
    # backward visits time in the opposite order of the forward pass
    idx = (lambda s: (s, 0, 0)) if reverse else (lambda s: (G - 1 - s, 0, 0))

    dxp_t, dU = pl.pallas_call(
        functools.partial(_kernel_bwd, hidden=H, chunk=chunk, G=G,
                          flip=reverse),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((chunk, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, H4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), xp.dtype),
            jax.ShapeDtypeStruct((H, H4), U.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * Tp * B * H * H4 + 40 * Tp * B * H4,
            bytes_accessed=(2 * Tp * B * H4 + 2 * H * H4 + 4 * Tp * B * H) * 4,
            transcendentals=5 * Tp * B * H,
        ),
        interpret=interpret,
    )(xp_t, U, mask_t, hprev, cprev, gy_t)
    return jnp.swapaxes(dxp_t[:T], 0, 1), dU


# ---------------------------------------------------------------------------
# Fused-direction BiLSTM kernels: one grid walk serves BOTH directions.
# Grid step t processes forward-direction time t and backward-direction time
# T-1-t (independent work -> the two per-step matmuls pipeline on the MXU),
# halving the sequential chain vs two single-direction kernel launches.
# ---------------------------------------------------------------------------


def _bi_gates(pre, c, hidden: int):
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _kernel_bi(xpf_ref, xpb_ref, uf_ref, ub_ref, mf_ref, mb_ref,
               yf_ref, yb_ref, hf_scr, cf_scr, hb_scr, cb_scr,
               *, hidden: int, train: bool,
               hpf_ref=None, cpf_ref=None, hpb_ref=None, cpb_ref=None):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    hf, cf = hf_scr[:], cf_scr[:]
    hb, cb = hb_scr[:], cb_scr[:]
    if train:
        hpf_ref[0] = hf.astype(hpf_ref.dtype)
        cpf_ref[0] = cf.astype(cpf_ref.dtype)
        hpb_ref[0] = hb.astype(hpb_ref.dtype)
        cpb_ref[0] = cb.astype(cpb_ref.dtype)
    pre_f = xpf_ref[0].astype(jnp.float32) + jnp.dot(
        hf.astype(uf_ref.dtype), uf_ref[:], preferred_element_type=jnp.float32)
    pre_b = xpb_ref[0].astype(jnp.float32) + jnp.dot(
        hb.astype(ub_ref.dtype), ub_ref[:], preferred_element_type=jnp.float32)
    hf_new, cf_new = _bi_gates(pre_f, cf, hidden)
    hb_new, cb_new = _bi_gates(pre_b, cb, hidden)

    mf = mf_ref[0].astype(jnp.float32)
    mb = mb_ref[0].astype(jnp.float32)
    vf = mf > 0.0
    vb = mb > 0.0
    hf_scr[:] = jnp.where(vf, hf_new, hf)
    cf_scr[:] = jnp.where(vf, cf_new, cf)
    hb_scr[:] = jnp.where(vb, hb_new, hb)
    cb_scr[:] = jnp.where(vb, cb_new, cb)
    yf_ref[0] = (hf_new * mf).astype(yf_ref.dtype)
    yb_ref[0] = (hb_new * mb).astype(yb_ref.dtype)


def _kernel_bi_bwd(xpf_ref, xpb_ref, uf_ref, ub_ref, mf_ref, mb_ref,
                   hpf_ref, cpf_ref, hpb_ref, cpb_ref, gyf_ref, gyb_ref,
                   dxpf_ref, dxpb_ref, duf_ref, dub_ref,
                   dhf_scr, dcf_scr, dhb_scr, dcb_scr, duf_acc, dub_acc,
                   *, hidden: int, T: int):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dcf_scr[:] = jnp.zeros_like(dcf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        duf_acc[:] = jnp.zeros_like(duf_acc)
        dub_acc[:] = jnp.zeros_like(dub_acc)

    def one_dir(xp_ref, u_ref, m_ref, hp_ref, cp_ref, gy_ref, dxp_ref,
                dh_scr, dc_scr, du_acc):
        hprev = hp_ref[0]
        cprev = cp_ref[0].astype(jnp.float32)
        pre = xp_ref[0].astype(jnp.float32) + jnp.dot(
            hprev.astype(u_ref.dtype), u_ref[:],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :hidden])
        f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
        g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(pre[:, 3 * hidden :])
        c_new = f * cprev + i * g
        th = jnp.tanh(c_new)

        m = m_ref[0].astype(jnp.float32)
        dh = dh_scr[:]
        dc = dc_scr[:]
        gy = gy_ref[0].astype(jnp.float32)
        dhn = m * (dh + gy)
        dct = m * dc + dhn * o * (1.0 - th * th)
        dpre = jnp.concatenate([
            dct * g * i * (1.0 - i),
            dct * cprev * f * (1.0 - f),
            dct * i * (1.0 - g * g),
            dhn * th * o * (1.0 - o),
        ], axis=1)
        dxp_ref[0] = dpre.astype(dxp_ref.dtype)
        dpre_mx = dpre.astype(u_ref.dtype)
        du_acc[:] += jnp.dot(hprev.astype(u_ref.dtype).T, dpre_mx,
                             preferred_element_type=jnp.float32)
        dh_scr[:] = (1.0 - m) * dh + jnp.dot(dpre_mx, u_ref[:].T,
                                             preferred_element_type=jnp.float32)
        dc_scr[:] = (1.0 - m) * dc + dct * f

    one_dir(xpf_ref, uf_ref, mf_ref, hpf_ref, cpf_ref, gyf_ref, dxpf_ref,
            dhf_scr, dcf_scr, duf_acc)
    one_dir(xpb_ref, ub_ref, mb_ref, hpb_ref, cpb_ref, gyb_ref, dxpb_ref,
            dhb_scr, dcb_scr, dub_acc)

    @pl.when(s == T - 1)
    def _emit():
        duf_ref[:] = duf_acc[:].astype(duf_ref.dtype)
        dub_ref[:] = dub_acc[:].astype(dub_ref.dtype)


def _bi_specs(B, T, H, H4, fwd_idx, bwd_idx):
    """(xpf, xpb, Uf, Ub, mf, mb) input specs shared by both kernels."""
    return [
        pl.BlockSpec((1, B, H4), fwd_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H4), bwd_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 1), fwd_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 1), bwd_idx, memory_space=pltpu.VMEM),
    ]


def _pallas_bi_forward(xpf, xpb, Uf, Ub, mask, train: bool, interpret=False):
    """Fused BiLSTM forward. xpf/xpb: (B,T,4H). Returns y (B,T,2H) [+
    residuals (hpf, cpf, hpb, cpb), each (T,B,H) time-major, when train]."""
    B, T, H4 = xpf.shape
    H = H4 // 4
    xpf_t = jnp.swapaxes(xpf, 0, 1)
    xpb_t = jnp.swapaxes(xpb, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(xpf.dtype)[:, :, None]
    fwd_idx = lambda t: (t, 0, 0)
    bwd_idx = lambda t: (T - 1 - t, 0, 0)

    out_specs = [
        pl.BlockSpec((1, B, H), fwd_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), bwd_idx, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), xpf.dtype),
        jax.ShapeDtypeStruct((T, B, H), xpf.dtype),
    ]
    if train:
        out_specs += [
            pl.BlockSpec((1, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, B, H), xpf.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), xpf.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ]

    def kern(*refs):
        if train:
            (xpf_r, xpb_r, uf_r, ub_r, mf_r, mb_r, yf_r, yb_r,
             hpf_r, cpf_r, hpb_r, cpb_r, hf_s, cf_s, hb_s, cb_s) = refs
            _kernel_bi(xpf_r, xpb_r, uf_r, ub_r, mf_r, mb_r, yf_r, yb_r,
                       hf_s, cf_s, hb_s, cb_s, hidden=H, train=True,
                       hpf_ref=hpf_r, cpf_ref=cpf_r, hpb_ref=hpb_r,
                       cpb_ref=cpb_r)
        else:
            (xpf_r, xpb_r, uf_r, ub_r, mf_r, mb_r, yf_r, yb_r,
             hf_s, cf_s, hb_s, cb_s) = refs
            _kernel_bi(xpf_r, xpb_r, uf_r, ub_r, mf_r, mb_r, yf_r, yb_r,
                       hf_s, cf_s, hb_s, cb_s, hidden=H, train=False)

    outs = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=_bi_specs(B, T, H, H4, fwd_idx, bwd_idx),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=4 * T * B * H * H4 + 20 * T * B * H4,
            bytes_accessed=(2 * T * B * H4 + 2 * H * H4 + 2 * T * B * H) * 4,
            transcendentals=8 * T * B * H,
        ),
        interpret=interpret,
    )(xpf_t, xpb_t, Uf, Ub, mask_t, mask_t)
    yf, yb = outs[0], outs[1]
    y = jnp.concatenate([jnp.swapaxes(yf, 0, 1), jnp.swapaxes(yb, 0, 1)], -1)
    if train:
        return y, outs[2:]
    return y


def _pallas_bi_backward(xpf, xpb, Uf, Ub, mask, res, gy, interpret=False):
    B, T, H4 = xpf.shape
    H = H4 // 4
    hpf, cpf, hpb, cpb = res
    xpf_t = jnp.swapaxes(xpf, 0, 1)
    xpb_t = jnp.swapaxes(xpb, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(xpf.dtype)[:, :, None]
    gyf_t = jnp.swapaxes(gy[:, :, :H], 0, 1)
    gyb_t = jnp.swapaxes(gy[:, :, H:], 0, 1)
    # reverse of the forward walk: dir-f visits T-1..0, dir-b visits 0..T-1
    f_idx = lambda s: (T - 1 - s, 0, 0)
    b_idx = lambda s: (s, 0, 0)

    outs = pl.pallas_call(
        functools.partial(_kernel_bi_bwd, hidden=H, T=T),
        grid=(T,),
        in_specs=_bi_specs(B, T, H, H4, f_idx, b_idx) + [
            pl.BlockSpec((1, B, H), f_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), f_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), b_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), b_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), f_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H4), f_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H4), b_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), xpf.dtype),
            jax.ShapeDtypeStruct((T, B, H4), xpb.dtype),
            jax.ShapeDtypeStruct((H, H4), Uf.dtype),
            jax.ShapeDtypeStruct((H, H4), Ub.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4 +
                       [pltpu.VMEM((H, H4), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=12 * T * B * H * H4 + 80 * T * B * H4,
            bytes_accessed=(4 * T * B * H4 + 4 * H * H4 + 8 * T * B * H) * 4,
            transcendentals=10 * T * B * H,
        ),
        interpret=interpret,
    )(xpf_t, xpb_t, Uf, Ub, mask_t, mask_t,
      hpf, cpf, hpb, cpb, gyf_t, gyb_t)
    dxpf, dxpb, dUf, dUb = outs
    return jnp.swapaxes(dxpf, 0, 1), jnp.swapaxes(dxpb, 0, 1), dUf, dUb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pallas_bilstm_scan(xpf: jnp.ndarray, xpb: jnp.ndarray, Uf: jnp.ndarray,
                       Ub: jnp.ndarray, mask: jnp.ndarray,
                       interpret: bool = False):
    """Fused both-direction BiLSTM recurrence.

    Args: xpf/xpb (B,T,4H) per-direction input projections, Uf/Ub (H,4H),
    mask (B,T). Returns (B,T,2H) = concat(forward, backward) outputs —
    exactly concat(lstm_scan(xpf,...), lstm_scan(xpb,...,reverse=True))."""
    return _pallas_bi_forward(xpf, xpb, Uf, Ub, mask, train=False,
                              interpret=interpret)


def _bi_fwd(xpf, xpb, Uf, Ub, mask, interpret):
    y, res = _pallas_bi_forward(xpf, xpb, Uf, Ub, mask, train=True,
                                interpret=interpret)
    return y, (xpf, xpb, Uf, Ub, mask, res)


def _bi_bwd(interpret, saved, g):
    xpf, xpb, Uf, Ub, mask, res = saved
    dxpf, dxpb, dUf, dUb = _pallas_bi_backward(xpf, xpb, Uf, Ub, mask, res,
                                               g, interpret)
    return dxpf, dxpb, dUf, dUb, None


pallas_bilstm_scan.defvjp(_bi_fwd, _bi_bwd)


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
