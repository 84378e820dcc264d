"""Pallas TPU kernel for the CTC prefix beam search scan.

decoding/beam.py's hash-impl scan costs ~75 us/frame at (B=64, K=16): the
step body compiles to ~15-20 separate XLA fusions (merge matrix, kill mask,
top_k sort, state gathers), each paying per-fusion scheduling latency, times
T sequential frames. Here the WHOLE frame loop is one Pallas kernel:

  * beam state — rolling hash h, last symbol, lens, (p_b, p_nb) — lives in
    VMEM scratch as (B, K) tensors for the entire decode; the grid streams
    CHUNK frames of (top-M log-probs, symbols, active mask) per iteration
    and writes (parent, symbol) backpointer records;
  * candidates live as a (B, K, M+1) tensor (column 0 = the stay candidate
    of beam k, columns 1..M its top-M extends); top-K selection is K
    iterative (max, tie-break by smallest flattened candidate index, mask)
    passes — the flattened order [K stays, then K*M extends row-major]
    reproduces lax.top_k's stable index-ascending tie behavior in the jnp
    hash impl exactly;
  * all gathers (lp[last], state[parent], sym[r]) are one-hot
    compare-and-sum contractions — Mosaic has no per-row dynamic gather;
  * int32 rolling-hash arithmetic wraps identically to the jnp path.

Semantics match decoding/beam.py impl="hash" exactly (same per-frame
top-(K+2) symbol pruning, merge/kill rules, tie behavior); parity is tested
against it and the buffer/host oracles (interpret mode AND compiled on a
real v5e). The backtrack over the recorded backpointers happens outside the
kernel. No backward pass exists or is needed (decode is inference-only).

MEASURED NEGATIVE RESULT — kept as an opt-in (beam_decode impl="pallas"),
NOT the default: 47 ms/batch decode-only at (B=64, T=401, K=16) vs ~30 ms
for the jnp hash scan. The beam state's natural shapes ((B,K), (B,K,M) with
K=16, M=18 lanes) fill 1/8 of the 128-wide VPU and Mosaic spends the rest
in relayouts, while XLA's per-frame sort over the flat (B, 304) candidate
row vectorizes cleanly. Mosaic lessons embedded here (each cost a compile
failure): no scatter (init via iota+where), integer indexing lowers to >2D
gathers (use slices), minor-dim inserts on bools crash (expand 32-bit then
compare), build transposed relation matrices from their definition rather
than transposing, and in-kernel unrolled frame chunks multiply program size
into Mosaic compile-time blowups (>16 min at CHUNK=8; CHUNK=1 compiles in
seconds and runs at the same speed — selection math, not DMA, dominates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30

# frames per grid iteration. 1, NOT more: the unrolled selection rounds
# multiply Mosaic program size — CHUNK=8 took >16 min to compile and ran no
# faster (the per-frame selection math dominates, not block DMA)
CHUNK = 1


def _lae(a, b):
    """logaddexp from basic VPU ops, NEG-saturating like the jnp impl."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    return jnp.where(mx <= NEG / 2, NEG, out)


def _beam_kernel(toplp_ref, topsym_ref, lpfull_ref, active_ref,
                 parents_ref, syms_ref, lens_out_ref, score_out_ref,
                 h_scr, last_scr, lens_scr, pb_scr, pnb_scr,
                 *, B: int, K: int, M: int, Lmax: int, chunk: int,
                 hash_m: int, G: int):
    """Grid step = CHUNK frames. Streams:
      toplp_ref  (chunk, B, M) f32 — top-M symbol log-probs per frame
      topsym_ref (chunk, B, M) i32 — their symbol ids
      lpfull_ref (chunk, B, A) f32 — full log-prob rows (lp[last]/lp[blank])
      active_ref (chunk, B, 1) f32 — 1.0 while t < frame_len
    Writes (chunk, B, K) parent/sym backpointers and, on the last grid
    step, the final (B, K) lens and total scores.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        last_scr[:] = jnp.full_like(last_scr, -1)
        lens_scr[:] = jnp.zeros_like(lens_scr)
        slot0 = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) == 0
        pb_scr[:] = jnp.where(slot0, 0.0, NEG)  # beam 0 = empty prefix
        pnb_scr[:] = jnp.full((B, K), NEG, jnp.float32)

    A = lpfull_ref.shape[-1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    # flattened candidate index in the jnp hash impl's order:
    # stays occupy [0, K), extend (k, r) occupies K + k*M + r
    order_stay = iota_k
    order_ext = (K
                 + jax.lax.broadcasted_iota(jnp.int32, (B, K, M), 1) * M
                 + jax.lax.broadcasted_iota(jnp.int32, (B, K, M), 2))
    BIG = jnp.int32(2 ** 30)

    for s in range(chunk):
        h = h_scr[:]
        last = last_scr[:]
        lens = lens_scr[:]
        p_b = pb_scr[:]
        p_nb = pnb_scr[:]

        lp_full = lpfull_ref[s]           # (B, A)
        top_lp = toplp_ref[s]             # (B, M)
        top_sym = topsym_ref[s]           # (B, M)
        active = active_ref[s] > 0.0      # (B, 1)

        total = _lae(p_b, p_nb)
        valid = total > NEG / 2
        # Mosaic cannot insert a minor dim on 1-bit (bool) vectors: expand
        # the 32-bit source first, compare after
        valid3k = total[:, :, None] > NEG / 2      # (B, K, 1)
        valid3j = total[:, None, :] > NEG / 2      # (B, 1, K)

        # lp[last] via one-hot contraction over A (blank is column 0)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (B, K, A), 2)
        onehot_last = (iota_a == last[:, :, None]).astype(jnp.float32)
        lp_last = jnp.sum(onehot_last * lp_full[:, None, :], axis=2)  # (B, K)
        lp_blank = lp_full[:, 0:1]                                    # (B, 1)

        # ---- stay candidates ------------------------------------------------
        stay_pb = jnp.where(valid, total + lp_blank, NEG)
        stay_pnb = jnp.where(valid & (last >= 0), p_nb + lp_last, NEG)

        # ---- extend candidates (B, K, M) over top-M symbols -----------------
        is_last = top_sym[:, None, :] == last[:, :, None]
        src = jnp.where(is_last, p_b[:, :, None], total[:, :, None])
        ext = src + top_lp[:, None, :]
        ext = jnp.where(top_sym[:, None, :] == 0, NEG, ext)  # blank = 0
        ext = jnp.where(valid3k, ext, NEG)
        ext = jnp.where(lens[:, :, None] >= Lmax, NEG, ext)

        # ---- extend->stay merge via hashes, E (B, K_j, K_k) -----------------
        h_ext = h[:, None, :] * hash_m + (jnp.maximum(last, 0) + 1)[:, :, None]
        E = ((h[:, :, None] == h_ext)
             & (lens[:, :, None] == lens[:, None, :] + 1)
             & valid3k & valid3j
             & (last[:, :, None] >= 0))
        c_src = jnp.where(last[:, :, None] == last[:, None, :],
                          p_b[:, None, :], total[:, None, :])
        Cm = jnp.where(E, c_src + lp_last[:, :, None], NEG)
        cmax = jnp.max(Cm, axis=2)                     # (B, K)
        merged = cmax + jnp.log(
            jnp.sum(jnp.exp(Cm - cmax[:, :, None]), axis=2))
        merged = jnp.where(jnp.any(E, axis=2), jnp.maximum(merged, NEG), NEG)
        stay_pnb = _lae(stay_pnb, merged)

        # kill merged extends: kill[b,k,r] = any_j E[b,j,k] & last_j==sym_r.
        # Et (dim1=k, dim2=j) is built directly from the hash relation (NOT
        # by transposing E — Mosaic relayouts of sliced bools crash) so the
        # j-loop below only needs minor-axis slices.
        h_ext_t = h[:, :, None] * hash_m + (jnp.maximum(last, 0) + 1)[:, None, :]
        Et = ((h[:, None, :] == h_ext_t)
              & (lens[:, None, :] == lens[:, :, None] + 1)
              & valid3k & valid3j
              & (last[:, None, :] >= 0))               # (B, K_k, K_j)
        ls = last[:, :, None] == top_sym[:, None, :]   # (B, K_j, M)
        kill = jnp.zeros((B, K, M), jnp.bool_)
        for j in range(K):
            kill = kill | (Et[:, :, j:j + 1] & ls[:, j:j + 1, :])
        ext = jnp.where(kill, NEG, ext)

        # ---- iterative top-K over K stays + (K, M) extends -------------------
        # stay and extend groups stay SEPARATE (no minor-axis concat); the
        # flattened candidate order [K stays, K*M extends row-major] is
        # enforced through explicit order-index tensors, reproducing
        # lax.top_k's stable tie behavior in the jnp hash impl.
        stay_scores = _lae(stay_pb, stay_pnb)
        ext_scores = ext

        top_idx = jnp.zeros((B, K), jnp.int32)
        top_scores = jnp.zeros((B, K), jnp.float32)
        for r in range(K):
            mx_s = jnp.max(stay_scores, axis=1, keepdims=True)       # (B, 1)
            mx_e = jnp.max(jnp.max(ext_scores, axis=2), axis=1,
                           keepdims=True)                            # (B, 1)
            mx = jnp.maximum(mx_s, mx_e)
            idx_s = jnp.min(jnp.where(stay_scores >= mx, order_stay, BIG),
                            axis=1, keepdims=True)                   # (B, 1)
            idx_e3 = jnp.where(ext_scores >= mx[:, :, None], order_ext, BIG)
            idx_e = jnp.min(jnp.min(idx_e3, axis=2), axis=1,
                            keepdims=True)                           # (B, 1)
            idx = jnp.minimum(idx_s, idx_e)
            sel = iota_k == r                                        # (B, K)
            top_idx = jnp.where(sel, idx, top_idx)   # idx broadcasts (B,1)
            top_scores = jnp.where(sel, mx, top_scores)
            stay_scores = jnp.where(order_stay == idx, NEG, stay_scores)
            ext_scores = jnp.where(order_ext == idx[:, :, None], NEG,
                                   ext_scores)

        is_stay = top_idx < K
        parent = jnp.where(is_stay, top_idx, (top_idx - K) // M)
        ext_r = jnp.maximum(top_idx - K, 0) % M                  # (B, K)
        # sym = top_sym[b, ext_r] via one-hot over M
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (B, K, M), 2)
        oh_r = iota_m == ext_r[:, :, None]
        sym_ext = jnp.sum(jnp.where(oh_r, top_sym[:, None, :], 0), axis=2)
        sym = jnp.where(is_stay, -1, sym_ext)

        # state[parent] via one-hot over old beam slots
        oh_p = iota_k[:, :, None] == parent[:, None, :]  # (B, K_old, K_new)
        ohf = oh_p.astype(jnp.float32)

        def pick_f(v):
            return jnp.sum(v[:, :, None] * ohf, axis=1)

        def pick_i(v):
            return jnp.sum(jnp.where(oh_p, v[:, :, None], 0), axis=1)

        new_h = jnp.where(is_stay, pick_i(h),
                          pick_i(h) * hash_m + (jnp.maximum(sym, 0) + 1))
        new_last = jnp.where(is_stay, pick_i(last), sym)
        new_lens = pick_i(lens) + (~is_stay).astype(jnp.int32)
        new_pb = jnp.where(is_stay, pick_f(stay_pb), NEG)
        new_pnb = jnp.where(is_stay, pick_f(stay_pnb), top_scores)
        dead = top_scores <= NEG / 2
        new_pb = jnp.where(dead, NEG, new_pb)
        new_pnb = jnp.where(dead, NEG, new_pnb)
        new_lens = jnp.where(dead, 0, new_lens)
        new_h = jnp.where(dead, 0, new_h)
        new_last = jnp.where(dead, -1, new_last)

        # frozen rows (t >= frame_len): keep state, identity backpointers
        h_scr[:] = jnp.where(active, new_h, h)
        last_scr[:] = jnp.where(active, new_last, last)
        lens_scr[:] = jnp.where(active, new_lens, lens)
        pb_scr[:] = jnp.where(active, new_pb, p_b)
        pnb_scr[:] = jnp.where(active, new_pnb, p_nb)
        parents_ref[s] = jnp.where(active, parent, iota_k)
        syms_ref[s] = jnp.where(active, sym, -1)

    @pl.when(t == G - 1)
    def _emit():
        lens_out_ref[:] = lens_scr[:]
        score_out_ref[:] = _lae(pb_scr[:], pnb_scr[:])


def beam_scan_pallas(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
                     K: int, Lmax: int, interpret: bool = False):
    """Run the beam scan for the whole batch in one Pallas kernel.

    Args: log_probs (B, T, A) f32, frame_lens (B,) i32.
    Returns (parents (T, B, K) i32, syms (T, B, K) i32, lens (B, K) i32,
    scores (B, K) f32) — same backpointer contract as beam.py's hash scan.
    """
    B, T, A = log_probs.shape
    M = min(A, K + 2)
    top_lp, top_sym = jax.lax.top_k(log_probs, M)           # (B, T, M)
    chunk = CHUNK
    Tp = -(-T // chunk) * chunk
    G = Tp // chunk

    def pad_t(x):  # (B, T, ...) -> time-major (Tp, B, ...)
        x = jnp.swapaxes(x, 0, 1)
        return jnp.pad(x, [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1))

    active = (jnp.arange(T)[None, :] < frame_lens[:, None]).astype(jnp.float32)
    toplp_t = pad_t(top_lp.astype(jnp.float32))
    topsym_t = pad_t(top_sym.astype(jnp.int32))
    lp_t = pad_t(log_probs.astype(jnp.float32))
    act_t = pad_t(active[:, :, None])

    idx = lambda t: (t, 0, 0)
    kern = functools.partial(_beam_kernel, B=B, K=K, M=M, Lmax=Lmax,
                             chunk=chunk, hash_m=1000003, G=G)
    parents, syms, lens, scores = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((chunk, B, M), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, M), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, A), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, K), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, K), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, K), jnp.int32),
            jax.ShapeDtypeStruct((Tp, B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.int32),
            pltpu.VMEM((B, K), jnp.int32),
            pltpu.VMEM((B, K), jnp.int32),
            pltpu.VMEM((B, K), jnp.float32),
            pltpu.VMEM((B, K), jnp.float32),
        ],
        interpret=interpret,
    )(toplp_t, topsym_t, lp_t, act_t)
    return parents[:T], syms[:T], lens, scores
