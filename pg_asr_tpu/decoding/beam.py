"""Vectorized on-device CTC prefix beam search.

The reference decodes per utterance on the host: a Python dict-of-prefixes
triple loop over (time x vocab x beam) on numpy posteriors pulled off-device
(reference model.py:317-324, CTCdecoder.py:63-113). Here the whole search is
a fixed-shape lax.scan over frames, vmapped over the batch, running on TPU:

  state per utterance: K prefixes as (K, Lmax) id rows + lengths, with
  (log p ending-in-blank, log p ending-in-non-blank) per beam slot.

  per frame:
    * "stay" candidates: same prefix — blank emission moves total mass into
      p_b; repeating the final symbol moves p_nb mass into p_nb;
    * "extend" candidates: prefix + s for every non-blank s — from total
      mass if s differs from the last symbol, else only from the blank-
      terminated mass (CTC repeat-merge rule);
    * MERGE: an extend candidate (k, s) that reproduces an existing beam
      prefix j (prefix_j == prefix_k + s) must fold its mass into j rather
      than duplicate it. Because beam prefixes are distinct, extend
      candidates can only collide with *stay* candidates, and the collision
      pattern is the (K, K) "j extends k by one symbol" matrix computed with
      masked equality over the prefix buffer — all VPU work;
    * top-K by logaddexp(p_b, p_nb) via lax.top_k (the oracle's sort key,
      reference CTCdecoder.py:110-113).

Semantics match decoding/host_beam.py (and the reference oracle) exactly on
non-degenerate inputs; parity is tested against both.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1.0e30

# above this candidate count the O(C^2) rank computation costs more than
# the sort it replaces; 1024 ~ the crossover given the measured sort cost
# (~80 ns/element/frame) vs the pairwise compare throughput on v5e
_RANK_TOPK_MAX_C = 1024


def _lae(a, b):
    return jnp.logaddexp(a, b)


def rank_topk(scores, K: int):
    """Exact top-K selection as a one-hot matrix, semantically identical to
    `lax.top_k` (descending scores, ties broken toward the lower index):
    returns (top_scores (K,), oh (C, K) bool) with oh[c, j] true iff
    candidate c is the j-th best.

    rank[c] = #{c': s_c' > s_c} + #{c' < c: s_c' == s_c} is a PERMUTATION
    of 0..C-1 (the tie-break totally orders equal scores), so
    oh = (rank == j) selects exactly one candidate per output slot and
    payloads follow by one-hot contraction instead of gathers.

    Why not lax.top_k: inside a sequential scan its sort dominated the CTC
    beam step (24.5 of 31.5 ms/batch at B=64 T=401 K=16 on v5e — measured
    by ablation, benchmarks/beam_attr2.py), while the O(C^2) pairwise
    compare is all-parallel VPU work that XLA fuses cleanly. Swapping the
    sort+gathers for rank_topk + contractions took the production beam to
    13.8 ms/batch (docs/PERF.md). Work grows as C^2, so beyond
    _RANK_TOPK_MAX_C the selection itself falls back to lax.top_k and only
    the one-hot CONTRACT is kept (payload combine still avoids gathers) —
    e.g. the LM-fused step over a BPE vocab, where C = K(1+A) reaches
    thousands and the pairwise compare would dwarf the sort it replaces.
    """
    C = scores.shape[0]
    iota = jnp.arange(C)
    if C > _RANK_TOPK_MAX_C:
        top_scores, top_idx = jax.lax.top_k(scores, K)
        return top_scores, iota[:, None] == top_idx[None, :]
    beats = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None]) & (iota[None, :] < iota[:, None]))
    rank = jnp.sum(beats, axis=1)                        # (C,) int32
    oh = rank[:, None] == jnp.arange(K)[None, :]         # (C, K) bool
    top_scores = jnp.sum(oh.astype(scores.dtype) * scores[:, None], axis=0)
    return top_scores, oh


def _step(state, lp, *, K: int, A: int, Lmax: int, blank: int):
    """One frame update for one utterance.

    state: (prefixes (K, Lmax) i32, lens (K,) i32, p_b (K,), p_nb (K,))
    lp: (A,) log-probs at this frame.
    """
    prefixes, lens, p_b, p_nb = state
    total = _lae(p_b, p_nb)  # (K,)
    valid = total > NEG / 2

    last = jnp.where(
        lens > 0,
        jnp.take_along_axis(prefixes, jnp.maximum(lens - 1, 0)[:, None],
                            axis=1)[:, 0],
        -1,
    )  # (K,) last symbol or -1 for empty prefix

    # ---- stay candidates -------------------------------------------------
    stay_pb = total + lp[blank]                                   # blank case
    stay_pnb = jnp.where(last >= 0, p_nb + lp[last], NEG)         # repeat-merge
    stay_pb = jnp.where(valid, stay_pb, NEG)
    stay_pnb = jnp.where(valid, stay_pnb, NEG)

    # ---- extend candidates (K, A) ----------------------------------------
    syms = jnp.arange(A)
    is_last = syms[None, :] == last[:, None]                      # (K, A)
    src = jnp.where(is_last, p_b[:, None], total[:, None])        # repeat rule
    ext_pnb = src + lp[None, :]                                   # (K, A)
    ext_pnb = jnp.where(syms[None, :] == blank, NEG, ext_pnb)
    ext_pnb = jnp.where(valid[:, None], ext_pnb, NEG)
    ext_pnb = jnp.where((lens >= Lmax)[:, None], NEG, ext_pnb)    # cap length

    # ---- merge extend->stay collisions ------------------------------------
    # E[j, k] = prefix_j == prefix_k + (last_j,)
    pos = jnp.arange(Lmax)[None, None, :]
    eq = prefixes[:, None, :] == prefixes[None, :, :]             # (K, K, L)
    keep = pos < lens[None, :, None]                              # k's length
    shares_stem = jnp.all(eq | ~keep, axis=2)                     # (K, K)
    E = (
        (lens[:, None] == lens[None, :] + 1)
        & shares_stem
        & valid[:, None] & valid[None, :]
        & (last[:, None] >= 0)
    )
    # mass flowing from extend (k, last_j) into stay j
    C = jnp.where(E, ext_pnb[:, jnp.maximum(last, 0)].T, NEG)     # (j, k)
    merged_in = jax.nn.logsumexp(C, axis=1, where=None)           # may be -inf
    merged_in = jnp.where(jnp.any(E, axis=1), merged_in, NEG)
    stay_pnb = _lae(stay_pnb, jnp.maximum(merged_in, NEG))

    # kill merged extend candidates: kill[k, s] = exists j with E[j,k], last_j==s
    onehot_last = jax.nn.one_hot(jnp.maximum(last, 0), A, dtype=jnp.float32)
    onehot_last = onehot_last * (last >= 0)[:, None]
    kill = (E.astype(jnp.float32).T @ onehot_last) > 0            # (K, A)
    ext_pnb = jnp.where(kill, NEG, ext_pnb)

    # ---- top-K over K stay + K*A extend candidates ------------------------
    cand_pb = jnp.concatenate([stay_pb, jnp.full((K * A,), NEG)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    scores = _lae(cand_pb, cand_pnb)
    top_scores, top_idx = jax.lax.top_k(scores, K)

    is_stay = top_idx < K
    parent = jnp.where(is_stay, top_idx, (top_idx - K) // A)      # (K,)
    sym = jnp.where(is_stay, 0, (top_idx - K) % A)

    new_prefixes = prefixes[parent]                               # (K, Lmax)
    new_lens = lens[parent]
    write_pos = jnp.arange(Lmax)[None, :] == new_lens[:, None]
    ext_mask = (~is_stay)[:, None] & write_pos
    new_prefixes = jnp.where(ext_mask, sym[:, None], new_prefixes)
    new_lens = new_lens + (~is_stay).astype(new_lens.dtype)

    new_pb = cand_pb[top_idx]
    new_pnb = cand_pnb[top_idx]
    # dead slots stay dead
    dead = top_scores <= NEG / 2
    new_pb = jnp.where(dead, NEG, new_pb)
    new_pnb = jnp.where(dead, NEG, new_pnb)
    new_lens = jnp.where(dead, 0, new_lens)
    new_prefixes = jnp.where(dead[:, None], 0, new_prefixes)
    return (new_prefixes, new_lens, new_pb, new_pnb)


def _decode_one(log_probs, frame_len, *, K: int, A: int, Lmax: int, blank: int):
    """(T, A) log-probs -> (best prefix (Lmax,), len, nll, beam state)."""
    T = log_probs.shape[0]
    prefixes = jnp.zeros((K, Lmax), jnp.int32)
    lens = jnp.zeros((K,), jnp.int32)
    p_b = jnp.full((K,), NEG).at[0].set(0.0)
    p_nb = jnp.full((K,), NEG)

    def body(state, inp):
        lp, t = inp
        new_state = _step(state, lp, K=K, A=A, Lmax=Lmax, blank=blank)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(t < frame_len, n, o), new_state, state)
        return state, None

    ts = jnp.arange(T)
    (prefixes, lens, p_b, p_nb), _ = jax.lax.scan(
        body, (prefixes, lens, p_b, p_nb), (log_probs, ts))

    scores = _lae(p_b, p_nb)
    best = jnp.argmax(scores)
    return prefixes[best], lens[best], -scores[best], (prefixes, lens, scores)


# ---------------------------------------------------------------------------
# Fast path: rolling-hash prefix identity + backpointer backtracking.
#
# The buffer implementation above carries (K, Lmax) prefixes through the
# scan; its per-frame (K, K, Lmax) stem-equality and (K, Lmax) parent
# gathers dominate decode time (measured 65 ms/batch at B=64 K=16 T=401).
# Here the carry is five (K,) vectors: prefixes are identified by a rolling
# hash h' = h * M + (s + 1) (int32 wraparound), the extend->stay collision
# matrix compares hashes instead of buffers, and each frame only RECORDS
# (parent, symbol) backpointers; the best prefix is reconstructed after the
# scan by one reverse walk. Hash collisions (~K^2*T / 2^32 per utterance)
# can in principle merge distinct prefixes; parity with the buffer oracle
# is tested, and the buffer path remains available via impl="buffer".
# ---------------------------------------------------------------------------

# plain Python int, NOT jnp.int32: a module-level jax array would be
# created UNDER an active trace when this module is first imported from
# inside a traced function (rl/reinforce._mwer_terms does a lazy import),
# permanently binding a leaked tracer that every later trace then captures
# as a phantom lowering input ("Computation compiled for N+1 inputs but
# called with N"). int32 * python-int keeps int32 wraparound semantics.
_HASH_M = 1000003


def _step_hash(state, lp, top_lp, top_sym, *, K: int, M: int, Lmax: int,
               blank: int):
    """One frame update carrying (hash, last, lens, p_b, p_nb), all (K,).
    Returns (new_state, (parent (K,), sym (K,) [-1 = stay])).

    Extend candidates are restricted to the frame's top-M symbols by
    log-prob (top_lp/top_sym, computed ONCE for all frames outside the
    scan). With M >= K+2 this is EXACT: a candidate (k, s) with s outside
    the top-M has, within the same beam k, at least K non-blank symbols s'
    with lp[s'] >= lp[s] and source mass total_k >= src_k(s) — K dominating
    candidates. Each such dominator either survives as an extend or merges
    into a DISTINCT stay (prefix_k + s' differ across s'), whose score is
    >= the dominator's, so (k, s) can never reach the top-K. The merge
    matrix below is computed directly from (p_b, total, lp[last]) and is
    independent of the pruning.
    """
    h, last, lens, p_b, p_nb = state
    total = _lae(p_b, p_nb)
    valid = total > NEG / 2
    lp_last = lp[jnp.maximum(last, 0)]  # (K,)

    # ---- stay candidates ---------------------------------------------------
    stay_pb = jnp.where(valid, total + lp[blank], NEG)
    stay_pnb = jnp.where(valid & (last >= 0), p_nb + lp_last, NEG)

    # ---- extend candidates (K, M) over the frame's top-M symbols -----------
    is_last = top_sym[None, :] == last[:, None]                    # (K, M)
    src = jnp.where(is_last, p_b[:, None], total[:, None])
    ext_pnb = src + top_lp[None, :]
    ext_pnb = jnp.where(top_sym[None, :] == blank, NEG, ext_pnb)
    ext_pnb = jnp.where(valid[:, None], ext_pnb, NEG)
    ext_pnb = jnp.where((lens >= Lmax)[:, None], NEG, ext_pnb)

    # ---- merge extend->stay collisions via hashes ---------------------------
    # E[j, k] = prefix_j == prefix_k + (last_j,)
    h_ext = h[None, :] * _HASH_M + (jnp.maximum(last, 0) + 1)[:, None]  # (j, k)
    E = (
        (h[:, None] == h_ext)
        & (lens[:, None] == lens[None, :] + 1)
        & valid[:, None] & valid[None, :]
        & (last[:, None] >= 0)
    )
    # mass of extend (k, last_j): src is p_b_k when last_j == last_k
    C_src = jnp.where(last[:, None] == last[None, :], p_b[None, :],
                      total[None, :])                               # (j, k)
    C = jnp.where(E, C_src + lp_last[:, None], NEG)
    merged_in = jax.nn.logsumexp(C, axis=1)
    merged_in = jnp.where(jnp.any(E, axis=1), merged_in, NEG)
    stay_pnb = _lae(stay_pnb, jnp.maximum(merged_in, NEG))

    # kill merged extends: kill[k, r] = exists j: E[j, k] & last_j == sym_r
    kill = jnp.any(E[:, :, None] & (last[:, None, None] == top_sym[None, None, :]),
                   axis=0)                                          # (K, M)
    ext_pnb = jnp.where(kill, NEG, ext_pnb)

    # ---- top-K over K stays + K*M extends ------------------------------------
    # lax.top_k for SELECTION, integer index arithmetic + tiny (K,K)/(K,M)
    # one-hot contractions for the PAYLOADS. History: the v1 sort+GATHER
    # step was 78% gathers (benchmarks/beam_attr2.py); v2 replaced both
    # with an O(C^2) pairwise rank + (C,K) one-hot contractions (13.7 ms
    # /batch). Round-3 ablation (benchmarks/beam_round3.py) split v2's
    # cost: the C^2 rank is SLOWER than lax.top_k's sort at C=K(1+M)=304
    # (4.3 vs ~3 ms/batch) and the (C,K)/(K,M,K) payload one-hots cost
    # another 4.6 ms in relayouts. Deriving (parent, sym) from top_idx by
    # integer div/mod and contracting payloads through (K,K) matrices
    # keeps the step gather-free while shrinking payload work ~20x:
    # 13.0 -> 6.2 ms/batch measured on v5e, bit-identical results
    # (lax.top_k and rank_topk share the lower-index tie order).
    scores = jnp.concatenate([_lae(stay_pb, stay_pnb), ext_pnb.reshape(-1)])
    top_scores, top_idx = jax.lax.top_k(scores, K)       # (K,) each

    is_stay = top_idx < K
    parent = jnp.where(is_stay, top_idx, (top_idx - K) // M)   # (K,)
    r = jnp.where(is_stay, 0, (top_idx - K) % M)               # (K,)
    par_ohi = (parent[:, None] == jnp.arange(K)[None, :]).astype(jnp.int32)
    par_ohf = par_ohi.astype(scores.dtype)                     # (new, old)
    r_ohi = ((r[:, None] == jnp.arange(M)[None, :])
             & (~is_stay)[:, None]).astype(jnp.int32)          # (K, M)
    sym = jnp.sum(r_ohi * top_sym[None, :], axis=1)
    sym = jnp.where(is_stay, -1, sym)

    new_h = jnp.sum(par_ohi * h[None, :], axis=1)
    new_h = jnp.where(is_stay, new_h,
                      new_h * _HASH_M + (jnp.maximum(sym, 0) + 1))
    new_last = jnp.where(is_stay, jnp.sum(par_ohi * last[None, :], axis=1),
                         sym)
    new_lens = (jnp.sum(par_ohi * lens[None, :], axis=1)
                + (~is_stay).astype(lens.dtype))
    # stays need (p_b, p_nb) split; an extend's whole mass is its score in p_nb
    new_pb = jnp.where(is_stay,
                       jnp.sum(par_ohf * stay_pb[None, :], axis=1), NEG)
    new_pnb = jnp.where(is_stay,
                        jnp.sum(par_ohf * stay_pnb[None, :], axis=1),
                        top_scores)
    dead = top_scores <= NEG / 2
    new_pb = jnp.where(dead, NEG, new_pb)
    new_pnb = jnp.where(dead, NEG, new_pnb)
    new_lens = jnp.where(dead, 0, new_lens)
    new_h = jnp.where(dead, 0, new_h)
    new_last = jnp.where(dead, -1, new_last)
    return (new_h, new_last, new_lens, new_pb, new_pnb), (parent, sym)


def _scan_hash(log_probs, frame_len, *, K: int, A: int, Lmax: int,
               blank: int, prune: int | None = None, unroll: int = 1):
    """Forward pass of the hash-impl beam: runs the frame scan and returns
    the final per-slot (lens, scores) plus the (T, K) backpointer records
    every slot can be reconstructed from.

    prune: cap on the per-frame top-M symbol count. None/>=K+2 keeps the
    search EXACT (see _step_hash); smaller values shrink the candidate set
    (and the rank/top-K work) at a measured, bounded accuracy deviation.
    unroll: lax.scan unroll factor (less per-iteration loop overhead)."""
    h = jnp.zeros((K,), jnp.int32)
    last = jnp.full((K,), -1, jnp.int32)
    lens = jnp.zeros((K,), jnp.int32)
    p_b = jnp.full((K,), NEG).at[0].set(0.0)
    p_nb = jnp.full((K,), NEG)
    idk = jnp.arange(K)

    # per-frame top-M symbols, hoisted out of the scan (ONE batched top_k
    # over all frames instead of T sequential ones); M = K+2 keeps the
    # pruned search exact — see _step_hash
    M = min(A, K + 2) if prune is None else max(2, min(A, prune))
    top_lp, top_sym = jax.lax.top_k(log_probs, M)  # (T, M) each

    def body(state, inp):
        lp, tlp, tsym, t = inp
        new_state, (parent, sym) = _step_hash(state, lp, tlp, tsym, K=K, M=M,
                                              Lmax=Lmax, blank=blank)
        active = t < frame_len
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new_state, state)
        # frozen frames record identity backpointers
        parent = jnp.where(active, parent, idk)
        sym = jnp.where(active, sym, -1)
        return state, (parent, sym)

    ts = jnp.arange(log_probs.shape[0])
    (h, last, lens, p_b, p_nb), (parents, syms) = jax.lax.scan(
        body, (h, last, lens, p_b, p_nb), (log_probs, top_lp, top_sym, ts),
        unroll=unroll)
    return lens, _lae(p_b, p_nb), parents, syms


def _backtrack_slot(slot, parents, syms, Lmax: int):
    """Reconstruct one slot's prefix by walking t = T-1..0, emitting
    extends (sym >= 0) and compacting them into a (Lmax,) 0-padded row."""
    def back(s, rec):
        parent, sym = rec
        return parent[s], sym[s]  # sym = -1 when this frame was a stay

    _, emitted = jax.lax.scan(back, slot, (parents, syms), reverse=True)
    # emitted (T,) in forward-time order; compact the non-(-1) entries
    is_sym = emitted >= 0
    pos = jnp.cumsum(is_sym.astype(jnp.int32)) - 1  # target index per emission
    onehot = (pos[:, None] == jnp.arange(Lmax)[None, :]) & is_sym[:, None]
    prefix = jnp.sum(jnp.where(onehot, emitted[:, None], 0), axis=0)
    return prefix.astype(jnp.int32)


def _decode_one_hash(log_probs, frame_len, *, K: int, A: int, Lmax: int,
                     blank: int, prune: int | None = None, unroll: int = 1):
    """Backpointer variant of _decode_one. Same return contract."""
    lens, scores, parents, syms = _scan_hash(log_probs, frame_len, K=K, A=A,
                                             Lmax=Lmax, blank=blank,
                                             prune=prune, unroll=unroll)
    best = jnp.argmax(scores)
    prefix = _backtrack_slot(best, parents, syms, Lmax)
    return prefix, lens[best], -scores[best], (None, lens, scores)


def _nbest_one(log_probs, frame_len, *, K: int, A: int, Lmax: int,
               blank: int):
    """All K beam slots, sorted by score descending. Dead slots (never
    populated) carry score NEG -> they sort last with nll ~ +1e30."""
    lens, scores, parents, syms = _scan_hash(log_probs, frame_len, K=K, A=A,
                                             Lmax=Lmax, blank=blank)
    order = jnp.argsort(-scores)  # stable: ties keep slot order
    prefixes = jax.vmap(
        lambda s: _backtrack_slot(s, parents, syms, Lmax))(order)
    return prefixes, lens[order], -scores[order]


@partial(jax.jit, static_argnames=("beam_size", "max_label_len", "blank"))
def beam_decode_nbest(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
                      beam_size: int = 8, max_label_len: int = 256,
                      blank: int = 0):
    """Batched K-best CTC prefix beam search (hash impl).

    Returns:
      labels: (B, K, max_label_len) int32 prefixes (0-padded), slot 0 the
        best — bit-identical to beam_decode's top-1;
      lens: (B, K) int32,
      nll: (B, K) float32 ascending; dead slots ~ +1e30 (mask with
        nll < 1e29). Live slots are DISTINCT label sequences (the beam
        merges by prefix hash), so the set is a true n-best list for
        MWER-style discriminative training (rl/reinforce.py).
    """
    B, T, A = log_probs.shape
    Lmax = min(max_label_len, T)
    fn = partial(_nbest_one, K=beam_size, A=A, Lmax=Lmax, blank=blank)
    labels, lens, nll = jax.vmap(fn)(log_probs.astype(jnp.float32),
                                     frame_lens.astype(jnp.int32))
    if Lmax < max_label_len:
        labels = jnp.pad(labels, ((0, 0), (0, 0), (0, max_label_len - Lmax)))
    return labels, lens, nll


def _step_hash_lm(state, lp, lmn, *, K: int, A: int, Lmax: int, blank: int,
                  lam, beta):
    """LM-fused variant of _step_hash: candidates are RANKED by the shallow-
    fusion objective  acoustic + lam * lm + beta * len  while the carried
    (p_b, p_nb) masses stay purely acoustic (the CTC recursion must not see
    LM mass). Extends run over the full vocab (no top-M pruning: the
    dominance argument that makes pruning exact holds for the acoustic key
    only — an LM-favoured symbol outside the acoustic top-M may win).

    state: (hash, last, last2, lens, p_b, p_nb, lm), all (K,).
    lmn: (K, A) log P_lm(symbol | beam context), from one one-hot matmul.
    """
    h, last, last2, lens, p_b, p_nb, lm = state
    total = _lae(p_b, p_nb)
    valid = total > NEG / 2
    lp_last = lp[jnp.maximum(last, 0)]

    stay_pb = jnp.where(valid, total + lp[blank], NEG)
    stay_pnb = jnp.where(valid & (last >= 0), p_nb + lp_last, NEG)

    syms = jnp.arange(A)
    is_last = syms[None, :] == last[:, None]
    src = jnp.where(is_last, p_b[:, None], total[:, None])
    ext_pnb = src + lp[None, :]
    ext_pnb = jnp.where(syms[None, :] == blank, NEG, ext_pnb)
    ext_pnb = jnp.where(valid[:, None], ext_pnb, NEG)
    ext_pnb = jnp.where((lens >= Lmax)[:, None], NEG, ext_pnb)

    # merge extend->stay collisions via hashes (identical to _step_hash;
    # an extend reproducing beam j's prefix has beam j's LM score by the
    # LM's product decomposition, so only acoustic mass moves)
    h_ext = h[None, :] * _HASH_M + (jnp.maximum(last, 0) + 1)[:, None]
    E = (
        (h[:, None] == h_ext)
        & (lens[:, None] == lens[None, :] + 1)
        & valid[:, None] & valid[None, :]
        & (last[:, None] >= 0)
    )
    C_src = jnp.where(last[:, None] == last[None, :], p_b[None, :],
                      total[None, :])
    C = jnp.where(E, C_src + lp_last[:, None], NEG)
    merged_in = jax.nn.logsumexp(C, axis=1)
    merged_in = jnp.where(jnp.any(E, axis=1), merged_in, NEG)
    stay_pnb = _lae(stay_pnb, jnp.maximum(merged_in, NEG))
    kill = jnp.any(E[:, :, None] & (last[:, None, None] == syms[None, None, :]),
                   axis=0)
    ext_pnb = jnp.where(kill, NEG, ext_pnb)

    # ---- top-K by the FUSED key over K stays + K*A extends ------------------
    cand_ac = jnp.concatenate([_lae(stay_pb, stay_pnb), ext_pnb.reshape(-1)])
    cand_lm = jnp.concatenate([lm, (lm[:, None] + lmn).reshape(-1)])
    cand_len = jnp.concatenate(
        [lens, jnp.broadcast_to(lens[:, None] + 1, (K, A)).reshape(-1)])
    fused = cand_ac + lam * cand_lm + beta * cand_len.astype(cand_ac.dtype)
    fused = jnp.where(cand_ac <= NEG / 2, NEG, fused)
    # lax.top_k selection + integer-derived payloads (same redesign as
    # _step_hash; the LM step additionally needs the selected acoustic and
    # LM masses, contracted through the (K, K)/(K, A) one-hots)
    top_fused, top_idx = jax.lax.top_k(fused, K)
    is_stay = top_idx < K
    parent = jnp.where(is_stay, top_idx, (top_idx - K) // A)
    r = jnp.where(is_stay, 0, (top_idx - K) % A)
    par_ohi = (parent[:, None] == jnp.arange(K)[None, :]).astype(jnp.int32)
    par_ohf = par_ohi.astype(fused.dtype)
    r_ohf = ((r[:, None] == jnp.arange(A)[None, :])
             & (~is_stay)[:, None]).astype(fused.dtype)       # (K, A)
    sym = jnp.where(is_stay, -1, r).astype(jnp.int32)

    par_ac = jnp.sum(par_ohf * _lae(stay_pb, stay_pnb)[None, :], axis=1)
    ext_ac_sel = jnp.sum(r_ohf * (par_ohf @ ext_pnb), axis=1)
    ac_sel = jnp.where(is_stay, par_ac, ext_ac_sel)
    par_lm = jnp.sum(par_ohf * lm[None, :], axis=1)
    lm_step = jnp.sum(r_ohf * (par_ohf @ lmn), axis=1)
    lm_sel = jnp.where(is_stay, par_lm, par_lm + lm_step)

    par_h = jnp.sum(par_ohi * h[None, :], axis=1)
    new_h = jnp.where(is_stay, par_h,
                      par_h * _HASH_M + (jnp.maximum(sym, 0) + 1))
    par_last = jnp.sum(par_ohi * last[None, :], axis=1)
    new_last = jnp.where(is_stay, par_last, sym)
    new_last2 = jnp.where(is_stay,
                          jnp.sum(par_ohi * last2[None, :], axis=1), par_last)
    new_lens = (jnp.sum(par_ohi * lens[None, :], axis=1)
                + (~is_stay).astype(lens.dtype))
    new_pb = jnp.where(is_stay,
                       jnp.sum(par_ohf * stay_pb[None, :], axis=1), NEG)
    new_pnb = jnp.where(is_stay,
                        jnp.sum(par_ohf * stay_pnb[None, :], axis=1), ac_sel)
    dead = ac_sel <= NEG / 2
    new_pb = jnp.where(dead, NEG, new_pb)
    new_pnb = jnp.where(dead, NEG, new_pnb)
    new_lens = jnp.where(dead, 0, new_lens)
    new_h = jnp.where(dead, 0, new_h)
    new_last = jnp.where(dead, -1, new_last)
    new_last2 = jnp.where(dead, -1, new_last2)
    new_lm = jnp.where(dead, 0.0, lm_sel)
    return ((new_h, new_last, new_last2, new_lens, new_pb, new_pnb, new_lm),
            (parent, sym))


def _step_lm_buffer(state, lp, lmn, *, K: int, A: int, Lmax: int, blank: int,
                    lam, beta):
    """Streaming-capable LM-fused step: _step_hash_lm's exact candidate
    set, merge rule, and fused top-K, but carrying the (K, Lmax) prefix
    BUFFERS instead of emitting backpointer records (records grow with T
    and cannot stream; the buffer carry is self-contained, which is what
    serving._chunk_step_beam needs). Semantically identical to
    _step_hash_lm frame-for-frame — parity is tested
    (tests/test_serving.py streaming-LM suite vs beam_decode(lm=...)).

    state: (prefixes (K, Lmax), h, last, last2, lens, p_b, p_nb, lm_sc).
    lmn: (K, A) log P_lm(symbol | beam context).
    """
    prefixes, h, last, last2, lens, p_b, p_nb, lm = state
    (new_h, new_last, new_last2, new_lens, new_pb, new_pnb, new_lm), \
        (parent, sym) = _step_hash_lm(
            (h, last, last2, lens, p_b, p_nb, lm), lp, lmn,
            K=K, A=A, Lmax=Lmax, blank=blank, lam=lam, beta=beta)
    par_ohi = (parent[:, None] == jnp.arange(K)[None, :]).astype(jnp.int32)
    new_prefixes = par_ohi @ prefixes                              # (K, Lmax)
    old_lens = par_ohi @ lens
    write = ((jnp.arange(Lmax)[None, :] == old_lens[:, None])
             & (sym >= 0)[:, None])
    new_prefixes = jnp.where(write, jnp.maximum(sym, 0)[:, None],
                             new_prefixes)
    dead = new_lens == 0
    new_prefixes = jnp.where(dead[:, None], 0, new_prefixes)
    return (new_prefixes, new_h, new_last, new_last2, new_lens, new_pb,
            new_pnb, new_lm)


def lm_context_scores(lm_tab, last, last2):
    """(K, A) log P_lm(next | context) rows for the carried beam contexts —
    the IDENTICAL one-hot contraction as _decode_one_hash_lm's scan body
    (ctx = max(last, 0); row/plane 0 of the table is BOS, which the blank
    id 0 doubles as since blank can never be a prefix's last symbol)."""
    A = lm_tab.shape[-1]
    tab2d = lm_tab.reshape(-1, A)
    ctx = jnp.maximum(last, 0)
    if lm_tab.ndim == 3:
        ctx = jnp.maximum(last2, 0) * A + ctx
    oh = jax.nn.one_hot(ctx, tab2d.shape[0], dtype=tab2d.dtype)
    return oh @ tab2d


def _decode_one_hash_lm(log_probs, frame_len, lm_tab, lam, beta, *, K: int,
                        A: int, Lmax: int, blank: int):
    """Shallow-fusion variant of _decode_one_hash. lm_tab: (A, A) bigram or
    (A, A, A) trigram log-prob table (decoding/lm.py; row 0 = BOS).
    Returned nll is the negative FUSED decision score."""
    T = log_probs.shape[0]
    order = lm_tab.ndim
    tab2d = lm_tab.reshape(-1, A)  # (A, A) or (A*A, A)
    h = jnp.zeros((K,), jnp.int32)
    last = jnp.full((K,), -1, jnp.int32)
    last2 = jnp.full((K,), -1, jnp.int32)
    lens = jnp.zeros((K,), jnp.int32)
    p_b = jnp.full((K,), NEG).at[0].set(0.0)
    p_nb = jnp.full((K,), NEG)
    lm = jnp.zeros((K,))
    idk = jnp.arange(K)

    def body(state, inp):
        lp, t = inp
        lst, lst2 = state[1], state[2]
        ctx = jnp.maximum(lst, 0)
        if order == 3:
            ctx = jnp.maximum(lst2, 0) * A + ctx
        # (K, ctx_size) one-hot x (ctx_size, A): per-beam LM row as one MXU
        # contraction — no gathers inside the scan
        onehot = jax.nn.one_hot(ctx, tab2d.shape[0], dtype=tab2d.dtype)
        lmn = onehot @ tab2d
        new_state, (parent, sym) = _step_hash_lm(state, lp, lmn, K=K, A=A,
                                                 Lmax=Lmax, blank=blank,
                                                 lam=lam, beta=beta)
        active = t < frame_len
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new_state, state)
        parent = jnp.where(active, parent, idk)
        sym = jnp.where(active, sym, -1)
        return state, (parent, sym)

    ts = jnp.arange(T)
    (h, last, last2, lens, p_b, p_nb, lm), (parents, syms) = jax.lax.scan(
        body, (h, last, last2, lens, p_b, p_nb, lm), (log_probs, ts))

    fused = _lae(p_b, p_nb) + lam * lm + beta * lens.astype(p_b.dtype)
    fused = jnp.where(_lae(p_b, p_nb) <= NEG / 2, NEG, fused)
    best = jnp.argmax(fused)

    def back(slot, rec):
        parent, sym = rec
        s = sym[slot]
        nxt = parent[slot]
        return nxt, s

    _, emitted = jax.lax.scan(back, best, (parents, syms), reverse=True)
    is_sym = emitted >= 0
    pos = jnp.cumsum(is_sym.astype(jnp.int32)) - 1
    onehot = (pos[:, None] == jnp.arange(Lmax)[None, :]) & is_sym[:, None]
    prefix = jnp.sum(jnp.where(onehot, emitted[:, None], 0), axis=0)
    return (prefix.astype(jnp.int32), lens[best], -fused[best],
            (None, lens, fused))


def _decode_one_hash_nlm(log_probs, frame_len, nlm_params, lam, beta, *,
                         K: int, A: int, Lmax: int, blank: int):
    """Neural-LM shallow-fusion variant of _decode_one_hash_lm: instead of
    an n-gram table row, each live hypothesis carries its LSTM LM state
    (decoding/neural_lm.py; state has consumed [BOS, prefix...]), the
    per-frame (K, A) next-symbol log-probs come from ONE head matmul, and
    after selection the extended slots advance by one batched LSTM step
    routed through the (K, K) parent one-hot — gather-free, like every
    other payload in the scan. Ranking/merging reuses _step_hash_lm
    verbatim (it only consumes the (K, A) LM rows)."""
    from .neural_lm import lm_advance, lm_init_state, lm_next_logp

    T = log_probs.shape[0]
    h = jnp.zeros((K,), jnp.int32)
    last = jnp.full((K,), -1, jnp.int32)
    last2 = jnp.full((K,), -1, jnp.int32)
    lens = jnp.zeros((K,), jnp.int32)
    p_b = jnp.full((K,), NEG).at[0].set(0.0)
    p_nb = jnp.full((K,), NEG)
    lm = jnp.zeros((K,))
    lm_state = lm_init_state(nlm_params, K)  # (L, 2, K, H) f32
    idk = jnp.arange(K)

    def body(carry, inp):
        state, lm_state = carry
        lp, t = inp
        lmn = lm_next_logp(nlm_params, lm_state)  # (K, A)
        new_state, (parent, sym) = _step_hash_lm(state, lp, lmn, K=K, A=A,
                                                 Lmax=Lmax, blank=blank,
                                                 lam=lam, beta=beta)
        # LM states follow the beam: parent-select, then advance extends
        par_oh = (parent[:, None] == idk[None, :]).astype(lm_state.dtype)
        state_sel = jnp.einsum("jp,lgph->lgjh", par_oh, lm_state)
        onehot = jax.nn.one_hot(jnp.maximum(sym, 0), A, dtype=lm_state.dtype)
        advanced = lm_advance(nlm_params, state_sel, onehot)
        new_lm_state = jnp.where((sym >= 0)[None, None, :, None], advanced,
                                 state_sel)
        active = t < frame_len
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new_state, state)
        new_lm_state = jnp.where(active, new_lm_state, lm_state)
        parent = jnp.where(active, parent, idk)
        sym = jnp.where(active, sym, -1)
        return (state, new_lm_state), (parent, sym)

    ts = jnp.arange(T)
    init = ((h, last, last2, lens, p_b, p_nb, lm), lm_state)
    ((h, last, last2, lens, p_b, p_nb, lm), _), (parents, syms) = \
        jax.lax.scan(body, init, (log_probs, ts))

    fused = _lae(p_b, p_nb) + lam * lm + beta * lens.astype(p_b.dtype)
    fused = jnp.where(_lae(p_b, p_nb) <= NEG / 2, NEG, fused)
    best = jnp.argmax(fused)
    prefix = _backtrack_slot(best, parents, syms, Lmax)
    return prefix, lens[best], -fused[best], (None, lens, fused)


def _backtrack_batch(parents, syms, lens, scores, Lmax):
    """Shared backpointer reconstruction. parents/syms (T, B, K);
    lens/scores (B, K). Returns (labels (B, Lmax), lens (B,), nll (B,))."""
    best = jnp.argmax(scores, axis=1)  # (B,)

    def back(slot, rec):
        parent, sym = rec  # (B, K) each
        s = jnp.take_along_axis(sym, slot[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(parent, slot[:, None], axis=1)[:, 0]
        return nxt, s

    _, emitted = jax.lax.scan(back, best, (parents, syms), reverse=True)
    emitted = emitted.T  # (B, T) forward-time emission records, -1 = stay
    is_sym = emitted >= 0
    pos = jnp.cumsum(is_sym.astype(jnp.int32), axis=1) - 1
    onehot = (pos[:, :, None] == jnp.arange(Lmax)[None, None, :]) \
        & is_sym[:, :, None]
    labels = jnp.sum(jnp.where(onehot, emitted[:, :, None], 0), axis=1)
    blens = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    nll = -jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return labels.astype(jnp.int32), blens, nll


@partial(jax.jit, static_argnames=("beam_size", "max_label_len", "blank",
                                   "impl", "interpret", "prune", "unroll"))
def beam_decode(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
                beam_size: int = 16, max_label_len: int = 256,
                blank: int = 0, impl: str | None = None,
                interpret: bool = False, lm=None, lm_weight=0.3,
                length_bonus=0.0, prune: int | None = None,
                unroll: int = 1, neural_lm=None):
    """Batched CTC prefix beam search on device.

    Args:
      log_probs: (B, T, A) per-frame log-posteriors.
      frame_lens: (B,) valid frame counts.
      impl: "hash" (rolling-hash + backpointers in a lax.scan — the default),
        "buffer" (explicit prefix buffers — the structural oracle), or
        "pallas" (whole scan in one TPU kernel, decoding/pallas_beam.py;
        parity-tested but MEASURED SLOWER than the hash scan — its tiny
        (B,K,M) tensors waste the 128-lane VPU; kept as an explicit opt-in
        and a documented negative result, docs/PERF.md). None -> "hash".
      lm: optional (A, A) bigram or (A, A, A) trigram log-prob table
        (decoding/lm.py) for shallow fusion: candidates rank by
        acoustic + lm_weight * log P_lm + length_bonus * len. Hash impl
        only; nll becomes the negative fused decision score.
      lm_weight / length_bonus: fusion coefficients (traced scalars — no
        recompile when tuning).
      prune: per-frame top-M symbol cap for the hash impl. None keeps the
        EXACT M=K+2 (pruning provably cannot change the result); smaller
        M shrinks the per-frame candidate set K(1+M) — faster, with a
        measured, bounded deviation (benchmarks/beam_round3.py).
      unroll: lax.scan unroll factor for the frame loop (hash impl).
      neural_lm: LSTM LM params (decoding/neural_lm.py) for shallow
        fusion with beam-carried LM states; mutually exclusive with `lm`.
        Same fused objective and lm_weight/length_bonus coefficients.
    Returns:
      labels: (B, max_label_len) int32 best prefixes (0-padded),
      lens: (B,) int32,
      nll: (B,) float32 negative (fused, if lm) log-likelihood of the best.
    """
    B, T, A = log_probs.shape
    Lmax = min(max_label_len, T)
    if impl is None:
        impl = "hash"
    if neural_lm is not None:
        if lm is not None:
            raise ValueError("pass either lm (n-gram table) or neural_lm, "
                             "not both")
        if impl != "hash":
            raise ValueError("neural-LM shallow fusion requires impl='hash' "
                             f"(got {impl!r})")
        fn = partial(_decode_one_hash_nlm, K=beam_size, A=A, Lmax=Lmax,
                     blank=blank)
        labels, lens, nll, _ = jax.vmap(
            fn, in_axes=(0, 0, None, None, None))(
            log_probs.astype(jnp.float32), frame_lens.astype(jnp.int32),
            neural_lm, jnp.float32(lm_weight), jnp.float32(length_bonus))
        if Lmax < max_label_len:
            labels = jnp.pad(labels, ((0, 0), (0, max_label_len - Lmax)))
        return labels, lens, nll
    if lm is not None:
        if impl != "hash":
            raise ValueError("LM shallow fusion requires impl='hash' "
                             f"(got {impl!r})")
        fn = partial(_decode_one_hash_lm, K=beam_size, A=A, Lmax=Lmax,
                     blank=blank)
        labels, lens, nll, _ = jax.vmap(fn, in_axes=(0, 0, None, None, None))(
            log_probs.astype(jnp.float32), frame_lens.astype(jnp.int32),
            jnp.asarray(lm, jnp.float32), jnp.float32(lm_weight),
            jnp.float32(length_bonus))
        if Lmax < max_label_len:
            labels = jnp.pad(labels, ((0, 0), (0, max_label_len - Lmax)))
        return labels, lens, nll
    if impl == "pallas":
        assert blank == 0, "pallas beam kernel hardcodes blank=0"
        from .pallas_beam import beam_scan_pallas

        parents, syms, lens, scores = beam_scan_pallas(
            log_probs.astype(jnp.float32), frame_lens.astype(jnp.int32),
            K=beam_size, Lmax=Lmax, interpret=interpret)
        labels, lens, nll = _backtrack_batch(parents, syms, lens, scores,
                                             Lmax)
    else:
        if impl == "hash":
            one = partial(_decode_one_hash, prune=prune, unroll=unroll)
        else:
            one = _decode_one
        fn = partial(one, K=beam_size, A=A, Lmax=Lmax, blank=blank)
        labels, lens, nll, _ = jax.vmap(fn)(log_probs.astype(jnp.float32),
                                            frame_lens.astype(jnp.int32))
    if Lmax < max_label_len:
        labels = jnp.pad(labels, ((0, 0), (0, max_label_len - Lmax)))
    return labels, lens, nll
