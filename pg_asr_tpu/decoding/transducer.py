"""Batched on-device greedy transducer decoding.

Frame-synchronous greedy search (the standard RNN-T decode): at each encoder
frame, repeatedly take the joint network's argmax; a label advances the
prediction network and stays on the frame (capped at
config.transducer.max_symbols_per_frame emissions/frame, the usual guard
against degenerate loops), blank moves to the next frame.

TPU-first: ONE lax.scan over frames for the whole batch; the per-frame
expansion is a statically unrolled max_symbols loop of batched joint + LSTM
steps. Output positions are written with one-hot adds (no scatters), the
embedding lookup is a one-hot matmul, and the encoder-side joint projection
is hoisted out of the scan as one (B, T, J) matmul.

The reference has no transducer at all (CTC decode only, reference
CTCdecoder.py); the host oracle lives in tests/test_transducer.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.bilstm_ctc import linear
from ..models.transducer import embed_labels
from ..ops.lstm import _gate_step
from .beam import rank_topk


def _pred_step(params: dict, sym: jnp.ndarray, h: jnp.ndarray,
               c: jnp.ndarray):
    """One prediction-network LSTM step on label ids sym (B,)."""
    p = params["pred_lstm"]
    hidden = p["U"].shape[0]
    x = embed_labels(params, sym)
    pre = (jnp.dot(x, p["W"], preferred_element_type=x.dtype) + p["b"]
           + jnp.dot(h, p["U"], preferred_element_type=x.dtype))
    return _gate_step(h, c, pre, hidden)


def init_decode_state(params: dict, batch: int, dtype):
    """Empty-history decoder state (h, c, g): the prediction net after
    consuming the start (blank) token. Carried across chunks by the
    streaming path (serving.py)."""
    H = params["pred_lstm"]["U"].shape[0]
    h0 = jnp.zeros((batch, H), dtype)
    c0 = jnp.zeros((batch, H), dtype)
    h, c = _pred_step(params, jnp.zeros((batch,), jnp.int32), h0, c0)
    return h, c, linear(params["joint_pred"], h)


def greedy_scan(params: dict, E: jnp.ndarray, out_lens: jnp.ndarray,
                state, max_label_len: int, max_symbols: int,
                pos_offset=None, global_cap: int | None = None):
    """Resumable greedy search over pre-projected encoder frames.

    Args:
      E: (B, T, J) joint-projected encoder states (linear(joint_enc, enc)).
      out_lens: (B,) valid frame counts within E.
      state: (h, c, g) decoder state from init_decode_state / a previous
        chunk's return.
      pos_offset/global_cap: streaming only — labels already emitted by
        earlier chunks (B,) and the whole-stream emission cap; emissions
        stop (state frozen) once pos_offset + pos reaches global_cap,
        matching the offline decode's max_label_len truncation exactly.
    Returns: (labels (B, max_label_len) int32 0-padded, lens (B,), state).
    """
    B, T, _ = E.shape
    L = max_label_len

    def frame(carry, inp):
        h, c, g, pos, out = carry
        e_t, t = inp  # (B, J), scalar frame index
        active = t < out_lens  # (B,) bool
        for _ in range(max_symbols):
            logits = linear(params["joint_out"],
                            jnp.tanh(e_t + g)).astype(jnp.float32)  # (B, A)
            sym = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = active & (sym != 0) & (pos < L)
            if global_cap is not None:
                emit &= (pos_offset + pos) < global_cap
            h2, c2 = _pred_step(params, sym, h, c)
            keep = emit[:, None]
            h = jnp.where(keep, h2, h)
            c = jnp.where(keep, c2, c)
            g = jnp.where(keep, linear(params["joint_pred"], h2), g)
            out = out + (jax.nn.one_hot(pos, L, dtype=jnp.int32)
                         * (sym * emit.astype(jnp.int32))[:, None])
            pos = pos + emit.astype(jnp.int32)
            active = emit  # blank or cap stops this frame's expansion
        return (h, c, g, pos, out), None

    pos0 = jnp.zeros((B,), jnp.int32)
    out0 = jnp.zeros((B, L), jnp.int32)
    h, c, g = state
    (h, c, g, pos, out), _ = jax.lax.scan(
        frame, (h, c, g, pos0, out0),
        (jnp.swapaxes(E, 0, 1), jnp.arange(T)))
    return out, pos, (h, c, g)


@partial(jax.jit, static_argnames=("cfg", "max_label_len", "max_symbols"))
def transducer_greedy_decode(params: dict, enc: jnp.ndarray,
                             out_lens: jnp.ndarray, cfg: Config,
                             max_label_len: int = 256,
                             max_symbols: int | None = None):
    """Greedy decode encoder states.

    Args:
      enc: (B, T', De) encoder states (models/transducer.encode).
      out_lens: (B,) valid encoder frame counts.
    Returns: (labels (B, max_label_len) int32 0-padded, lens (B,) int32).
    """
    tr = cfg.transducer
    if max_symbols is None:
        max_symbols = tr.max_symbols_per_frame
    B = enc.shape[0]
    E = linear(params["joint_enc"], enc)  # (B, T, J) hoisted out of the scan
    state = init_decode_state(params, B, enc.dtype)
    out, pos, _ = greedy_scan(params, E, out_lens, state, max_label_len,
                              max_symbols)
    return out, pos


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------
#
# Batched frame-synchronous RNN-T beam search with hypothesis merging.
# Search space: alignments with AT MOST `max_symbols` label emissions per
# encoder frame (the same cap as the greedy decoder); hypotheses are label
# HISTORIES, each scoring the logsumexp over all of its surviving alignments.
#
# Per frame, a statically unrolled loop of max_symbols+1 expansion rounds:
#   round j's "active" set holds histories that emitted exactly j labels at
#   this frame. Each round computes ONE (K, A) joint + log-softmax; blank
#   outcomes retire the history into the frame's DONE pool (same history,
#   next frame), label outcomes form the next round's actives (top-K of the
#   K*(A-1) extensions — all distinct histories, because append-one-symbol
#   equality would need equal stems, and active histories are distinct by
#   construction). The done pool DOES need merging: the same history can
#   retire at different rounds via different alignments — duplicates are
#   detected with the rolling prefix hash (same scheme as the CTC hash
#   beam, decoding/beam.py) plus a length check, folded into the first
#   occurrence by logsumexp, and the pool is re-topped to K slots.
#
# Prediction-network states ride along per beam slot ((K, P) h/c and the
# joint-projected (K, J) g); merged hypotheses share a history and therefore
# share a state, so merging never mixes states. Frames at t >= out_len pass
# the state through unchanged.

# plain Python int, NOT jnp.int32 — see decoding/beam.py:_HASH_M (a
# module-level jax array binds a leaked tracer when the module is first
# imported inside a traced function)
_HASH_M = 1_000_003


def _merge_pool(scores, hashes, lens, alive):
    """Fold duplicate (hash, len) entries into their first occurrence by
    logsumexp; returns (merged scores with later duplicates killed)."""
    eq = ((hashes[:, None] == hashes[None, :])
          & (lens[:, None] == lens[None, :])
          & alive[:, None] & alive[None, :])
    n = scores.shape[0]
    idx = jnp.arange(n)
    first = ~jnp.any(eq & (idx[:, None] > idx[None, :]), axis=1)  # no earlier dup
    merged = jax.nn.logsumexp(
        jnp.where(eq, scores[None, :], NEG), axis=1)
    return jnp.where(alive & first, merged, NEG)


NEG = -1.0e30


def _beam_frame(params, carry, e_t, valid_t, *, K: int, A: int, Lmax: int,
                max_symbols: int):
    """One frame of the beam search for ONE utterance. e_t: (J,)."""
    labels0, lens0, score0, hash0, h0, c0, g0 = carry
    dt = h0.dtype

    # the frame's done pool starts empty (all-dead slots)
    d = dict(labels=jnp.zeros_like(labels0), lens=jnp.zeros_like(lens0),
             score=jnp.full((K,), NEG), hash=jnp.zeros_like(hash0),
             h=jnp.zeros_like(h0), c=jnp.zeros_like(c0),
             g=jnp.zeros_like(g0))
    a = dict(labels=labels0, lens=lens0, score=score0, hash=hash0,
             h=h0, c=c0, g=g0)

    for j in range(max_symbols + 1):
        logits = linear(params["joint_out"],
                        jnp.tanh(e_t[None, :] + a["g"])).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)  # (K, A)
        alive = a["score"] > NEG / 2

        # ---- blank outcomes -> merge into the done pool (2K entries) ------
        b_score = jnp.where(alive, a["score"] + lp[:, 0], NEG)
        comb = {k: jnp.concatenate([d[k], a[k]]) for k in
                ("labels", "lens", "hash", "h", "c", "g")}
        comb_score = jnp.concatenate([d["score"], b_score])
        comb_alive = comb_score > NEG / 2
        merged = _merge_pool(comb_score, comb["hash"], comb["lens"],
                             comb_alive)
        # rank_topk + one-hot payload contractions instead of top_k +
        # gathers (the CTC beam's round-2 selection rewrite, docs/PERF.md)
        top_s, oh = rank_topk(merged, K)                 # (2K, K) bool
        ohi = oh.astype(jnp.int32)
        ohf = oh.astype(dt)
        d = {k: jnp.sum(ohi[:, :, None] * comb[k][:, None, :], axis=0)
             if comb[k].ndim == 2 else
             jnp.sum(ohi * comb[k][:, None], axis=0)
             for k in ("labels", "lens", "hash")}
        for k in ("h", "c", "g"):
            d[k] = jnp.einsum("ck,cp->kp", ohf, comb[k],
                              preferred_element_type=dt)
        d["score"] = top_s

        # ---- label outcomes -> next round's actives -----------------------
        if j < max_symbols:
            ext = a["score"][:, None] + lp[:, 1:]  # (K, A-1)
            ext = jnp.where(alive[:, None] & (a["lens"] < Lmax)[:, None],
                            ext, NEG)
            e_s, oh2 = rank_topk(ext.reshape(-1), K)     # (K(A-1), K)
            ext_ohi = oh2.astype(jnp.int32).reshape(K, A - 1, K)
            par_ohi = jnp.sum(ext_ohi, axis=1)           # (K, K) parent map
            par_ohf = par_ohi.astype(dt)
            # dead slots have an all-zero one-hot column: sym 0, zero state
            sym = jnp.sum(ext_ohi * jnp.arange(1, A)[None, :, None],
                          axis=(0, 1))
            dead = e_s <= NEG / 2
            ph = jnp.einsum("ck,cp->kp", par_ohf, a["h"],
                            preferred_element_type=dt)
            pc = jnp.einsum("ck,cp->kp", par_ohf, a["c"],
                            preferred_element_type=dt)
            nh, nc = _pred_step(params, sym, ph, pc)
            new_labels = jnp.sum(
                par_ohi[:, :, None] * a["labels"][:, None, :], axis=0)
            plens = jnp.sum(par_ohi * a["lens"][:, None], axis=0)
            write = (jnp.arange(Lmax)[None, :] == plens[:, None])
            new_labels = jnp.where(write & ~dead[:, None], sym[:, None],
                                   new_labels)
            a = dict(
                labels=new_labels,
                lens=plens + (~dead).astype(plens.dtype),
                score=e_s,
                hash=(jnp.sum(par_ohi * a["hash"][:, None], axis=0)
                      * _HASH_M + sym + 1),
                h=nh, c=nc,
                g=linear(params["joint_pred"], nh),
            )

    new = (d["labels"], d["lens"], d["score"], d["hash"], d["h"], d["c"],
           d["g"])
    # frames past the utterance end leave the beam untouched
    return tuple(jnp.where(valid_t, n, o) for n, o in zip(new, carry))


def _beam_all(params, E, out_len, state0, *, K, A, Lmax, max_symbols):
    """Beam search over one utterance's (T, J) projected encoder frames.
    Returns the FULL surviving pool: (labels (K,Lmax), lens (K,),
    score (K,) log-lik, dead slots ~-1e30)."""
    T = E.shape[0]
    h1, c1, g1 = state0  # (1, P)/(1, J) empty-history state
    P, J = h1.shape[1], g1.shape[1]
    dt = h1.dtype
    carry = (
        jnp.zeros((K, Lmax), jnp.int32),
        jnp.zeros((K,), jnp.int32),
        jnp.full((K,), NEG).at[0].set(0.0),  # only slot 0 alive
        jnp.zeros((K,), jnp.int32),
        jnp.broadcast_to(h1, (K, P)).astype(dt),
        jnp.broadcast_to(c1, (K, P)).astype(dt),
        jnp.broadcast_to(g1, (K, J)).astype(dt),
    )

    def frame(carry, inp):
        e_t, t = inp
        return _beam_frame(params, carry, e_t, t < out_len, K=K, A=A,
                           Lmax=Lmax, max_symbols=max_symbols), None

    carry, _ = jax.lax.scan(frame, carry, (E, jnp.arange(T)))
    return carry[0], carry[1], carry[2]


def _beam_one(params, E, out_len, state0, *, K, A, Lmax, max_symbols):
    """Best-hypothesis beam search over one utterance (see _beam_all)."""
    labels, lens, score = _beam_all(params, E, out_len, state0, K=K, A=A,
                                    Lmax=Lmax, max_symbols=max_symbols)
    best = jnp.argmax(score)
    return labels[best], lens[best], -score[best]


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_label_len",
                                   "max_symbols"))
def transducer_beam_decode(params: dict, enc: jnp.ndarray,
                           out_lens: jnp.ndarray, cfg: Config,
                           beam_size: int = 4, max_label_len: int = 256,
                           max_symbols: int | None = None):
    """Batched on-device RNN-T beam search (see the block comment above).

    Args:
      enc: (B, T', De) encoder states (models/transducer.encode).
      out_lens: (B,) valid encoder frame counts.
    Returns: (labels (B, max_label_len) int32 0-padded, lens (B,) int32,
      nll (B,) = -log P of the best history summed over its alignments).
    """
    tr = cfg.transducer
    if max_symbols is None:
        max_symbols = tr.max_symbols_per_frame
    A = params["joint_out"]["b"].shape[0]
    E = linear(params["joint_enc"], enc)  # (B, T, J)
    state0 = init_decode_state(params, 1, enc.dtype)

    def one(Eb, nb):
        return _beam_one(params, Eb, nb, state0, K=beam_size, A=A,
                         Lmax=max_label_len, max_symbols=max_symbols)

    return jax.vmap(one)(E, out_lens)


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_label_len",
                                   "max_symbols"))
def transducer_beam_nbest(params: dict, enc: jnp.ndarray,
                          out_lens: jnp.ndarray, cfg: Config,
                          beam_size: int = 4, max_label_len: int = 256,
                          max_symbols: int | None = None):
    """Full n-best pool of the RNN-T beam — the hypothesis list MWER
    fine-tuning re-scores with the differentiable lattice loss
    (rl/reinforce._mwer_transducer_terms).

    Returns (labels (B,K,max_label_len) int32 0-padded, lens (B,K) int32,
    score (B,K) f32 = beam log-lik, dead slots ~-1e30)."""
    tr = cfg.transducer
    if max_symbols is None:
        max_symbols = tr.max_symbols_per_frame
    A = params["joint_out"]["b"].shape[0]
    E = linear(params["joint_enc"], enc)  # (B, T, J)
    state0 = init_decode_state(params, 1, enc.dtype)

    def one(Eb, nb):
        return _beam_all(params, Eb, nb, state0, K=beam_size, A=A,
                         Lmax=max_label_len, max_symbols=max_symbols)

    return jax.vmap(one)(E, out_lens)
