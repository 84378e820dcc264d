"""Finer beam-decode cost attribution (follow-up to beam_opt.py).

Variants (all measurement-only; some INEXACT by construction):
  full      — hash step + backtrack (== production "hash")
  noback    — main scan only, labels not reconstructed (isolates backtrack)
  nosort    — top_k replaced by a static slice of the first K candidates
              (INEXACT; isolates the sort's cost)
  scoreonly — candidate scoring only, no sort/no state gathers: carry is
              folded with a cheap max (INEXACT; the elementwise floor)

Usage: python benchmarks/beam_attr2.py [--k 16] [--b 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_chain(fn, lp, flens, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(lp):
        def body(lp, _):
            out = fn(lp, flens)
            nll = out[-1]
            return lp + 1e-12 * jnp.sum(nll), None
        lp, _ = jax.lax.scan(body, lp, None, length=steps)
        return lp

    out = chain(lp)
    jax.block_until_ready(out)
    t0 = time.time()
    out = chain(lp)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1000.0


def make_fn(variant: str, K: int, A: int):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from pg_asr_tpu.decoding import beam as bm

    NEG, _lae, _HASH_M = bm.NEG, bm._lae, bm._HASH_M

    def decode_one(log_probs, frame_len, Lmax=256):
        T = log_probs.shape[0]
        Lmax = min(Lmax, T)
        M = min(A, K + 2)
        top_lp, top_sym = jax.lax.top_k(log_probs, M)
        h = jnp.zeros((K,), jnp.int32)
        last = jnp.full((K,), -1, jnp.int32)
        lens = jnp.zeros((K,), jnp.int32)
        p_b = jnp.full((K,), NEG).at[0].set(0.0)
        p_nb = jnp.full((K,), NEG)
        idk = jnp.arange(K)

        def step(state, lp, tlp, tsym):
            h, last, lens, p_b, p_nb = state
            total = _lae(p_b, p_nb)
            valid = total > NEG / 2
            lp_last = lp[jnp.maximum(last, 0)]
            stay_pb = jnp.where(valid, total + lp[0], NEG)
            stay_pnb = jnp.where(valid & (last >= 0), p_nb + lp_last, NEG)
            is_last = tsym[None, :] == last[:, None]
            src = jnp.where(is_last, p_b[:, None], total[:, None])
            ext_pnb = src + tlp[None, :]
            ext_pnb = jnp.where(tsym[None, :] == 0, NEG, ext_pnb)
            ext_pnb = jnp.where(valid[:, None], ext_pnb, NEG)
            ext_pnb = jnp.where((lens >= Lmax)[:, None], NEG, ext_pnb)
            # merge
            h_ext = h[None, :] * _HASH_M + (jnp.maximum(last, 0) + 1)[:, None]
            E = ((h[:, None] == h_ext)
                 & (lens[:, None] == lens[None, :] + 1)
                 & valid[:, None] & valid[None, :]
                 & (last[:, None] >= 0))
            C_src = jnp.where(last[:, None] == last[None, :], p_b[None, :],
                              total[None, :])
            C = jnp.where(E, C_src + lp_last[:, None], NEG)
            merged_in = jax.nn.logsumexp(C, axis=1)
            merged_in = jnp.where(jnp.any(E, axis=1), merged_in, NEG)
            stay_pnb = _lae(stay_pnb, jnp.maximum(merged_in, NEG))
            kill = jnp.any(
                E[:, :, None] & (last[:, None, None] == tsym[None, None, :]),
                axis=0)
            ext_pnb = jnp.where(kill, NEG, ext_pnb)

            scores = jnp.concatenate([_lae(stay_pb, stay_pnb),
                                      ext_pnb.reshape(-1)])
            if variant == "scoreonly":
                # fold candidates into the carry without sort/gather
                m = jnp.max(scores)
                return (h, last, lens, p_b + 1e-12 * m, p_nb), (idk, idk)
            if variant == "nosort":
                top_scores = jax.lax.dynamic_slice(scores, (0,), (K,))
                top_idx = jnp.arange(K)
            elif variant in ("rank", "rankonehot"):
                # exact top-K via pairwise ranks: rank[c] = #{c': s_c' > s_c}
                # + #{c' < c: s_c' == s_c}; ranks are a permutation, so
                # one-hot(rank)[:, :K] IS the (ordered) top-K selection,
                # with top_k's exact tie-break (lower index first).
                C = scores.shape[0]
                iota = jnp.arange(C)
                beats = (scores[None, :] > scores[:, None]) | (
                    (scores[None, :] == scores[:, None])
                    & (iota[None, :] < iota[:, None]))
                rank = jnp.sum(beats, axis=1)                      # (C,)
                oh = (rank[:, None] == jnp.arange(K)[None, :])     # (C, K)
                ohf = oh.astype(scores.dtype)
                top_scores = jnp.sum(ohf * scores[:, None], axis=0)
                top_idx = jnp.sum(
                    jnp.where(oh, iota[:, None], 0), axis=0).astype(jnp.int32)
            else:
                top_scores, top_idx = jax.lax.top_k(scores, K)
            if variant == "rankonehot":
                # payload combine via the SAME one-hot — no gathers at all
                ohi = oh.astype(jnp.int32)
                stay_ohi = ohi[:K]                                 # (K, K)
                ext_ohi = ohi[K:].reshape(K, M, K)
                par_ohi = stay_ohi + jnp.sum(ext_ohi, axis=1)      # (K, K)
                par_ohf = par_ohi.astype(scores.dtype)
                sym_i = jnp.sum(ext_ohi * tsym[None, :, None], axis=(0, 1))
                is_stay = jnp.sum(stay_ohi, axis=0) > 0
                parent = jnp.sum(par_ohi * jnp.arange(K)[:, None], axis=0)
                sym = jnp.where(is_stay, -1, sym_i)
                new_h = jnp.sum(par_ohi * h[:, None], axis=0)
                new_h = jnp.where(is_stay, new_h,
                                  new_h * _HASH_M
                                  + (jnp.maximum(sym, 0) + 1))
                new_last = jnp.where(
                    is_stay, jnp.sum(par_ohi * last[:, None], axis=0), sym)
                new_lens = (jnp.sum(par_ohi * lens[:, None], axis=0)
                            + (~is_stay).astype(jnp.int32))
                new_pb = jnp.where(
                    is_stay,
                    jnp.sum(par_ohf * stay_pb[:, None], axis=0), NEG)
                new_pnb = jnp.where(
                    is_stay,
                    jnp.sum(par_ohf * stay_pnb[:, None], axis=0), top_scores)
                dead = top_scores <= NEG / 2
                new_pb = jnp.where(dead, NEG, new_pb)
                new_pnb = jnp.where(dead, NEG, new_pnb)
                return (new_h, new_last, jnp.where(dead, 0, new_lens),
                        new_pb, new_pnb), (parent, sym)
            is_stay = top_idx < K
            parent = jnp.where(is_stay, top_idx, (top_idx - K) // M)
            sym = jnp.where(is_stay, -1,
                            tsym[jnp.maximum(top_idx - K, 0) % M])
            new_h = jnp.where(is_stay, h[parent],
                              h[parent] * _HASH_M + (jnp.maximum(sym, 0) + 1))
            new_last = jnp.where(is_stay, last[parent], sym)
            new_lens = lens[parent] + (~is_stay).astype(lens.dtype)
            new_pb = jnp.where(is_stay, stay_pb[parent], NEG)
            new_pnb = jnp.where(is_stay, stay_pnb[parent], top_scores)
            dead = top_scores <= NEG / 2
            new_pb = jnp.where(dead, NEG, new_pb)
            new_pnb = jnp.where(dead, NEG, new_pnb)
            return (new_h, new_last, jnp.where(dead, 0, new_lens),
                    new_pb, new_pnb), (parent, sym)

        def body(state, inp):
            lp, tlp, tsym, t = inp
            new_state, (parent, sym) = step(state, lp, tlp, tsym)
            active = t < frame_len
            state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), new_state, state)
            return state, (jnp.where(active, parent, idk),
                           jnp.where(active, sym, -1))

        ts = jnp.arange(T)
        (h, last, lens, p_b, p_nb), (parents, syms) = jax.lax.scan(
            body, (h, last, lens, p_b, p_nb),
            (log_probs, top_lp, top_sym, ts))
        scores = _lae(p_b, p_nb)
        best = jnp.argmax(scores)
        if variant in ("noback", "scoreonly", "nosort"):
            return jnp.zeros((Lmax,), jnp.int32), lens[best], -scores[best]

        def back(slot, rec):
            parent, sym = rec
            return parent[slot], sym[slot]

        _, emitted = jax.lax.scan(back, best, (parents, syms), reverse=True)
        is_sym = emitted >= 0
        pos = jnp.cumsum(is_sym.astype(jnp.int32)) - 1
        onehot = (pos[:, None] == jnp.arange(Lmax)[None, :]) & is_sym[:, None]
        prefix = jnp.sum(jnp.where(onehot, emitted[:, None], 0), axis=0)
        return prefix.astype(jnp.int32), lens[best], -scores[best]

    def fn(lp, fl):
        return jax.vmap(partial(decode_one))(lp.astype(jnp.float32),
                                             fl.astype(jnp.int32))

    return fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=401)
    ap.add_argument("--a", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--variants", default="full,noback,nosort,scoreonly")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((args.b, args.t, args.a)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    flens = jnp.full((args.b,), args.t, jnp.int32)

    results = {"B": args.b, "T": args.t, "A": args.a, "K": args.k,
               "device": str(jax.devices()[0])}
    for v in args.variants.split(","):
        fn = make_fn(v, args.k, args.a)
        ms = time_chain(fn, lp, flens, args.steps)
        results[f"{v}_ms"] = round(ms, 3)
        print(f"[beam_attr2] {v:10s} {ms:8.2f} ms/batch", file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
