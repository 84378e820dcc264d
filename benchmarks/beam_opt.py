"""Width-16 beam decode cost attribution + optimization experiments
(VERDICT r1 #8). Times beam_decode variants on the bench workload
(B=64, T=401, A=32) with the docs/PERF.md LICM-safe chained protocol.

Variants:
  hash          — the production impl (baseline)
  buffer        — the explicit-buffer oracle
  nomerge       — hash step with the extend->stay merge/kill logic removed
                  (INEXACT; isolates the merge matrix's cost)
  approxk       — hash step with lax.approx_max_k instead of exact top_k
                  (recall < 1 in general; isolates the top_k cost)
  greedy        — argmax collapse (the floor)

Usage: python benchmarks/beam_opt.py [--k 16] [--steps 16] [--t 401]
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
    """docs/PERF.md protocol: chain `steps` decodes in one executable, the
    carry perturbs the input so LICM cannot hoist the decode."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(lp):
        def body(lp, _):
            labels, lens, nll = fn(lp, flens)
            # carry depends on the output: LICM-safe
            return lp + 1e-12 * jnp.sum(nll), None
        lp, _ = jax.lax.scan(body, lp, None, length=steps)
        return lp

    out = chain(lp)
    jax.block_until_ready(out)  # compile
    t0 = time.time()
    out = chain(lp)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1000.0  # ms per batch-decode


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=401)
    ap.add_argument("--a", type=int, default=32)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--variants", default="greedy,hash,nomerge,approxk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pg_asr_tpu.decoding import beam as beam_mod
    from pg_asr_tpu.decoding.beam import beam_decode

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((args.b, args.t, args.a)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    flens = jnp.full((args.b,), args.t, jnp.int32)
    K = args.k

    results = {"B": args.b, "T": args.t, "A": args.a, "K": K,
               "device": str(jax.devices()[0])}

    for variant in args.variants.split(","):
        if variant == "greedy":
            from pg_asr_tpu.decoding.greedy import greedy_decode

            def fn(lp, fl):
                mask = (jnp.arange(args.t)[None, :]
                        < fl[:, None]).astype(jnp.float32)
                ids, lens = greedy_decode(lp, mask)
                return ids, lens, jnp.zeros((args.b,), jnp.float32)
        elif variant in ("hash", "buffer"):
            def fn(lp, fl, _v=variant):
                return beam_decode(lp, fl, beam_size=K, max_label_len=256,
                                   impl=_v)
        elif variant == "nomerge":
            fn = _make_patched(beam_mod, K, args.a, merge=False,
                               approx=False)
        elif variant == "approxk":
            fn = _make_patched(beam_mod, K, args.a, merge=True, approx=True)
        else:
            print(f"[beam_opt] unknown variant {variant}", file=sys.stderr)
            continue
        try:
            ms = time_chain(fn, lp, flens, args.steps)
            results[f"{variant}_ms"] = round(ms, 3)
            print(f"[beam_opt] {variant:8s} {ms:8.2f} ms/batch",
                  file=sys.stderr)
        except Exception as e:
            print(f"[beam_opt] {variant} failed: {e!r}", file=sys.stderr)

    print(json.dumps(results))
    return 0


def _make_patched(beam_mod, K: int, A: int, merge: bool, approx: bool):
    """Build a decode fn from a locally modified _step_hash (no merge and/or
    approx top_k) for cost attribution. INEXACT variants — measurement only."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    NEG = beam_mod.NEG
    _lae = beam_mod._lae
    _HASH_M = beam_mod._HASH_M

    def step(state, lp, top_lp, top_sym, *, M, Lmax, blank=0):
        h, last, lens, p_b, p_nb = state
        total = _lae(p_b, p_nb)
        valid = total > NEG / 2
        lp_last = lp[jnp.maximum(last, 0)]
        stay_pb = jnp.where(valid, total + lp[blank], NEG)
        stay_pnb = jnp.where(valid & (last >= 0), p_nb + lp_last, NEG)
        is_last = top_sym[None, :] == last[:, None]
        src = jnp.where(is_last, p_b[:, None], total[:, None])
        ext_pnb = src + top_lp[None, :]
        ext_pnb = jnp.where(top_sym[None, :] == blank, NEG, ext_pnb)
        ext_pnb = jnp.where(valid[:, None], ext_pnb, NEG)
        ext_pnb = jnp.where((lens >= Lmax)[:, None], NEG, ext_pnb)
        if merge:
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
            kill = jnp.any(E[:, :, None]
                           & (last[:, None, None] == top_sym[None, None, :]),
                           axis=0)
            ext_pnb = jnp.where(kill, NEG, ext_pnb)
        scores = jnp.concatenate([_lae(stay_pb, stay_pnb),
                                  ext_pnb.reshape(-1)])
        if approx:
            top_scores, top_idx = jax.lax.approx_max_k(scores, K)
        else:
            top_scores, top_idx = jax.lax.top_k(scores, K)
        is_stay = top_idx < K
        parent = jnp.where(is_stay, top_idx, (top_idx - K) // M)
        sym = jnp.where(is_stay, -1,
                        top_sym[jnp.maximum(top_idx - K, 0) % M])
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

        def body(state, inp):
            lp, tlp, tsym, t = inp
            new_state, (parent, sym) = step(state, lp, tlp, tsym, M=M,
                                            Lmax=Lmax)
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


if __name__ == "__main__":
    raise SystemExit(main())
