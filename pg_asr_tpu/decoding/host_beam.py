"""Host (numpy) CTC prefix beam search — the correctness oracle.

Implements the standard CTC prefix beam search (Hannun et al., arXiv:1408.2873)
with identical *semantics* to the reference decoder (reference
CTCdecoder.py:41-116): beam entries carry (log p ending-in-blank, log p
ending-in-non-blank); blanks keep the prefix; repeated symbols merge unless
separated by a blank; beams are ranked by logaddexp(p_b, p_nb) descending and
trimmed each frame; returns (best label tuple, negative log-likelihood).

This implementation is a fresh design: per-frame it vectorizes over the vocab
with numpy and stores the beam as a dict keyed by prefix tuple, rather than
the reference's triple Python loop. The on-device vectorized version lives in
decoding/beam.py; tests check both against each other and against the
reference oracle imported from /root/reference.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def _lae(a: float, b: float) -> float:
    """logaddexp that tolerates -inf."""
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    return float(np.logaddexp(a, b))


class HostCTCBeamDecoder:
    """CTC prefix beam search over per-frame posteriors.

    Args to decode():
      probs: (T, S) post-softmax probabilities (NOT log) — same contract as
             the reference decoder.
      beam_size: beam width.
      blank: CTC blank index (0 by convention, = '<pad>').
    Returns (prefix_tuple, neg_log_likelihood).
    """

    def __init__(self, alphabet=None):
        self.alphabet = alphabet  # kept for interface parity; decode is id-based

    def decode(self, probs: np.ndarray, beam_size: int = 16, blank: int = 0,
               lm: np.ndarray | None = None, lm_weight: float = 0.3,
               length_bonus: float = 0.0):
        """With `lm` (an (A,A)/(A,A,A) log-prob table, decoding/lm.py),
        beams rank by the shallow-fusion key acoustic + lm_weight*logP_lm +
        length_bonus*len; the carried (p_b, p_nb) stay acoustic. Returns the
        negative fused score in that case."""
        probs = np.asarray(probs, dtype=np.float64)
        T, S = probs.shape
        with np.errstate(divide="ignore"):
            logp = np.log(probs)

        if lm is None:
            key = lambda kv: _lae(kv[1][0], kv[1][1])  # noqa: E731
        else:
            # lm: an (A,A)/(A,A,A) log-prob table OR any callable
            # prefix -> log P_lm(prefix) (e.g. the neural LM's
            # score_prefix_neural) — the oracle for fusion-parity tests
            if callable(lm):
                score = lm
            else:
                from functools import partial

                from .lm import score_prefix

                score = partial(score_prefix, lm)

            def key(kv):
                prefix, (pb, pnb) = kv
                return (_lae(pb, pnb) + lm_weight * score(prefix)
                        + length_bonus * len(prefix))

        # beam: prefix tuple -> [p_blank, p_no_blank] (log space)
        beam: dict[tuple, list[float]] = {(): [0.0, NEG_INF]}

        for t in range(T):
            nxt: dict[tuple, list[float]] = {}

            def acc(prefix, pb=NEG_INF, pnb=NEG_INF):
                cur = nxt.setdefault(prefix, [NEG_INF, NEG_INF])
                if pb != NEG_INF:
                    cur[0] = _lae(cur[0], pb)
                if pnb != NEG_INF:
                    cur[1] = _lae(cur[1], pnb)

            lp_t = logp[t]
            for prefix, (p_b, p_nb) in beam.items():
                total = _lae(p_b, p_nb)
                last = prefix[-1] if prefix else None

                # blank: prefix unchanged, ends-in-blank mass grows
                acc(prefix, pb=total + lp_t[blank])

                for s in range(S):
                    if s == blank:
                        continue
                    lp = lp_t[s]
                    if s == last:
                        # repeat without separating blank merges into the same
                        # prefix (ends-in-non-blank)...
                        acc(prefix, pnb=p_nb + lp)
                        # ...and extends only from the ends-in-blank mass
                        acc(prefix + (s,), pnb=p_b + lp)
                    else:
                        acc(prefix + (s,), pnb=total + lp)

            scored = sorted(nxt.items(), key=key, reverse=True)
            beam = dict(scored[:beam_size])

        best_prefix, _ = max(beam.items(), key=key)
        return best_prefix, -key((best_prefix, beam[best_prefix]))


def collapse_repeats(s: str) -> str:
    """Collapse adjacent duplicate characters ("aab bb" -> "ab b").

    Output parity with reference CTCdecoder.py:119-131 (applied there after
    beam decode; note it also collapses legitimate double letters — kept for
    behavioural parity where requested, optional in our pipeline).
    """
    out = []
    for ch in s:
        if not out or ch != out[-1]:
            out.append(ch)
    return "".join(out)
