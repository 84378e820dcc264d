"""Two-pass n-best rescoring with the neural LM — the production
alternative to in-beam shallow fusion (decoding/beam.py `neural_lm=`).

First pass: the on-device CTC prefix beam produces a true K-best list
(distinct label sequences, beam.beam_decode_nbest). Second pass: every
hypothesis is re-scored in ONE batched teacher-forced LM sweep
(neural_lm.lm_sequence_logp over B*K rows — a dense (B*K, T) scan, MXU
work, no per-beam-step LM states like fusion carries), and the list is
re-ranked by

    score = log P_am(h|x) + lm_weight * log P_lm(h) + length_bonus * |h|

Fusion biases the SEARCH (it can surface hypotheses the AM beam would
prune); rescoring re-ranks a fixed list but scores each hypothesis with
the LM's full left context at every position for the exact sequence
probability. The standard production setup runs a cheap fused pass wide
and rescoring on the survivors; both are independent knobs here
(`--lm_type neural --lm_pass fused|rescore`).

The reference marked the LM hook it never built at its beam's expansion
point (reference CTCdecoder.py:98); this is the second of the two
classic realizations of that hook.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("beam_size", "max_label_len"))
def rescore_nbest(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
                  neural_lm: dict, beam_size: int = 8,
                  max_label_len: int = 256, lm_weight: float = 0.3,
                  length_bonus: float = 0.0):
    """CTC K-best decode + batched neural-LM re-ranking.

    Args:
      log_probs: (B, T, A) per-frame log-posteriors.
      frame_lens: (B,) valid frame counts.
      neural_lm: LM params (decoding/neural_lm.py).
    Returns:
      labels: (B, max_label_len) int32 re-ranked best (0-padded),
      lens: (B,) int32,
      scores: (B,) f32 combined score of the winner.
    """
    from .beam import beam_decode_nbest
    from .neural_lm import lm_sequence_logp

    labels, lens, nll = beam_decode_nbest(log_probs, frame_lens,
                                          beam_size=beam_size,
                                          max_label_len=max_label_len)
    B, K, L = labels.shape
    lm_lp = lm_sequence_logp(neural_lm, labels.reshape(B * K, L),
                             lens.reshape(B * K)).reshape(B, K)
    live = nll < 1e29
    total = (-nll + lm_weight * lm_lp
             + length_bonus * lens.astype(jnp.float32))
    total = jnp.where(live, total, -jnp.inf)
    best = jnp.argmax(total, axis=1)  # (B,)
    pick = jax.vmap(lambda a, i: a[i])
    return pick(labels, best), pick(lens, best), pick(total, best)
