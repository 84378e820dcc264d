"""On-device reward functions for policy-gradient fine-tuning.

The reference defines (but never uses) an incremental per-step reward: the
marginal edit-distance change from emitting one more decoded symbol
(reference policy_grad.py:4-16, with its t==0 crash and host-side DP). Here
both reward families run on-chip, batched:

  * sequence-level: R = -CER = -ED(ref, hyp) / len(ref)   (SCST-style)
  * step-level:     r_i = -(ED(ref, hyp[:i+1]) - ED(ref, hyp[:i]))
                    for every emitted symbol i, all prefixes from ONE DP pass
                    (ops/edit_distance.edit_distance_prefixes), t==0 well
                    defined since ED(ref, "") = len(ref).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.edit_distance import (edit_distance, edit_distance_prefixes,
                                 wer_from_ids)


def sequence_reward(ref, ref_lens, hyp, hyp_lens, kind: str = "neg_cer",
                    space_id: int = -1) -> jnp.ndarray:
    """(B,) sequence-level reward.

    kind="neg_cer": -ED/len(ref) at character granularity.
    kind="neg_wer": -word-ED/ref-word-count — the BASELINE north star's
      reward granularity ("sampled CTC paths scored by negative-WER
      rewards"), computed fully on-chip via the word-hash DP
      (ops/edit_distance.wer_from_ids; host contract reference
      metrics.py:27-30). Requires the alphabet's space id.
    """
    if kind == "neg_wer":
        if space_id < 0:
            raise ValueError(
                "neg_wer reward needs the alphabet's space id "
                "(rl.space_id) — use character units with a space symbol")
        return -wer_from_ids(ref, ref_lens, hyp, hyp_lens, space_id)
    d = edit_distance(ref, ref_lens, hyp, hyp_lens)
    return -d.astype(jnp.float32) / jnp.maximum(ref_lens.astype(jnp.float32), 1.0)


def stepwise_reward(ref, ref_lens, hyp, hyp_lens) -> jnp.ndarray:
    """(B, Lh) per-emitted-symbol rewards r_i = -(d[i+1] - d[i]).

    d[0] = ED(ref, "") = len(ref), so the first emission's reward is
    -(ED(ref, hyp[:1]) - len(ref)) — the well-defined version of the
    reference's t==1 special case (reference policy_grad.py:14-15).
    Positions beyond hyp_len get reward 0.
    """
    _, prefix = edit_distance_prefixes(ref, ref_lens, hyp, hyp_lens)  # (B, Lh+1)
    r = -(prefix[:, 1:] - prefix[:, :-1]).astype(jnp.float32)
    pos = jnp.arange(r.shape[1])[None, :]
    return r * (pos < hyp_lens[:, None])
