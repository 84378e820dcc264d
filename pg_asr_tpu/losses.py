"""Sequence losses for the attention seq2seq family.

summed_nll_loss reproduces the reference's intended loss contract
(reference loss.py:5-17): a sum over decoder timesteps of the batch-mean
NLL at each step, with pad (index 0) ignored — fixing the reference's
falsy-zero bug where ignore_index=0 silently disabled ignoring
(reference loss.py:9, SURVEY.md §3.6f). Fully vectorized: one gather +
masked reduction instead of a per-timestep Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp

PAD_ID = 0


def summed_nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
                    ignore_index: int | None = PAD_ID) -> jnp.ndarray:
    """Sum over timesteps of per-step batch-mean NLL.

    Args:
      log_probs: (B, T, A) log-probabilities.
      targets: (B, T) int ids.
      ignore_index: target id excluded from each step's mean (None = keep all).
    """
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]  # (B, T)
    if ignore_index is None:
        return jnp.sum(jnp.mean(nll, axis=0))
    keep = (targets != ignore_index).astype(log_probs.dtype)
    per_step = jnp.sum(nll * keep, axis=0) / jnp.maximum(jnp.sum(keep, axis=0), 1.0)
    return jnp.sum(per_step)


def masked_mean_nll(log_probs: jnp.ndarray, targets: jnp.ndarray,
                    ignore_index: int = PAD_ID) -> jnp.ndarray:
    """Token-mean NLL over non-pad positions (the standard normalization)."""
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    keep = (targets != ignore_index).astype(log_probs.dtype)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
