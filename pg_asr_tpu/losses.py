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


def seq2seq_nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
                     target_lens: jnp.ndarray, include_eos: bool = True) -> jnp.ndarray:
    """Training loss for the attention seq2seq family: sum over decoder
    steps of batch-mean NLL over utterances still active at that step.

    Unlike summed_nll_loss's id-based pad masking, positions are masked by
    TRUE length — and with include_eos the first pad slot after each target
    stays in the loss, teaching the model to emit pad(0) as an end-of-
    sequence symbol so free-running generation terminates (the reference's
    alphabet has no EOS and its eval teacher-forces instead, reference
    model.py:314; this is the fixed-up behavior).

    Args: log_probs (B, Td, A); targets (B, Td) 0-padded; target_lens (B,).
    """
    num, den = seq2seq_nll_terms(log_probs, targets, target_lens, include_eos)
    return jnp.sum(num / jnp.maximum(den, 1.0))


def seq2seq_nll_terms(log_probs: jnp.ndarray, targets: jnp.ndarray,
                      target_lens: jnp.ndarray, include_eos: bool = True):
    """Per-decoder-step (numerator (Td,), denominator (Td,)) of the
    seq2seq loss — SPMD shards psum these elementwise so ragged batches
    reduce to the exact global per-step means (see train._use_shard_map)."""
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]  # (B, Td)
    pos = jnp.arange(targets.shape[1])[None, :]
    lim = target_lens[:, None] + (1 if include_eos else 0)
    # zero-length rows are batch padding (pad_batch_to_multiple) — excluded
    keep = ((pos < lim) & (target_lens[:, None] > 0)).astype(log_probs.dtype)
    return jnp.sum(nll * keep, axis=0), jnp.sum(keep, axis=0)


def masked_mean_nll(log_probs: jnp.ndarray, targets: jnp.ndarray,
                    ignore_index: int = PAD_ID) -> jnp.ndarray:
    """Token-mean NLL over non-pad positions (the standard normalization)."""
    nll = -jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    keep = (targets != ignore_index).astype(log_probs.dtype)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
