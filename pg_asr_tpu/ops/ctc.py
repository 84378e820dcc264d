"""CTC loss on-chip: batched log-space forward recursion via lax.scan.

The whole forward-backward stays on device (BASELINE north star: "loss ...
runs fully on-chip with no host round-trips"); gradients come from autodiff
through the scan, which XLA rematerializes efficiently.

Conventions: blank = 0 (= '<pad>', reference parity), labels are 0-padded
(B, L) with true lengths (B,), log_probs are per-frame log-posteriors
(B, T, A) with frame lengths (B,).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

NEG = -1.0e30  # finite -inf stand-in: keeps grads NaN-free

# Scan-unroll for the alpha recursion (sweepable: PGASR_CTC_UNROLL=4)
UNROLL = int(os.environ.get("PGASR_CTC_UNROLL", "8"))


def _extend_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) labels -> (B, 2L+1) blank-interleaved extended sequence."""
    B, L = labels.shape
    z = jnp.full((B, 2 * L + 1), blank, dtype=labels.dtype)
    return z.at[:, 1::2].set(labels)


@partial(jax.jit, static_argnames=("blank", "unroll"))
def ctc_loss(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
             labels: jnp.ndarray, label_lens: jnp.ndarray,
             blank: int = 0, unroll: int = UNROLL) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    Args:
      log_probs: (B, T, A) log-softmax outputs.
      frame_lens: (B,) valid frame counts.
      labels: (B, L) 0-padded label ids (no blanks).
      label_lens: (B,) true label lengths.
    Returns: (B,) float32 NLL (large/"inf-like" when no alignment exists).
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, A = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    z = _extend_labels(labels.astype(jnp.int32), blank)  # (B, S)
    # skip transition allowed into s when z[s] != blank and z[s] != z[s-2]
    z_shift2 = jnp.pad(z[:, :-2], ((0, 0), (2, 0)), constant_values=blank)
    can_skip = (z != blank) & (z != z_shift2)  # (B, S)
    pos = jnp.arange(S)[None, :]
    # states beyond the true extended length are dead
    alive = pos < (2 * label_lens[:, None] + 1)

    # Hoist ALL emission lookups out of the recursion as one one-hot matmul:
    # em[b,t,s] = log_probs[b,t,z[b,s]]. A per-step gather inside the scan
    # serializes T slow gathers forward and T scatters backward; the einsum
    # is one MXU pass each way (0/1 matrix in f32 -> exact).
    z_onehot = jax.nn.one_hot(z, A, dtype=jnp.float32)  # (B, S, A)
    em_all = jnp.einsum("bta,bsa->bts", log_probs, z_onehot,
                        preferred_element_type=jnp.float32)  # (B, T, S)

    alpha0 = jnp.full((B, S), NEG)
    e0 = em_all[:, 0, :]
    alpha0 = alpha0.at[:, 0].set(e0[:, 0])
    has_label = label_lens > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, e0[:, 1], NEG))
    alpha0 = jnp.where(alive, alpha0, NEG)

    em_t = jnp.swapaxes(em_all, 0, 1)  # (T, B, S)

    def step(alpha, inp):
        em, t = inp  # em: (B, S) this frame's emissions, already gathered
        a1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        a2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG)
        acc = jnp.logaddexp(alpha, a1)
        acc = jnp.where(can_skip, jnp.logaddexp(acc, a2), acc)
        new = jnp.where(alive, acc + em, NEG)
        # frames past each utterance's length leave alpha untouched
        valid_t = (t < frame_lens)[:, None]
        return jnp.where(valid_t, new, alpha), None

    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(step, alpha0, (em_t[1:], ts), unroll=unroll)

    # final states: last blank (2*len) and last label (2*len - 1)
    idx_last = 2 * label_lens[:, None]
    a_blank = jnp.take_along_axis(alpha, idx_last, axis=1)[:, 0]
    a_label = jnp.take_along_axis(alpha, jnp.maximum(idx_last - 1, 0), axis=1)[:, 0]
    total = jnp.where(label_lens > 0, jnp.logaddexp(a_blank, a_label), a_blank)
    return -total


def ctc_loss_terms(log_probs, frame_lens, labels, label_lens, blank: int = 0,
                   label_normalize: bool = True):
    """(numerator, denominator) of the batch-mean CTC loss, both scalars.

    Splitting the mean lets SPMD shards psum num/den separately so ragged
    (zero-row-padded) batches give exactly the unpadded global mean.
    Guards: impossible alignments (too few frames) are excluded BEFORE
    normalization; rows with no labels are batch padding
    (parallel/mesh.pad_batch_to_multiple) and are excluded too.
    """
    nll = ctc_loss(log_probs, frame_lens, labels, label_lens, blank)
    finite = (nll < 0.5e30) & (label_lens > 0)
    if label_normalize:
        nll = nll / jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    nll = jnp.where(finite, nll, 0.0)
    return jnp.sum(nll), jnp.sum(finite.astype(jnp.float32))


def ctc_loss_mean(log_probs, frame_lens, labels, label_lens, blank: int = 0,
                  label_normalize: bool = True) -> jnp.ndarray:
    """Scalar training loss: mean over the batch of per-utterance NLL,
    optionally normalized by label length (stabilizes mixed-length batches)."""
    num, den = ctc_loss_terms(log_probs, frame_lens, labels, label_lens,
                              blank, label_normalize)
    return num / jnp.maximum(den, 1.0)
