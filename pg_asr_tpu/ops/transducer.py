"""RNN-T (transducer) loss on-chip: log-space lattice forward recursion as
ONE wavefront (anti-diagonal) lax.scan.

Beyond-reference capability: the reference framework is CTC/seq2seq-only
(reference CTCdecoder.py, loss.py) — the transducer family
(models/transducer.py) adds the standard streaming-ASR objective
(Graves 2012) with everything on-chip.

Lattice: alpha(t, u) = log P(emitted labels[:u] | frames[:t+1] consumed up
to frame t). Recurrence
    alpha(t, u) = logaddexp(alpha(t-1, u) + blank(t-1, u),
                            alpha(t, u-1) + y(t, u-1))
with termination  -log P = -(alpha(T-1, U) + blank(T-1, U)).

TPU-first design:
  * The dependency structure is a 2-D wavefront: every cell on an
    anti-diagonal d = t + u depends only on diagonal d-1. One lax.scan over
    the T+U-1 diagonals computes the whole (T+1)x(U+1) lattice with each
    step doing fully vectorized (B, U+1) VPU work — no per-cell loops.
  * NO gathers inside the scan (docs/PERF.md lesson 1): the blank/label
    emission tables are re-laid-out diagonal-major ONCE outside the scan
    (a single vectorized gather; its autodiff transpose is a single
    scatter), and the scan consumes rows.
  * Label emissions come from ONE one-hot einsum over the vocab
    ("btua,bua->btu") — the same hoisting as the CTC loss (ops/ctc.py).
  * No validity masking is needed inside the recursion: paths are monotone
    in both t and u, so the read-out cell (T_b - 1, U_b) is only reachable
    through t < T_b, u <= U_b. Cells beyond an utterance's true lengths
    compute garbage that is never read (and costs nothing extra — the
    lattice is padded to static shapes anyway).

Conventions match ops/ctc.py: blank = 0, labels 0-padded (B, U) with true
lengths (B,), per-utterance NLL + (num, den) terms for SPMD psum reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1.0e30  # finite -inf stand-in: keeps grads NaN-free (ops/ctc.py)


def joint_log_probs(logits: jnp.ndarray, labels: jnp.ndarray,
                    blank: int = 0):
    """Joint-network logits -> the two emission tables the loss needs.

    Args:
      logits: (B, T, U+1, A) joint outputs (any float dtype; normalized
        in f32 here).
      labels: (B, U) 0-padded label ids.
    Returns:
      lp_blank: (B, T, U+1) log P(blank | t, u).
      lp_label: (B, T, U) log P(labels[u] | t, u) — the emission that
        advances u -> u+1.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)  # (B, T, U+1)
    lp_blank = logits[..., blank] - lse
    A = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, A, dtype=jnp.float32)  # (B, U, A)
    num = jnp.einsum("btua,bua->btu", logits[:, :, :-1, :], onehot,
                     preferred_element_type=jnp.float32)
    return lp_blank, num - lse[:, :, :-1]


@jax.jit
def transducer_loss(lp_blank: jnp.ndarray, lp_label: jnp.ndarray,
                    frame_lens: jnp.ndarray, label_lens: jnp.ndarray
                    ) -> jnp.ndarray:
    """Per-utterance transducer negative log-likelihood.

    Args:
      lp_blank: (B, T, U+1) blank log-probs per lattice cell.
      lp_label: (B, T, U) label-advance log-probs per lattice cell.
      frame_lens: (B,) valid encoder frames (>= 1 for real rows).
      label_lens: (B,) true label lengths (0 marks batch-padding rows).
    Returns: (B,) float32 NLL.
    """
    lp_blank = lp_blank.astype(jnp.float32)
    lp_label = lp_label.astype(jnp.float32)
    B, T, U1 = lp_blank.shape
    U = U1 - 1

    # Diagonal-major re-layout (ONE gather, outside the scan):
    #   BL[b, d, u] = lp_blank[b, d - u, u]
    #   Y [b, d, u] = lp_label[b, d - u, u - 1]   (left-padded with NEG)
    # so that at scan step d both operands of the recurrence are rows of
    # diagonal d-1.
    D = T + U  # diagonals d = t + u in 0 .. D-1
    d_idx = jnp.arange(D)[:, None]
    u_idx = jnp.arange(U1)[None, :]
    t_idx = d_idx - u_idx                    # (D, U1)
    t_ok = (t_idx >= 0) & (t_idx < T)
    t_clip = jnp.clip(t_idx, 0, T - 1)
    BL = jnp.where(t_ok[None], lp_blank[:, t_clip, u_idx], NEG)  # (B, D, U1)
    if U > 0:
        YD = jnp.where(t_ok[None, :, :U],
                       lp_label[:, t_clip[:, :U], u_idx[:, :U]], NEG)
        Y = jnp.pad(YD, ((0, 0), (0, 0), (1, 0)), constant_values=NEG)
    else:
        Y = jnp.full((B, D, U1), NEG)
    BL_t = jnp.swapaxes(BL, 0, 1)  # (D, B, U1) scan-major
    Y_t = jnp.swapaxes(Y, 0, 1)

    alpha0 = jnp.full((B, U1), NEG).at[:, 0].set(0.0)

    def step(alpha, inp):
        bl, y = inp  # both: diagonal d-1, (B, U1)
        stay = alpha + bl  # blank: (t-1, u) -> (t, u)
        adv = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)),
                      constant_values=NEG) + y  # label: (t, u-1) -> (t, u)
        new = jnp.logaddexp(stay, adv)
        return new, new

    _, diag = jax.lax.scan(step, alpha0, (BL_t[:-1], Y_t[:-1]))
    alphas = jnp.concatenate([alpha0[None], diag], axis=0)  # (D, B, U1)

    # read-out: alpha(T_b - 1, U_b) lives on diagonal T_b - 1 + U_b
    b_idx = jnp.arange(B)
    t_fin = jnp.maximum(frame_lens.astype(jnp.int32) - 1, 0)
    u_fin = jnp.minimum(label_lens.astype(jnp.int32), U)
    a_fin = alphas[t_fin + u_fin, b_idx, u_fin]
    bl_fin = lp_blank[b_idx, t_fin, u_fin]
    return -(a_fin + bl_fin)


def transducer_loss_terms(lp_blank, lp_label, frame_lens, label_lens,
                          label_normalize: bool = True):
    """(numerator, denominator) of the batch-mean loss — same SPMD contract
    as ops/ctc.ctc_loss_terms: shards psum num/den separately so ragged
    zero-row-padded batches reduce to exactly the unpadded global mean.
    Rows with no labels are batch padding and are excluded."""
    nll = transducer_loss(lp_blank, lp_label, frame_lens, label_lens)
    finite = (nll < 0.5e30) & (label_lens > 0)
    if label_normalize:
        nll = nll / jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    nll = jnp.where(finite, nll, 0.0)
    return jnp.sum(nll), jnp.sum(finite.astype(jnp.float32))


def transducer_loss_mean(lp_blank, lp_label, frame_lens, label_lens,
                         label_normalize: bool = True) -> jnp.ndarray:
    num, den = transducer_loss_terms(lp_blank, lp_label, frame_lens,
                                     label_lens, label_normalize)
    return num / jnp.maximum(den, 1.0)
