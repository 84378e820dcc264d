"""CTC forced alignment: Viterbi over the CTC lattice, on-device.

Given a REFERENCE transcript and the model's frame posteriors, find the
most likely frame-level alignment — which frames each label token spans.
This is the dataset-building/subtitling primitive (segment long audio,
time captions) the reference never had; unlike the greedy timestamp
surface (decoding/greedy.py, emission PEAKS of the hypothesis), forced
alignment assigns every frame to a state of the ground-truth transcript,
so tokens get true [start, end] spans.

TPU-first shape: the DP runs as ONE `lax.scan` over frames for the whole
batch — the (B, S) state row updates with two shifted `jnp.where` maxes
(the standard blank-interleaved topology z = [∅ l1 ∅ l2 … lL ∅], S=2L+1;
skip transitions allowed into a non-blank state that differs from the
state two back). Backpointers pack into int8 (0=stay, 1=diag, 2=skip),
(T, B, S) — the only D2H transfer — and the O(T) backtrace runs in numpy
on the host (sequential by nature, a few hundred steps, microseconds).

Reference contract: consumes the same (log_probs, frame_lens, labels,
label_lens) the CTC loss does (ops/ctc.py); blank id 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


@jax.jit
def ctc_viterbi_backpointers(log_probs: jnp.ndarray, frame_lens: jnp.ndarray,
                             labels: jnp.ndarray, label_lens: jnp.ndarray):
    """Forward Viterbi pass over the CTC lattice.

    Args:
      log_probs: (B, T, A) log-softmax outputs.
      frame_lens: (B,) valid frame counts.
      labels: (B, L) 0-padded label ids (no blanks).
      label_lens: (B,) label counts.
    Returns:
      back: (T, B, S) int8 backpointers (0 stay, 1 from s-1, 2 from s-2).
      end_state: (B,) int32 argmax final state (last blank vs last label).
      score: (B,) f32 joint log-prob of the best alignment path.
    """
    B, T, A = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1

    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    lab_pos = jnp.minimum(s_idx // 2, L - 1)
    z = jnp.where(is_label[None, :], jnp.take_along_axis(
        labels, jnp.broadcast_to(lab_pos[None, :], (B, S)), axis=1), 0)
    # skip into state s allowed iff z_s is a label and differs from z_{s-2}
    z_m2 = jnp.pad(z[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    can_skip = is_label[None, :] & (z != z_m2)
    # states beyond this utterance's 2*label_len+1 are dead
    live_state = s_idx[None, :] <= 2 * label_lens[:, None]

    emit = jnp.take_along_axis(  # (B, T, S) emission log-probs per state
        log_probs, jnp.broadcast_to(z[:, None, :], (B, T, S)), axis=2)

    init = jnp.full((B, S), NEG)
    init = init.at[:, 0].set(emit[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(label_lens > 0, emit[:, 0, 1], NEG))
    init = jnp.where(live_state, init, NEG)

    def step(delta, t):
        stay = delta
        diag = jnp.pad(delta[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        skip = jnp.where(can_skip,
                         jnp.pad(delta[:, :-2], ((0, 0), (2, 0)),
                                 constant_values=NEG), NEG)
        best = jnp.maximum(stay, jnp.maximum(diag, skip))
        choice = jnp.where(best == skip, 2,
                           jnp.where(best == diag, 1, 0)).astype(jnp.int8)
        new = jnp.where(live_state, best + emit[:, t], NEG)
        # frames past the utterance end freeze the row (and point 'stay')
        valid_t = (t < frame_lens)[:, None]
        new = jnp.where(valid_t, new, delta)
        choice = jnp.where(valid_t, choice, jnp.int8(0))
        return new, choice

    # t=0 consumed by init; scan frames 1..T-1 (choice for t=0 is all-stay)
    delta, back_rest = jax.lax.scan(step, init, jnp.arange(1, T))
    back0 = jnp.zeros((1, B, S), jnp.int8)
    back = jnp.concatenate([back0, back_rest], axis=0)  # (T, B, S)

    last_blank = 2 * label_lens
    last_label = jnp.maximum(2 * label_lens - 1, 0)
    pick = jax.vmap(lambda row, i: row[i])
    end_state = jnp.where(
        pick(delta, last_blank) >= pick(delta, last_label),
        last_blank, last_label).astype(jnp.int32)
    score = pick(delta, end_state)
    return back, end_state, score


def ctc_forced_align(log_probs, frame_lens, labels, label_lens):
    """Full forced alignment: Viterbi + host backtrace.

    Returns a list of B alignments; each is a list of
    (label_position, start_frame, end_frame_exclusive) spans, one per
    reference token, in order. Utterances whose lattice is infeasible
    (fewer frames than the CTC topology needs) return [].
    """
    back, end_state, score = ctc_viterbi_backpointers(
        log_probs, frame_lens, labels, label_lens)
    back = np.asarray(back)  # (T, B, S)
    end_state = np.asarray(end_state)
    score = np.asarray(score)
    frame_lens = np.asarray(frame_lens)
    label_lens = np.asarray(label_lens)

    out = []
    for b in range(back.shape[1]):
        Tn = int(frame_lens[b])
        Ln = int(label_lens[b])
        if Tn <= 0 or Ln <= 0 or not np.isfinite(score[b]) \
                or score[b] <= NEG / 2:
            out.append([])
            continue
        s = int(end_state[b])
        states = np.empty(Tn, np.int32)
        for t in range(Tn - 1, -1, -1):
            states[t] = s
            s -= int(back[t, b, s])
        spans = []
        for t in range(Tn):
            st = int(states[t])
            if st % 2 == 1:  # label state
                pos = st // 2
                if spans and spans[-1][0] == pos:
                    spans[-1][2] = t + 1
                else:
                    spans.append([pos, t, t + 1])
            # blank states extend nothing
        out.append([tuple(sp) for sp in spans])
    return out
