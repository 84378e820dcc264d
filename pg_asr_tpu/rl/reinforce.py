"""Policy-gradient fine-tuning for EVERY model family — the training loop
the reference only sketched (its reward() is never imported anywhere,
SURVEY.md §3.5).

Objectives by family, all fully on-chip inside one jitted, donated step:

  * CTC families (ctc / transformer / conformer):
      - REINFORCE over sampled alignment paths: sample S paths per
        utterance from the per-frame categorical (temperature-scaled),
        CTC-collapse each (vectorized), reward with negative CER/WER via
        the on-chip edit-distance DP or the reference-style per-step
        ED-delta (rl/reward.py), subtract a greedy self-critic or mean
        baseline, REINFORCE on the masked per-frame log-probs.
      - MWER over the prefix-beam n-best re-scored with the
        differentiable CTC forward DP (_mwer_terms).
  * seq2seq (the reference's namesake target — its reward() consumes
    decoder posteriors, reference policy_grad.py:4-16, model.py:174-183):
      - SCST: sample continuations from the autoregressive decoder,
        greedy self-critic baseline (_scst_seq2seq_terms).
      - MWER over the decoder beam re-scored teacher-forced
        (_mwer_seq2seq_terms).
  * transducer: MWER over the frame-synchronous RNN-T beam re-scored
    with the differentiable lattice loss (_mwer_transducer_terms).

Every objective adds an entropy bonus (where sampling applies) and a
supervised anchor (CTC / NLL / RNN-T loss, weight rl.ctc_mix_weight).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import CheckpointManager, load_checkpoint
from ..config import Config
from ..data.dataset import BatchIterator, load_manifest
from ..data.text import Alphabet
from ..decoding.greedy import collapse_frame_ids, greedy_decode
from ..ops.ctc import ctc_loss_mean
from ..ops.features import extract_features
from ..parallel.mesh import make_mesh, replicate, shard_batch_arrays
from ..utils.logging import StepLogger
from .reward import sequence_reward, stepwise_reward


def _sample_paths(rng, log_probs, num_samples: int, temperature: float):
    """(S, B, T) alignment paths ~ Categorical(log_probs / temperature)."""
    logits = log_probs / jnp.maximum(temperature, 1e-6)
    keys = jax.random.split(rng, num_samples)
    return jax.vmap(lambda k: jax.random.categorical(k, logits))(keys)


def _path_rewards(paths, frame_mask, labels, label_lens, kind: str,
                  space_id: int = -1):
    """Collapse sampled paths and score them. paths: (S, B, T).
    Returns (R (S,B), frame_r (S,B,T) or None, hyp_lens (S,B))."""
    S, B, T = paths.shape
    flat = paths.reshape(S * B, T)
    fmask = jnp.tile(frame_mask, (S, 1))
    hyp, hyp_lens = collapse_frame_ids(flat, fmask)  # (S*B, T), (S*B,)
    ref = jnp.tile(labels, (S, 1))
    ref_lens = jnp.tile(label_lens, (S,))

    if kind == "stepwise_ed":
        r_steps = stepwise_reward(ref, ref_lens, hyp, hyp_lens)  # (S*B, T)
        # scatter per-emission rewards back onto the frames that emitted them
        prev = jnp.pad(flat[:, :-1], ((0, 0), (1, 0)))
        keep = (flat != 0) & (flat != prev) & (fmask > 0)
        pos = jnp.cumsum(keep, axis=1) - 1
        frame_r = jnp.take_along_axis(r_steps, jnp.clip(pos, 0, T - 1), axis=1)
        frame_r = frame_r * keep
        R = jnp.sum(frame_r, axis=1) / jnp.maximum(ref_lens.astype(jnp.float32), 1.0)
        return (R.reshape(S, B), frame_r.reshape(S, B, T) /
                jnp.maximum(ref_lens.astype(jnp.float32), 1.0).reshape(S, B, 1),
                hyp_lens.reshape(S, B))

    R = sequence_reward(ref, ref_lens, hyp, hyp_lens, kind, space_id)
    return R.reshape(S, B), None, hyp_lens.reshape(S, B)


def _mwer_combine(logp, risk, live, valid_rows, extra_metrics=None):
    """Shared MWER reduction over an n-best list (all families).

    Args:
      logp: (B, K) DIFFERENTIABLE sequence log-likelihoods (dead slots may
        be anything; `live` masks them).
      risk: (B, K) per-hypothesis risk (CER or WER), gradients not needed.
      live: (B, K) bool — real n-best entries.
      valid_rows: (B,) bool — real (non-ragged-padding) utterances.
    Returns (num, den, metrics) with loss = num/den = E_w[risk] in the
    FORWARD pass while the gradient equals d/dθ Σ_k w_k (risk_k - sg(r̄)):
    num = Σ w·risk − sg(r̄)·(Σ w − 1). Σ w == 1 exactly in the forward
    pass, so the logged pg loss IS the expected risk (review finding:
    the plain sg-baselined form is identically zero forward)."""
    logp = jnp.where(live, logp, -jnp.inf)
    # all-dead rows (excluded by `valid` below) would make softmax emit
    # nan AND poison the backward pass through the 0-cotangent (0 * nan);
    # substitute a finite row before the softmax (double-where discipline)
    row_ok = jnp.any(jnp.isfinite(logp), axis=1, keepdims=True)
    w = jax.nn.softmax(jnp.where(row_ok, logp, 0.0), axis=1)
    risk = jax.lax.stop_gradient(jnp.where(live, risk, 0.0))
    risk_bar = jax.lax.stop_gradient(jnp.sum(w * risk, axis=1))  # (B,)
    utt_loss = (jnp.sum(w * risk, axis=1)
                - risk_bar * (jnp.sum(w, axis=1) - 1.0))  # (B,)

    valid = valid_rows & row_ok[:, 0]
    num = jnp.sum(jnp.where(valid, utt_loss, 0.0))
    den = jnp.sum(valid.astype(jnp.float32))
    expected_risk = (jnp.sum(jnp.where(valid, risk_bar, 0.0))
                     / jnp.maximum(den, 1.0))
    metrics = {
        # "risk", not "cer": the granularity follows rl.reward (CER by
        # default, word-level WER with reward=neg_wer)
        "expected_risk": expected_risk,
        # the reward analogue the finetune_pg driver logs/curves
        "reward_mean": -expected_risk,
        "oracle_risk": jnp.sum(jnp.where(
            valid, jnp.min(jnp.where(live, risk, jnp.inf), axis=1), 0.0))
        / jnp.maximum(den, 1.0),
        "nbest_live": jnp.mean(jnp.sum(live.astype(jnp.float32), axis=1)),
    }
    if extra_metrics:
        metrics.update(extra_metrics)
    return num, den, metrics


def _mwer_terms(log_probs, mask, frame_lens, labels, label_lens, rl):
    """Minimum-expected-risk over the on-device K-best list for the CTC
    families (the standard production discriminative objective): decode K
    distinct hypotheses with the prefix beam, score each with its
    DIFFERENTIABLE sequence log-likelihood log P(h|x) (the CTC forward
    DP), renormalize over the list, and minimize the expected risk with a
    stop-gradiented baseline (_mwer_combine). Risk granularity follows
    rl.reward (CER default, word-level WER with reward=neg_wer)."""
    from ..decoding.beam import beam_decode_nbest
    from ..ops.ctc import ctc_loss
    from ..ops.edit_distance import cer_from_ids, wer_from_ids

    # risk granularity follows rl.reward: CER (default) or word-level WER
    if rl.reward == "neg_wer":
        if rl.space_id < 0:
            # same contract sequence_reward enforces: an unresolved space
            # id would make every sequence hash to ONE word and the "WER"
            # risk silently degenerate to a 0/1 exact-match indicator
            raise ValueError(
                "mwer with reward=neg_wer needs the alphabet's space id "
                "(rl.space_id) — finetune_pg resolves it from "
                "alphabet.txt; set it explicitly when building steps "
                "directly")

        def risk_fn(h, hl):
            return wer_from_ids(labels, label_lens, h, hl, rl.space_id)
    else:
        def risk_fn(h, hl):
            return cer_from_ids(labels, label_lens, h, hl)

    K = rl.mwer_beam
    hyp, hyp_lens, dec_nll = beam_decode_nbest(
        jax.lax.stop_gradient(log_probs), frame_lens, beam_size=K,
        max_label_len=labels.shape[1])
    live = dec_nll < 1e29  # (B, K); dead slots never populated

    # differentiable sequence log-lik of every hypothesis under the model
    nll = jax.vmap(
        lambda h, hl: ctc_loss(log_probs, frame_lens, h, hl),
        in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)  # (B, K)
    live = live & (nll < 0.5e30)
    risk = jax.vmap(risk_fn, in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)
    valid_rows = (label_lens > 0) & (jnp.sum(mask, 1) > 0)
    return _mwer_combine(-nll, risk, live, valid_rows)


def _risk_kind(rl) -> str:
    """Sequence-level risk/reward granularity (stepwise_ed is a per-frame
    CTC credit scheme; sequence-level consumers fall back to CER)."""
    return rl.reward if rl.reward in ("neg_cer", "neg_wer") else "neg_cer"


def _scst_seq2seq_terms(params, feats, fmask, labels, label_lens, rng,
                        cfg: Config):
    """SCST (self-critical sequence training) for the attention seq2seq
    family — policy-gradient fine-tuning of the reference's OWN model
    concept: its reward() consumes decoder posteriors (reference
    policy_grad.py:4-16) from Seq2Seq.forward (reference
    model.py:174-183,314-315); the sampler/loop it never had is here.

    Per step, fully on-chip: sample S continuations from the
    autoregressive decoder (jax.random.categorical inside the decode
    scan), score each with negative CER/WER, subtract the greedy
    self-critic baseline (Rennie et al. 2017), REINFORCE on the sampled
    token log-probs (+ entropy bonus, + teacher-forced NLL anchor via
    rl.ctc_mix_weight)."""
    from ..losses import seq2seq_nll_terms
    from ..models import seq2seq

    rl = cfg.rl
    B, L = labels.shape
    kind = _risk_kind(rl)
    S = rl.num_samples
    enc_out = seq2seq.encode(params["encoder"], feats, fmask, cfg.model)

    toks, tok_lp, ent = seq2seq.sample_from_encoder(
        params, enc_out, fmask, cfg.seq2seq, rng, S, max_steps=L,
        temperature=rl.temperature)  # (S, B, L) each
    toks = jax.lax.stop_gradient(toks)
    lens = seq2seq.generated_lengths(toks)  # (S, B)

    ref = jnp.tile(labels, (S, 1))
    ref_lens = jnp.tile(label_lens, (S,))
    R = sequence_reward(ref, ref_lens, toks.reshape(S * B, L),
                        lens.reshape(S * B), kind, rl.space_id)
    R = jax.lax.stop_gradient(R.reshape(S, B))

    if rl.baseline == "greedy":
        g_toks, _ = seq2seq.greedy_from_encoder(
            params, jax.lax.stop_gradient(enc_out), fmask, cfg.seq2seq, L)
        g_lens = seq2seq.generated_lengths(g_toks)
        base = jax.lax.stop_gradient(sequence_reward(
            labels, label_lens, g_toks, g_lens, kind, rl.space_id))[None, :]
    elif rl.baseline == "mean":
        base = jnp.mean(R, axis=0, keepdims=True)
    else:
        base = jnp.zeros((1, 1), jnp.float32)

    # step mask: every sampled token up to AND INCLUDING the EOS action
    pos = jnp.arange(L)[None, None, :]
    step_mask = (pos <= lens[:, :, None]) & (pos < L)
    valid = label_lens > 0  # ragged zero-padding rows
    step_mask = (step_mask & valid[None, :, None]).astype(jnp.float32)

    counts = jnp.sum(step_mask, axis=2)  # (S, B)
    seq_lp = jnp.sum(tok_lp * step_mask, axis=2) / jnp.maximum(counts, 1.0)
    adv = jax.lax.stop_gradient(R - base) * valid[None, :]
    pg_num = -jnp.sum(adv * seq_lp)
    pg_den = jnp.asarray(float(S)) * jnp.sum(valid.astype(jnp.float32))

    ent_num = jnp.sum(ent * step_mask)
    ent_den = jnp.sum(step_mask)

    # supervised anchor: teacher-forced NLL on the SAME encoder states
    lp_tf = seq2seq.decode_teacher_forced(params, enc_out, fmask, labels,
                                          cfg.seq2seq)
    a_num, a_den = seq2seq_nll_terms(lp_tf, labels, label_lens)

    obj_metrics = {
        "reward_mean": jnp.mean(R),
        "baseline_mean": jnp.mean(base),
        "advantage_mean": jnp.mean(R - base),
        "sample_len_mean": jnp.mean(lens.astype(jnp.float32)),
    }
    nums = {"pg": pg_num, "ent": ent_num, "ctc": a_num}
    dens = {"pg": pg_den, "ent": ent_den, "ctc": a_den}
    metrics = dict(obj_metrics, entropy=ent_num / jnp.maximum(ent_den, 1.0))
    return nums, dens, metrics


def _hyp_log_lik_seq2seq(lp, hyp, hyp_lens):
    """(B,L,A) teacher-forced log-probs of one hypothesis -> (B,) sequence
    log-lik including the EOS step (hyp is 0-padded; position hyp_lens
    holds EOS unless the beam hit max_steps)."""
    L = hyp.shape[1]
    tok_lp = jnp.take_along_axis(lp, hyp[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]  # (B, L)
    pos = jnp.arange(L)[None, :]
    keep = (pos <= hyp_lens[:, None]) & (pos < L)
    return jnp.sum(tok_lp * keep, axis=1)


def _mwer_seq2seq_terms(params, feats, fmask, labels, label_lens,
                        cfg: Config):
    """MWER for the attention seq2seq family: K-best from the on-device
    decoder beam (models/seq2seq.beam_scan_from_encoder), each hypothesis
    re-scored with its DIFFERENTIABLE teacher-forced log-likelihood over
    the shared encoder states, combined by _mwer_combine."""
    from ..losses import seq2seq_nll_terms
    from ..models import seq2seq

    rl = cfg.rl
    B, L = labels.shape
    K = rl.mwer_beam
    kind = _risk_kind(rl)
    enc_out = seq2seq.encode(params["encoder"], feats, fmask, cfg.model)

    hyp, hyp_lens, scores = seq2seq.beam_scan_from_encoder(
        params, jax.lax.stop_gradient(enc_out), fmask, cfg.seq2seq,
        beam_size=K, max_steps=L)  # (B,K,L), (B,K), (B,K)
    hyp = jax.lax.stop_gradient(hyp)
    live = scores > -1e29

    logp = jax.vmap(
        lambda h, hl: _hyp_log_lik_seq2seq(
            seq2seq.decode_teacher_forced(params, enc_out, fmask, h,
                                          cfg.seq2seq), h, hl),
        in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)  # (B, K)

    risk = jax.vmap(
        lambda h, hl: -sequence_reward(labels, label_lens, h, hl, kind,
                                       rl.space_id),
        in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)  # (B, K)

    pg_num, pg_den, obj_metrics = _mwer_combine(
        logp, risk, live, label_lens > 0)

    lp_tf = seq2seq.decode_teacher_forced(params, enc_out, fmask, labels,
                                          cfg.seq2seq)
    a_num, a_den = seq2seq_nll_terms(lp_tf, labels, label_lens)
    nums = {"pg": pg_num, "ent": jnp.asarray(0.0), "ctc": a_num}
    dens = {"pg": pg_den, "ent": jnp.asarray(1.0), "ctc": a_den}
    return nums, dens, dict(obj_metrics, entropy=jnp.asarray(0.0))


def _mwer_transducer_terms(params, feats, fmask, flens, labels, label_lens,
                           cfg: Config):
    """MWER for the RNN-T family: N-best from the on-device frame-
    synchronous beam (decoding/transducer.transducer_beam_nbest), each
    hypothesis re-scored with the DIFFERENTIABLE lattice loss
    (ops/transducer.transducer_loss — the full forward DP over all
    alignments of that hypothesis), combined by _mwer_combine."""
    from ..decoding.transducer import transducer_beam_nbest
    from ..models import transducer
    from ..ops.transducer import transducer_loss, transducer_loss_terms

    rl = cfg.rl
    B, L = labels.shape
    K = rl.mwer_beam
    kind = _risk_kind(rl)
    enc, out_mask, out_lens = transducer.encode(params, feats, fmask, flens,
                                                cfg)

    hyp, hyp_lens, scores = transducer_beam_nbest(
        params, jax.lax.stop_gradient(enc), out_lens, cfg, beam_size=K,
        max_label_len=L)  # (B,K,L), (B,K), (B,K)
    hyp = jax.lax.stop_gradient(hyp)
    live = scores > -1e29

    def hyp_nll(h, hl):
        pred = transducer.predict_states(params, h, hl, cfg)
        lp_blank, lp_label = transducer.joint_lattice_log_probs(
            params, enc, pred, h, cfg)
        return transducer_loss(lp_blank, lp_label, out_lens, hl)  # (B,)

    nll = jax.vmap(hyp_nll, in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)
    live = live & (nll < 0.5e30)

    risk = jax.vmap(
        lambda h, hl: -sequence_reward(labels, label_lens, h, hl, kind,
                                       rl.space_id),
        in_axes=(1, 1), out_axes=1)(hyp, hyp_lens)  # (B, K)

    valid_rows = (label_lens > 0) & (out_lens > 0)
    pg_num, pg_den, obj_metrics = _mwer_combine(-nll, risk, live, valid_rows)

    # supervised anchor: the RNN-T loss on the ground truth (same encoder)
    pred = transducer.predict_states(params, labels, label_lens, cfg)
    lp_blank, lp_label = transducer.joint_lattice_log_probs(
        params, enc, pred, labels, cfg)
    a_num, a_den = transducer_loss_terms(lp_blank, lp_label, out_lens,
                                         label_lens)
    nums = {"pg": pg_num, "ent": jnp.asarray(0.0), "ctc": a_num}
    dens = {"pg": pg_den, "ent": jnp.asarray(1.0), "ctc": a_den}
    return nums, dens, dict(obj_metrics, entropy=jnp.asarray(0.0))


def pg_loss_terms(params, wave, num_samples_arr, labels, label_lens, rng,
                  cfg: Config):
    """PG loss as (numerators, denominators, metrics). Each loss component
    is num/den so SPMD shards can psum the dens for exact global means
    (same discipline as train.compute_loss terms mode).

    Family dispatch: CTC families (ctc/transformer/conformer) support
    REINFORCE over sampled alignment paths and MWER over the prefix-beam
    n-best; seq2seq supports SCST (objective=reinforce) and MWER over the
    decoder beam; transducer supports MWER over the RNN-T beam."""
    rl = cfg.rl
    feats, fmask, flens = extract_features(wave, num_samples_arr, cfg.features)
    if cfg.model.family == "seq2seq":
        if rl.objective == "mwer":
            return _mwer_seq2seq_terms(params, feats, fmask, labels,
                                       label_lens, cfg)
        return _scst_seq2seq_terms(params, feats, fmask, labels, label_lens,
                                   rng, cfg)
    if cfg.model.family == "transducer":
        if rl.objective != "mwer":
            raise ValueError(
                "transducer PG fine-tuning uses the MWER objective "
                "(--pg_objective mwer): the on-device RNN-T n-best "
                "re-scored with the differentiable lattice loss. "
                "finetune_pg auto-selects it; set it explicitly when "
                "building steps directly.")
        return _mwer_transducer_terms(params, feats, fmask, flens, labels,
                                      label_lens, cfg)
    from ..models import acoustic_forward

    # mask/frame_lens below are in the MODEL's output time base (the
    # transformer family subsamples; BiLSTM passes them through)
    log_probs, mask, frame_lens = acoustic_forward(params, feats, fmask,
                                                   flens, cfg, train=False)
    B, T, A = log_probs.shape

    if rl.objective == "mwer":
        pg_num, pg_den, obj_metrics = _mwer_terms(
            log_probs, mask, frame_lens, labels, label_lens, rl)
        return _shared_terms(pg_num, pg_den, obj_metrics, log_probs, mask,
                             frame_lens, labels, label_lens)
    if rl.objective != "reinforce":
        raise ValueError(f"unknown rl.objective {rl.objective!r} "
                         "(supported: reinforce, mwer)")

    paths = _sample_paths(rng, jax.lax.stop_gradient(log_probs),
                          rl.num_samples, rl.temperature)  # (S, B, T)
    R, frame_r, _ = _path_rewards(paths, mask, labels, label_lens, rl.reward,
                                  rl.space_id)
    R = jax.lax.stop_gradient(R)

    # baseline (row-local: greedy self-critic or mean over the S samples)
    if rl.baseline == "greedy":
        greedy_ids, greedy_lens = greedy_decode(log_probs, mask)
        # self-critic MUST score with the same reward kind as the samples
        base_kind = rl.reward if rl.reward != "stepwise_ed" else "neg_cer"
        base = sequence_reward(labels, label_lens, greedy_ids, greedy_lens,
                               base_kind, rl.space_id)  # (B,)
        base = jax.lax.stop_gradient(base)[None, :]
    elif rl.baseline == "mean":
        base = jnp.mean(R, axis=0, keepdims=True)
    else:
        base = jnp.zeros((1, 1), log_probs.dtype)

    # log-prob of each sampled path, per frame
    lp_path = jnp.take_along_axis(
        log_probs[None], paths[..., None], axis=-1)[..., 0]  # (S, B, T)
    lp_path = lp_path * mask[None, :, :]

    if rl.reward == "stepwise_ed" and frame_r is not None:
        # per-step credit: advantage localized to emitting frames (the
        # remaining frames carry the sequence-level advantage via R - base)
        adv = jax.lax.stop_gradient(frame_r - (base / jnp.maximum(
            jnp.sum(mask, 1), 1.0)[None, :, None]))
        pg_num = -jnp.sum(adv * lp_path)
        pg_den = jnp.sum(mask) * rl.num_samples
    else:
        adv = (R - base)  # (S, B)
        seq_lp = jnp.sum(lp_path, axis=2) / jnp.maximum(jnp.sum(mask, 1)[None], 1.0)
        # rows with no frames (ragged zero-padding) have seq_lp = 0
        pg_num = -jnp.sum(adv * seq_lp)
        pg_den = jnp.asarray(float(rl.num_samples)) * jnp.sum(
            (jnp.sum(mask, 1) > 0).astype(jnp.float32))

    obj_metrics = {
        "reward_mean": jnp.mean(R),
        "baseline_mean": jnp.mean(base),
        "advantage_mean": jnp.mean(R - base),
    }
    return _shared_terms(pg_num, pg_den, obj_metrics, log_probs, mask,
                         frame_lens, labels, label_lens)


def _shared_terms(pg_num, pg_den, obj_metrics, log_probs, mask, frame_lens,
                  labels, label_lens):
    """Entropy bonus + supervised CTC anchor, shared by every objective."""
    # entropy over valid frames (keeps the policy from collapsing)
    ent_num = jnp.sum(-jnp.sum(jnp.exp(log_probs) * log_probs, -1) * mask)
    ent_den = jnp.sum(mask)

    from ..ops.ctc import ctc_loss_terms

    ctc_num, ctc_den = ctc_loss_terms(log_probs, frame_lens, labels, label_lens)

    nums = {"pg": pg_num, "ent": ent_num, "ctc": ctc_num}
    dens = {"pg": pg_den, "ent": ent_den, "ctc": ctc_den}
    metrics = dict(obj_metrics, entropy=ent_num / jnp.maximum(ent_den, 1.0))
    return nums, dens, metrics


def _combine_terms(nums, dens, rl):
    pg = nums["pg"] / jnp.maximum(dens["pg"], 1.0)
    ent = nums["ent"] / jnp.maximum(dens["ent"], 1.0)
    loss = pg - rl.entropy_weight * ent
    if rl.ctc_mix_weight > 0:
        # the anchor terms may be per-step vectors (seq2seq NLL terms) —
        # sum of per-step means, matching losses.seq2seq_nll_loss
        loss = loss + rl.ctc_mix_weight * jnp.sum(
            nums["ctc"] / jnp.maximum(dens["ctc"], 1.0))
    return loss


def pg_loss_fn(params, wave, num_samples_arr, labels, label_lens, rng,
               cfg: Config):
    """Scalar PG loss + aux metrics dict."""
    nums, dens, metrics = pg_loss_terms(params, wave, num_samples_arr,
                                        labels, label_lens, rng, cfg)
    return _combine_terms(nums, dens, cfg.rl), metrics


def make_pg_step(cfg: Config, optimizer, mesh=None) -> Callable:
    from ..train import _shard_cfg, _shard_map, _use_shard_map

    if _use_shard_map(cfg, mesh):
        from jax.sharding import PartitionSpec as P

        cfg_l = _shard_cfg(cfg)

        def step_local(params, opt_state, rng, wave, ns, labels, label_lens):
            rng, sample_rng = jax.random.split(rng)
            sample_rng = jax.random.fold_in(
                sample_rng, jax.lax.axis_index("data"))

            def loss_fn(p):
                nums, dens, metrics = pg_loss_terms(
                    p, wave, ns, labels, label_lens, sample_rng, cfg_l)
                dens_g = jax.lax.psum(dens, "data")
                return _combine_terms(nums, dens_g, cfg_l.rl), metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.lax.psum(grads, "data")
            loss = jax.lax.psum(loss, "data")
            metrics = jax.lax.pmean(metrics, "data")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss, metrics

        sharded = _shard_map(
            step_local, mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P(), P(), P()))
        return jax.jit(sharded, donate_argnums=(0, 1))

    @partial(jax.jit, donate_argnums=(0, 1))
    def pg_step(params, opt_state, rng, wave, ns, labels, label_lens):
        rng, sample_rng = jax.random.split(rng)
        (loss, metrics), grads = jax.value_and_grad(pg_loss_fn, has_aux=True)(
            params, wave, ns, labels, label_lens, sample_rng, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss, metrics

    return pg_step


def finetune_pg(corpus_path: str, model_path: str, num_steps: int = 200,
                batch_size: int | None = None, config: Config | None = None,
                eval_every: int = 50) -> dict:
    """Policy-gradient fine-tune from the supervised checkpoint in
    <model_path> (BASELINE config 3)."""
    from ..predict import load_model  # late import to avoid cycles

    cfg = config or Config()
    if batch_size:
        cfg = cfg.replace(train=cfg.train.__class__(
            **{**cfg.train.__dict__, "batch_size": batch_size}))

    from ..data.bpe import load_tokenizer

    alphabet = load_tokenizer(corpus_path, cfg.text.units)
    params, cfg = load_model(model_path, alphabet, cfg, which="best")

    # resolve the word delimiter for WER-granularity rewards (neg_wer)
    import dataclasses

    space_id = alphabet.char2ind.get(" ", -1)
    cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, space_id=space_id))
    if cfg.rl.reward == "neg_wer" and space_id < 0:
        raise ValueError(
            "--pg_reward neg_wer needs an alphabet with a space symbol "
            "(character units); this corpus/tokenizer has none")
    if cfg.model.family == "transducer" and cfg.rl.objective == "reinforce":
        print("[pg] transducer family: using the MWER objective "
              "(n-best re-scored with the differentiable lattice loss)")
        cfg = cfg.replace(rl=dataclasses.replace(cfg.rl, objective="mwer"))

    # multi-host: same per-host manifest sharding discipline as train() —
    # each process feeds only its rows; num_steps counts GLOBAL steps, so
    # collective step counts stay equal across hosts by construction
    proc, nproc = jax.process_index(), jax.process_count()
    per_host_bs = max(1, cfg.train.batch_size // nproc)
    aud = os.path.join(corpus_path, "clips")
    it = BatchIterator(load_manifest(os.path.join(corpus_path, "train.tsv"), aud),
                       alphabet, per_host_bs,
                       sample_rate=cfg.features.sample_rate, seed=cfg.train.seed,
                       shard_index=proc, shard_count=nproc)

    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(cfg.train.learning_rate * 0.1),  # gentler than supervised
    )
    opt_state = optimizer.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    # EMA-trained models: load_model handed us the AVERAGED weights; keep
    # maintaining the average through the PG steps so the checkpoints stay
    # loadable by predict/stream (which expect ema_params when
    # cfg.train.ema_decay > 0)
    use_ema = cfg.train.ema_decay > 0.0
    if use_ema:
        import jax.numpy as jnp

        from ..train import _ema_update

        ema_params = replicate(jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params), mesh)
    pg_step = make_pg_step(cfg, optimizer, mesh)
    ckpt = CheckpointManager(model_path,
                             cleanup_tmp=jax.process_index() == 0)
    logger = StepLogger(model_path)

    # Resume an interrupted PG run: PG checkpoints carry epoch=-1 (the PG
    # marker, vs the supervised driver's epoch counter), so a model_last
    # from a preempted/killed PG run picks the run back up at the saved
    # step with the saved optimizer state and best-dev-CER. A supervised
    # model_last (epoch >= 0, or a mid-epoch state with batches_done) is
    # left alone — the run starts fresh from model_best as before. Not
    # bit-exact vs an uninterrupted run (the per-epoch shuffled batch
    # stream restarts; train()'s supervised resume is the bit-exact one).
    from ..checkpoint import load_checkpoint

    start_step = 0
    if os.path.exists(ckpt.last_path):
        template = {"params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "step": 0, "epoch": 0, "best_val_loss": 0.0}
        if use_ema:
            template["ema_params"] = jax.device_get(ema_params)
        try:
            prev = load_checkpoint(ckpt.last_path, template)
        except Exception:
            prev = None  # structure mismatch: not a PG checkpoint
        if (prev is not None and int(prev.get("epoch", 0)) == -1
                and int(prev["step"]) < num_steps):
            params = replicate(prev["params"], mesh)
            opt_state = replicate(prev["opt_state"], mesh)
            if use_ema and "ema_params" in prev:
                ema_params = replicate(prev["ema_params"], mesh)
            start_step = int(prev["step"])
            ckpt.best_val = float(prev.get("best_val_loss", float("inf")))
            if proc == 0:
                print(f"[pg] resumed from model_last at step {start_step}")

    # preemption safety: SIGTERM saves model_last at the exact step and
    # returns (same contract as train()); rerunning finetune_pg resumes
    from ..utils.preempt import install_preemption_handler

    preempted, restore_sigterm = install_preemption_handler()
    from ..utils.rand import training_rng

    rng = training_rng(cfg.train.seed + 17)

    # periodic REAL dev CER (eval_every): greedy-decode the dev set so the
    # PG run tracks the metric it's optimizing for, not only its reward
    # proxy, and keeps the best-on-CER checkpoint. Same multi-host count
    # reduction discipline as train()'s select_on_cer path.
    dev_tsv = os.path.join(corpus_path, "dev.tsv")
    dev_rows = None
    if eval_every and os.path.exists(dev_tsv):
        dev_rows = load_manifest(dev_tsv, aud)
        if nproc > 1 and len(dev_rows) < nproc:
            dev_rows = None  # fewer dev rows than hosts: skip eval everywhere

    def _dev_cer(eval_params) -> float:
        from ..train import sharded_corpus_cer

        return sharded_corpus_cer(eval_params, dev_rows, alphabet, cfg,
                                  per_host_bs)

    def _save(step, val):
        if proc != 0:  # params replicated: only the main process writes
            return False
        state = {"params": params, "opt_state": opt_state, "step": step,
                 "epoch": -1, "best_val_loss": ckpt.best_val}
        if use_ema:
            state["ema_params"] = ema_params
        return ckpt.save(state, val_loss=val)

    # reward curve stays ON DEVICE during the run: a float() per step would
    # synchronize the host with every step and stall async dispatch; the
    # tiny scalars are fetched in bulk at eval/log boundaries and at the end
    reward_dev: list = []
    dev_cers: list[tuple[int, float]] = []
    step = start_step
    t0 = time.time()
    while step < num_steps:
        for batch in it:
            arrays = shard_batch_arrays(
                (batch.wave, batch.num_samples, batch.labels,
                 batch.label_lens), mesh)
            params, opt_state, rng, loss, metrics = pg_step(
                params, opt_state, rng, *arrays)
            if use_ema:
                ema_params = _ema_update(ema_params, params,
                                         cfg.train.ema_decay)
            step += 1
            reward_dev.append(metrics["reward_mean"])
            if step % 10 == 0 and proc == 0:
                logger.log(step=step, pg_loss=float(loss),
                           reward=float(metrics["reward_mean"]),
                           entropy=float(metrics["entropy"]))
            if dev_rows is not None and (step % eval_every == 0
                                         or step >= num_steps):
                cer = _dev_cer(ema_params if use_ema else params)
                dev_cers.append((step, cer))
                if _save(step, val=cer):
                    if proc == 0:
                        print(f"[pg] step {step}: new best dev CER "
                              f"{cer:.4f}")
                elif proc == 0:
                    print(f"[pg] step {step}: dev CER {cer:.4f} "
                          f"(best {ckpt.best_val:.4f})")
            stop_now = preempted.is_set()
            if nproc > 1:
                # one host's SIGTERM must become every host's decision
                # (same discipline as train(): a lone early return leaves
                # the peers blocked in the next collective)
                from jax.experimental import multihost_utils

                stop_now = bool(np.any(multihost_utils.process_allgather(
                    np.array([stop_now], dtype=bool))))
            if stop_now:
                _save(step, val=None)  # model_last at the exact step
                ckpt.flush()
                if proc == 0:
                    print(f"[pg] SIGTERM: saved model_last at step {step}; "
                          "rerun finetune_pg to resume")
                restore_sigterm()
                rewards = [float(r) for r in reward_dev]
                return {"rewards": rewards, "params": params, "config": cfg,
                        "dev_cers": dev_cers, "interrupted": True}
            if step >= num_steps:
                break

    rewards = [float(r) for r in reward_dev]
    if proc == 0:  # params replicated: only the main process writes artifacts
        np.save(os.path.join(model_path, "pg_rewards.npy"), np.array(rewards))
        if dev_cers:
            np.save(os.path.join(model_path, "pg_dev_cer.npy"),
                    np.array(dev_cers))
        if dev_rows is None:
            # no dev set: fall back to reward-proxy checkpoint selection
            _save(step, val=-float(np.mean(rewards[-10:])))
        print(f"[pg] {step} steps, final reward {np.mean(rewards[-10:]):.4f} "
              f"({time.time()-t0:.1f}s)")
    restore_sigterm()
    return {"rewards": rewards, "params": params, "config": cfg,
            "dev_cers": dev_cers}
