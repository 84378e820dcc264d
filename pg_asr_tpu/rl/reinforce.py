"""REINFORCE policy-gradient fine-tuning over sampled CTC alignment paths.

This is the training loop the reference only sketched — its reward() is
never imported anywhere (SURVEY.md §3.5). Full on-chip pipeline per step:

  1. forward: waveform -> features -> BiLSTM -> per-frame log-posteriors
  2. sample S alignment paths per utterance from the per-frame categorical
     (temperature-scaled), with jax.random — on chip
  3. CTC-collapse each path to a label sequence (vectorized, on chip)
  4. reward: negative CER via the on-chip edit-distance DP, or the
     reference-style per-step ED-delta reward (rl/reward.py)
  5. advantage: reward minus a greedy-decode (self-critical) or mean
     baseline
  6. REINFORCE gradient on the masked per-frame log-probs of the sampled
     path, plus entropy regularization and a supervised CTC anchor

Everything inside one jitted, donated train step; no host round-trips.
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


def _mwer_terms(log_probs, mask, frame_lens, labels, label_lens, rl):
    """Minimum-expected-CER over the on-device K-best list (the standard
    production discriminative objective, cf. MWER training for seq2seq/CTC
    ASR): decode K distinct hypotheses with the prefix beam, score each
    with its DIFFERENTIABLE sequence log-likelihood log P(h|x) (the CTC
    forward DP), renormalize over the list, and minimize
    sum_k w_k * (CER_k - sg(CER_bar)). The baseline MUST be
    stop-gradiented: since sum_k w_k == 1 exactly, a differentiable
    CER_bar = sum w*CER makes the loss identically zero (L = CER_bar -
    CER_bar) with identically-zero gradients — measured grad norm ~1e-6
    cancellation noise vs O(0.1) with the guard (caught in review)."""
    from ..decoding.beam import beam_decode_nbest
    from ..ops.ctc import ctc_loss
    from ..ops.edit_distance import cer_from_ids, wer_from_ids

    # risk granularity follows rl.reward: CER (default) or word-level WER
    if rl.reward == "neg_wer":
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
    logp = jnp.where(live & (nll < 0.5e30), -nll, -jnp.inf)
    # all-dead rows (excluded by `valid` below) would make softmax emit
    # nan AND poison the backward pass through the 0-cotangent (0 * nan);
    # substitute a finite row before the softmax (double-where discipline)
    row_ok = jnp.any(jnp.isfinite(logp), axis=1, keepdims=True)
    w = jax.nn.softmax(jnp.where(row_ok, logp, 0.0), axis=1)

    cer = jax.lax.stop_gradient(jax.vmap(
        risk_fn, in_axes=(1, 1), out_axes=1)(hyp, hyp_lens))  # (B, K)
    cer = jnp.where(live, cer, 0.0)
    cer_bar = jax.lax.stop_gradient(jnp.sum(w * cer, axis=1, keepdims=True))
    utt_loss = jnp.sum(w * (cer - cer_bar), axis=1)  # (B,)

    valid = (label_lens > 0) & (jnp.sum(mask, 1) > 0) & jnp.any(
        jnp.isfinite(logp), axis=1)
    num = jnp.sum(jnp.where(valid, utt_loss, 0.0))
    den = jnp.sum(valid.astype(jnp.float32))
    expected_cer = (jnp.sum(jnp.where(valid, cer_bar[:, 0], 0.0))
                    / jnp.maximum(den, 1.0))
    metrics = {
        "expected_cer": expected_cer,
        # the reward analogue the finetune_pg driver logs/curves
        "reward_mean": -expected_cer,
        "oracle_cer": jnp.sum(jnp.where(
            valid, jnp.min(jnp.where(live, cer, jnp.inf), axis=1), 0.0))
        / jnp.maximum(den, 1.0),
        "nbest_live": jnp.mean(jnp.sum(live.astype(jnp.float32), axis=1)),
    }
    return num, den, metrics


def pg_loss_terms(params, wave, num_samples_arr, labels, label_lens, rng,
                  cfg: Config):
    """PG loss as (numerators, denominators, metrics). Each loss component
    is num/den so SPMD shards can psum the dens for exact global means
    (same discipline as train.compute_loss terms mode)."""
    from ..models import acoustic_forward

    if cfg.model.family in ("seq2seq", "transducer"):
        raise ValueError(
            "finetune_pg samples CTC alignment paths; the "
            f"{cfg.model.family} family has no per-frame CTC posteriors. "
            "Train with --model ctc, transformer, or conformer.")
    rl = cfg.rl
    feats, fmask, flens = extract_features(wave, num_samples_arr, cfg.features)
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
        loss = loss + rl.ctc_mix_weight * nums["ctc"] / jnp.maximum(
            dens["ctc"], 1.0)
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
    ckpt = CheckpointManager(model_path)
    logger = StepLogger(model_path)
    from ..utils.rand import training_rng

    rng = training_rng(cfg.train.seed + 17)

    rewards = []
    step = 0
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
            rewards.append(float(metrics["reward_mean"]))
            if step % 10 == 0 and proc == 0:
                logger.log(step=step, pg_loss=float(loss),
                           reward=float(metrics["reward_mean"]),
                           entropy=float(metrics["entropy"]))
            if step >= num_steps:
                break

    if proc == 0:  # params replicated: only the main process writes artifacts
        np.save(os.path.join(model_path, "pg_rewards.npy"), np.array(rewards))
        state = {"params": params, "opt_state": opt_state, "step": step,
                 "epoch": -1, "best_val_loss": ckpt.best_val}
        if use_ema:
            state["ema_params"] = ema_params
        ckpt.save(state, val_loss=-float(np.mean(rewards[-10:])))
        print(f"[pg] {step} steps, final reward {np.mean(rewards[-10:]):.4f} "
              f"({time.time()-t0:.1f}s)")
    return {"rewards": rewards, "params": params, "config": cfg}
