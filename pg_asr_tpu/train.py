"""Supervised CTC training driver.

Covers the reference train() capability surface (reference model.py:186-274)
— epoch loop, per-epoch validation, best/last checkpointing, train_loss.npy /
val_losses.npy artifacts — re-designed TPU-first:
  * the ENTIRE step (featurization -> model -> CTC loss -> grads -> Adam
    update) is one jitted, donated function; raw audio is the only H2D
    transfer and the scalar loss the only D2H;
  * batches are length-bucketed to a few static shapes (no per-batch
    recompiles);
  * SPMD data parallelism comes from sharding the batch over the mesh
    ('data' axis); XLA inserts the psum for grads over ICI
    (parallel/mesh.py) — the TPU-native replacement for nn.DataParallel
    (reference model.py:201).
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

from .checkpoint import CheckpointManager
from .config import Config
from .data.dataset import Batch, BatchIterator, PrefetchIterator, load_manifest
from .data.text import Alphabet
from .models import bilstm_ctc
from .ops.ctc import ctc_loss_mean
from .ops.features import extract_features
from .parallel.mesh import make_mesh, shard_batch_arrays
from .utils.logging import StepLogger


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.lr_schedule == "warmup_cosine" and t.decay_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=t.learning_rate,
            warmup_steps=max(t.warmup_steps, 1),
            decay_steps=max(t.decay_steps, t.warmup_steps + 1),
            end_value=t.learning_rate * t.lr_end_factor)
    elif t.warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
    else:
        schedule = t.learning_rate
    opt = optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )
    if t.accum_steps > 1:
        # accumulate grads over N micro-batches; params update (and the lr
        # schedule step) advance once per N train_step calls
        opt = optax.MultiSteps(opt, every_k_schedule=t.accum_steps)
    return opt


def init_model_params(rng, cfg: Config):
    """Family dispatch: flagship CTC stack, transformer-CTC, or seq2seq."""
    if cfg.model.family == "seq2seq":
        from .models import seq2seq

        return seq2seq.init_params(rng, cfg.model, cfg.seq2seq)
    if cfg.model.family == "transformer":
        if cfg.transformer.num_experts > 0:
            from .parallel.moe import init_moe_params

            return init_moe_params(rng, cfg, cfg.transformer.num_experts)
        from .models import transformer_ctc

        return transformer_ctc.init_params(rng, cfg.model, cfg.transformer)
    if cfg.model.family == "conformer":
        from .models import conformer_ctc

        return conformer_ctc.init_params(rng, cfg.model, cfg.conformer)
    if cfg.model.family == "transducer":
        from .models import transducer

        return transducer.init_params(rng, cfg)
    return bilstm_ctc.init_params(rng, cfg.model)


def compute_loss(params, wave, num_samples, labels, label_lens, cfg: Config,
                 train: bool, dropout_rng=None, terms: bool = False):
    """Scalar loss (terms=False) or (numerator, denominator) arrays
    (terms=True — same-shaped, for SPMD psum reduction of ragged batches)."""
    aug = cfg.augment
    wave_aug = aug.enabled and (aug.speed_min != 1.0 or aug.speed_max != 1.0
                                or aug.noise_std > 0.0 or aug.gain_db > 0.0)
    if train and wave_aug and dropout_rng is not None:
        from .ops.augment import wave_augment

        dropout_rng, wa_rng = jax.random.split(dropout_rng)
        wave, num_samples = wave_augment(wave, num_samples, wa_rng, aug)
    feats, mask, frame_lens = extract_features(wave, num_samples, cfg.features)
    if train and aug.enabled and dropout_rng is not None:
        from .ops.augment import spec_augment

        dropout_rng, sa_rng = jax.random.split(dropout_rng)
        feats = spec_augment(feats, mask, sa_rng, aug)
    if cfg.model.family == "seq2seq":
        from .losses import seq2seq_nll_loss, seq2seq_nll_terms
        from .models import seq2seq

        log_probs = seq2seq.apply_teacher_forced(params, feats, mask, labels,
                                                 cfg.model, cfg.seq2seq,
                                                 train=train,
                                                 dropout_rng=dropout_rng)
        if terms:
            return seq2seq_nll_terms(log_probs, labels, label_lens)
        return seq2seq_nll_loss(log_probs, labels, label_lens)
    if cfg.model.family == "transducer":
        from .models import transducer
        from .ops.transducer import (transducer_loss_mean,
                                     transducer_loss_terms)

        lam = cfg.transducer.ctc_weight
        if lam > 0.0:  # hybrid: L = L_rnnt + lam * L_ctc (aux encoder head)
            from .ops.ctc import ctc_loss_terms

            lp_blank, lp_label, out_lens, ctc_lp = transducer.apply_lattice(
                params, feats, mask, frame_lens, labels, label_lens, cfg,
                train=train, dropout_rng=dropout_rng, with_ctc=True)
            num_r, den_r = transducer_loss_terms(lp_blank, lp_label,
                                                 out_lens, label_lens)
            num_c, den_c = ctc_loss_terms(ctc_lp, out_lens, labels,
                                          label_lens)
            # stacked components: the SPMD step psums num and den element-
            # wise and sums num/den, giving mean_rnnt + lam * mean_ctc
            # exactly (same discipline as the PG loss components)
            num = jnp.stack([num_r, lam * num_c])
            den = jnp.stack([den_r, den_c])
            if terms:
                return num, den
            return jnp.sum(num / jnp.maximum(den, 1.0))
        lp_blank, lp_label, out_lens = transducer.apply_lattice(
            params, feats, mask, frame_lens, labels, label_lens, cfg,
            train=train, dropout_rng=dropout_rng)
        if terms:
            return transducer_loss_terms(lp_blank, lp_label, out_lens,
                                         label_lens)
        return transducer_loss_mean(lp_blank, lp_label, out_lens, label_lens)
    if (cfg.model.family == "transformer"
            and cfg.transformer.num_experts > 0):
        # switch-MoE FFN encoder: CTC + load-balance aux as stacked num/den
        # components (same discipline as the transducer hybrid above)
        from .parallel.moe import moe_loss_terms

        num, den = moe_loss_terms(params, feats, mask, frame_lens, labels,
                                  label_lens, cfg, train=train,
                                  dropout_rng=dropout_rng)
        if terms:
            return num, den
        return jnp.sum(num / jnp.maximum(den, 1.0))
    from .models import acoustic_forward
    from .ops.ctc import ctc_loss_terms

    log_probs, _, out_lens = acoustic_forward(params, feats, mask, frame_lens,
                                              cfg, train=train,
                                              dropout_rng=dropout_rng)
    if terms:
        return ctc_loss_terms(log_probs, out_lens, labels, label_lens)
    return ctc_loss_mean(log_probs, out_lens, labels, label_lens)


def _use_shard_map(cfg: Config, mesh) -> bool:
    """Data-parallel meshes (>1 device, no other live axis) run the step
    under shard_map: each shard computes loss/grads on its local batch with
    explicit psum over ICI — and, critically, Pallas kernels work per-shard
    (pallas_call cannot be auto-partitioned by the XLA SPMD pass, which is
    why the pjit path falls back to lax.scan on multi-device). Meshes with
    a live 'model'/'expert' axis keep the pjit path (tensor-/expert-
    sharded params, XLA GSPMD partitioning); 'pipe'/'seq' meshes are
    routed by parallel/driver.py before this is consulted. MoE training
    (num_experts > 0) always takes the pjit path so the router's capacity
    cumsum sees the GLOBAL token order — per-shard cumsums would change
    overflow behavior vs the single-device reference."""
    if mesh is None or mesh.size <= 1:
        return False
    if any(mesh.shape.get(a, 1) > 1
           for a in ("model", "pipe", "seq", "expert", "fsdp")):
        return False
    if cfg.model.family == "transformer" and cfg.transformer.num_experts > 0:
        return False
    return True


def _shard_cfg(cfg: Config) -> Config:
    """Inside shard_map each shard sees single-core shapes, so 'auto'
    Pallas resolution must not look at the global device count: force the
    flag by backend."""
    use = jax.default_backend() == "tpu"
    return cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "use_pallas_lstm": use}))


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: jax>=0.8 moved it out of experimental
    and renamed check_rep -> check_vma (both off: the LSTM scan carries are
    unvarying zeros that become shard-varying, a benign mismatch)."""
    try:
        from jax import shard_map as sm  # jax >= 0.8

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_train_step(cfg: Config, optimizer, mesh=None) -> Callable:
    if _use_shard_map(cfg, mesh):
        from jax.sharding import PartitionSpec as P

        cfg_l = _shard_cfg(cfg)

        def step_local(params, opt_state, rng, wave, num_samples, labels,
                       label_lens):
            rng, dropout_rng = jax.random.split(rng)
            # decorrelate dropout across shards; the carried rng stays
            # replicated so the step remains deterministic per global step
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index("data"))

            def loss_fn(p):
                # local contribution to the GLOBAL mean: numerator over the
                # psum'd denominator, so ragged zero-padded shards reduce to
                # exactly the unpadded loss (num/den from compute_loss)
                num, den = compute_loss(p, wave, num_samples, labels,
                                        label_lens, cfg_l, train=True,
                                        dropout_rng=dropout_rng, terms=True)
                den_g = jax.lax.psum(den, "data")
                return jnp.sum(num / jnp.maximum(den_g, 1.0))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.psum(grads, "data")  # ICI all-reduce
            loss = jax.lax.psum(loss, "data")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, rng, loss

        sharded = _shard_map(
            step_local, mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P(), P()))
        return jax.jit(sharded, donate_argnums=(0, 1))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, rng, wave, num_samples, labels, label_lens):
        rng, dropout_rng = jax.random.split(rng)

        def loss_fn(p):
            return compute_loss(p, wave, num_samples, labels, label_lens,
                                cfg, train=True, dropout_rng=dropout_rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return train_step


def make_eval_step(cfg: Config, mesh=None) -> Callable:
    if _use_shard_map(cfg, mesh):
        from jax.sharding import PartitionSpec as P

        cfg_l = _shard_cfg(cfg)

        def eval_local(params, wave, num_samples, labels, label_lens):
            num, den = compute_loss(params, wave, num_samples, labels,
                                    label_lens, cfg_l, train=False, terms=True)
            den_g = jax.lax.psum(den, "data")
            return jax.lax.psum(jnp.sum(num / jnp.maximum(den_g, 1.0)), "data")

        return jax.jit(_shard_map(
            eval_local, mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=P()))

    @jax.jit
    def eval_step(params, wave, num_samples, labels, label_lens):
        return compute_loss(params, wave, num_samples, labels, label_lens,
                            cfg, train=False)

    return eval_step


def _batch_arrays(batch: Batch):
    return (batch.wave, batch.num_samples, batch.labels, batch.label_lens)


class _InlineStage:
    """prefetch_depth=0 fallback: same (Batch, arrays) item contract as the
    transform-equipped PrefetchIterator, staging synchronously."""

    def __init__(self, source, stage):
        self.source, self.stage = source, stage

    def __len__(self):
        return len(self.source)

    def __iter__(self):
        for b in self.source:
            yield self.stage(b)


@partial(jax.jit, static_argnames=("decay",), donate_argnums=(0,))
def _ema_update(ema_params, params, decay: float):
    """ema <- decay*ema + (1-decay)*params (elementwise, one fused pass)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        ema_params, params)


def _batch_cer_counts(params, batch, cfg: Config, alphabet):
    """Greedy-decode ONE batch and return (edit_distance_sum, ref_len_sum)
    — the additive corpus-CER counts (val_metric="cer"). Decoding the
    batch inside the normal dev iteration (and reducing counts across
    hosts) replaces the old second full dev pass."""
    from .decoding.greedy import greedy_decode, ids_to_strings
    from .metrics import edit_dist
    from .predict import (_cut_at_eos, _forward, _forward_seq2seq,
                          _forward_transducer)

    if cfg.model.family == "transducer":
        labels, lens = _forward_transducer(params, batch.wave,
                                           batch.num_samples, cfg)
    elif cfg.model.family == "seq2seq":
        tokens, _ = _forward_seq2seq(params, batch.wave,
                                     batch.num_samples, cfg)
        labels, lens = _cut_at_eos(np.asarray(tokens))
    else:
        log_probs, mask, _ = _forward(params, batch.wave,
                                      batch.num_samples, cfg)
        labels, lens = greedy_decode(log_probs, mask)
    hyps = ids_to_strings(labels, lens, alphabet)
    d_sum, l_sum = 0, 0
    for ref, hyp in zip(batch.texts, hyps):
        d, L = edit_dist(ref, hyp)
        d_sum += d
        l_sum += L
    return d_sum, l_sum


def _allreduce_cer_counts(d_sum: int, l_sum: int) -> tuple[int, int]:
    """Sum additive (edit-distance, ref-length) counts across hosts so the
    corpus CER covers every process's shard. No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.array([d_sum, l_sum], np.int64))
        d_sum = int(np.sum(counts[..., 0]))
        l_sum = int(np.sum(counts[..., 1]))
    return d_sum, l_sum


def sharded_corpus_cer(params, rows, alphabet, cfg: Config,
                       per_host_bs: int) -> float:
    """Greedy corpus CER over a manifest sharded across hosts: each host
    decodes its own shard, every host runs the SAME number of batches
    (equal collective counts — decode steps contain jitted device calls),
    and the additive counts allreduce at the end. Shared by train()'s
    select-on-CER path's discipline and finetune_pg's eval_every."""
    from .data.dataset import BatchIterator

    proc, nproc = jax.process_index(), jax.process_count()
    it = BatchIterator(rows, alphabet, per_host_bs, shuffle=False,
                       sample_rate=cfg.features.sample_rate,
                       shard_index=proc, shard_count=nproc)
    cap = (None if nproc == 1
           else -(-(len(rows) // nproc) // per_host_bs))
    d_sum, l_sum, n = 0, 0, 0
    for batch in it:
        d, L = _batch_cer_counts(params, batch, cfg, alphabet)
        d_sum += d
        l_sum += L
        n += 1
        if cap is not None and n >= cap:
            break
    d_sum, l_sum = _allreduce_cer_counts(d_sum, l_sum)
    return d_sum / max(l_sum, 1)


def train(corpus_path: str, model_path: str, num_epochs: int | None = None,
          batch_size: int | None = None, device=None, config: Config | None = None,
          resume: bool = True, max_steps_per_epoch: int | None = None,
          profile_steps: int = 0, stop_after_steps: int | None = None,
          fault_step: int | None = None) -> dict:
    """Train a BiLSTM-CTC model on a corpus directory (train.tsv / dev.tsv /
    clips/ / alphabet.txt — the layout the reference consumes).

    Returns a summary dict with loss curves and checkpoint paths.
    """
    cfg = config or Config()
    if num_epochs is not None:
        cfg = cfg.replace(train=cfg.train.__class__(**{**cfg.train.__dict__, "num_epochs": num_epochs}))
    if batch_size is not None:
        cfg = cfg.replace(train=cfg.train.__class__(**{**cfg.train.__dict__, "batch_size": batch_size}))

    from .data.bpe import load_tokenizer

    # resuming must keep the tokenizer the checkpoint was trained with —
    # a forgotten --units flag would otherwise rebuild a wrong-vocab model
    # and fail restore with an opaque shape mismatch
    prev_cfg_path = os.path.join(model_path, "config.json")
    if resume and os.path.exists(prev_cfg_path):
        from . import checkpoint as _ckpt_mod

        prev_cfg = Config.from_json(open(prev_cfg_path).read())
        has_ckpt = any(os.path.exists(os.path.join(model_path, n))
                       for n in (_ckpt_mod.BEST_NAME, _ckpt_mod.LAST_NAME))
        if has_ckpt:
            # the architecture comes from the checkpoint: a resume command
            # that omits --model (or passes a different family) must not
            # rebuild a wrong restore template — and must not overwrite
            # config.json with the wrong family, which would leave the
            # model dir unreadable for predict/stream/finetune_pg
            if prev_cfg.model.family != cfg.model.family:
                print(f"[train] resuming with model family "
                      f"{prev_cfg.model.family!r} from the checkpoint's "
                      f"config.json (requested {cfg.model.family!r} ignored)")
            cfg = cfg.replace(model=prev_cfg.model,
                              transformer=prev_cfg.transformer,
                              conformer=prev_cfg.conformer,
                              transducer=prev_cfg.transducer,
                              seq2seq=prev_cfg.seq2seq,
                              features=prev_cfg.features)
        if prev_cfg.text.units != cfg.text.units:
            print(f"[train] resuming with text.units="
                  f"{prev_cfg.text.units!r} from the checkpoint's "
                  "config.json")
            cfg = cfg.replace(text=cfg.text.__class__(
                **{**cfg.text.__dict__, "units": prev_cfg.text.units}))
        if cfg.train.ema_decay == 0.0 and prev_cfg.train.ema_decay > 0.0:
            # a resume command without --ema_decay must not silently drop
            # the EMA state the best checkpoint was selected on
            print(f"[train] resuming with ema_decay="
                  f"{prev_cfg.train.ema_decay} from the checkpoint's "
                  "config.json")
            cfg = cfg.replace(train=cfg.train.__class__(
                **{**cfg.train.__dict__,
                   "ema_decay": prev_cfg.train.ema_decay}))
    alphabet = load_tokenizer(corpus_path, cfg.text.units)
    if cfg.model.vocab_size != alphabet.size or cfg.model.input_dim != cfg.features.feature_dim:
        cfg = cfg.replace(model=cfg.model.__class__(**{
            **cfg.model.__dict__,
            "vocab_size": alphabet.size,
            "input_dim": cfg.features.feature_dim,
        }))
    if cfg.seq2seq.vocab_size != alphabet.size:
        cfg = cfg.replace(seq2seq=cfg.seq2seq.__class__(**{
            **cfg.seq2seq.__dict__, "vocab_size": alphabet.size}))

    aud_path = os.path.join(corpus_path, "clips")
    # multi-host: this process loads only its slice of the corpus and feeds
    # only its local batch rows (mesh.shard_batch_arrays assembles globals).
    # Every host MUST execute the same number of (collective) steps per
    # epoch: the caps below are computed from the GLOBAL manifest sizes —
    # every host derives the same numbers without communication, hosts with
    # extra local batches drop them, and a dev set too small for all hosts
    # (cap 0) skips validation everywhere.
    proc, nproc = jax.process_index(), jax.process_count()
    per_host_bs = max(1, cfg.train.batch_size // nproc)

    def _host_cap(n_global: int) -> int | None:
        if nproc == 1:
            return None
        return -(-(n_global // nproc) // per_host_bs)  # ceil(min_local / bs)

    train_manifest = load_manifest(os.path.join(corpus_path, "train.tsv"), aud_path)
    train_cap = _host_cap(len(train_manifest))
    train_it_base = train_it = BatchIterator(
        train_manifest, alphabet, per_host_bs,
        sample_rate=cfg.features.sample_rate,
        seed=cfg.train.seed, shard_index=proc, shard_count=nproc,
        cache_mb=cfg.train.cache_audio_mb,
        num_workers=cfg.train.loader_threads)
    # (the PrefetchIterator wrap happens below, once the mesh/plan exist:
    # its producer thread stages each batch onto the device so H2D
    # transfers overlap step dispatch instead of blocking the loop)
    dev_tsv = os.path.join(corpus_path, "dev.tsv")
    dev_it = None
    dev_cap = None
    if os.path.exists(dev_tsv):
        dev_manifest = load_manifest(dev_tsv, aud_path)
        dev_cap = _host_cap(len(dev_manifest))
        if dev_cap == 0:
            dev_it = None  # fewer dev rows than hosts: skip val on ALL hosts
            if proc == 0:
                print("[train] dev set smaller than host count - skipping "
                      "validation (multi-host)")
        else:
            dev_it = BatchIterator(dev_manifest, alphabet,
                                   per_host_bs, shuffle=False,
                                   sample_rate=cfg.features.sample_rate,
                                   shard_index=proc, shard_count=nproc)
    is_main = proc == 0

    select_on_cer = cfg.train.val_metric == "cer" and dev_it is not None

    if (cfg.train.lr_schedule == "warmup_cosine"
            and cfg.train.decay_steps <= 0):
        # derive the cosine horizon from the training run length
        spe = -(-len(train_manifest) // (per_host_bs * nproc))
        cfg = cfg.replace(train=cfg.train.__class__(**{
            **cfg.train.__dict__,
            "decay_steps": max(cfg.train.num_epochs * spe,
                               cfg.train.warmup_steps + 1)}))

    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axes)
    # route the step through the strategy the live mesh axes select
    # (data/model/pipe/seq/expert — parallel/driver.py)
    from .parallel.driver import make_plan

    plan = make_plan(cfg, mesh)

    def _stage(batch: Batch):
        """Producer-thread device staging: (Batch, placed device arrays)."""
        return batch, shard_batch_arrays(_batch_arrays(batch), mesh,
                                         plan.batch_multiple)

    if cfg.train.prefetch_depth > 0:
        train_it = PrefetchIterator(train_it, depth=cfg.train.prefetch_depth,
                                    transform=_stage)
    else:
        train_it = _InlineStage(train_it, _stage)
    # init stays threefry (backend-independent params); the step loop uses
    # the backend's fastest generator for dropout masks (utils/rand.py)
    init_rng = jax.random.split(jax.random.PRNGKey(cfg.train.seed))[1]
    params = init_model_params(init_rng, cfg)
    from .utils.rand import training_rng

    rng = training_rng(cfg.train.seed)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    use_ema = cfg.train.ema_decay > 0.0
    # real copies: the train step DONATES params, so aliased EMA leaves
    # would be deleted with the first step's buffers
    ema_params = (jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                         params) if use_ema else None)

    ckpt = CheckpointManager(model_path,
                             cleanup_tmp=jax.process_index() == 0)
    start_epoch = 1
    state_tpl = {"params": params, "opt_state": opt_state, "step": 0,
                 "epoch": 0, "batches_done": 0,
                 "best_val_loss": float("inf")}
    if use_ema:
        state_tpl["ema_params"] = ema_params
    train_losses: list[float] = []
    val_losses: list[float] = []
    step = 0
    resume_skip_batches = 0
    if resume:
        # optional keys absent from older checkpoints restore with defaults
        tpl = dict(state_tpl)
        while True:
            try:
                restored = ckpt.try_restore(tpl)
                break
            except ValueError as e:
                drop = [k for k in ("ema_params", "batches_done")
                        if k in tpl and k in str(e)]
                if not drop:
                    raise
                for k in drop:
                    del tpl[k]
        if restored is not None:
            if use_ema and "ema_params" not in restored:
                # checkpoint predates EMA being enabled: start the average
                # fresh from the restored params
                restored["ema_params"] = jax.tree_util.tree_map(
                    lambda x: jnp.array(x, copy=True), restored["params"])
                print("[train] checkpoint has no EMA state - initializing "
                      "the average from the restored params")
            params, opt_state = restored["params"], restored["opt_state"]
            if use_ema:
                ema_params = restored["ema_params"]
            step = int(restored["step"])
            bd = int(restored.get("batches_done", 0))
            # effective batches per epoch under the current run settings
            epoch_len = len(train_it_base)
            if max_steps_per_epoch:
                epoch_len = min(epoch_len, max_steps_per_epoch)
            if train_cap is not None:
                epoch_len = min(epoch_len, train_cap)
            if 0 < bd < epoch_len:
                # mid-epoch checkpoint: re-enter the interrupted epoch at
                # the next batch, with the SAME shuffled order
                start_epoch = int(restored["epoch"])
                resume_skip_batches = bd
            else:
                # bd == epoch_len: the epoch's steps all ran and only the
                # validation/epoch-end bookkeeping was lost — replaying a
                # ZERO-batch epoch would append a 0.0 train loss and (with
                # no dev set) falsely promote model_best at 0.0
                start_epoch = int(restored["epoch"]) + 1
            # continue the loss-curve artifacts across the interruption
            # instead of overwriting them with only the new epochs
            for name, dst in (("train_loss.npy", train_losses),
                              ("val_losses.npy", val_losses)):
                p = os.path.join(model_path, name)
                if os.path.exists(p):
                    dst.extend(np.load(p).tolist())
            print(f"[train] resumed from epoch {restored['epoch']}"
                  + (f" batch {bd}" if bd > 0 else "")
                  + f" (best val {ckpt.best_val:.4f})")
            # replay the shuffle stream so the resumed epochs see the same
            # batch order an uninterrupted run would have
            train_it_base.skip_epochs(start_epoch - 1)
            if resume_skip_batches:
                train_it_base.skip_batches(resume_skip_batches)
    if cfg.train.init_from_torch and step == 0 and start_epoch == 1:
        # warm-start from a reference torch checkpoint (migration path);
        # a restored pg_asr_tpu checkpoint always wins over the import
        from .models.torch_import import init_from_torch_checkpoint

        params, report = init_from_torch_checkpoint(
            cfg.train.init_from_torch, params, cfg,
            allow_pickle=cfg.train.trust_torch_pickle)
        opt_state = optimizer.init(params)
        if use_ema:
            ema_params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params)
        print(f"[train] {report}")

    # written only after a successful restore attempt: a failed resume must
    # not leave config.json overwritten with a mismatched run's settings
    if is_main:
        ckpt.save_config(cfg.to_json())

    params = plan.place_params(params)
    opt_state = plan.place_opt_state(opt_state)
    if use_ema:
        ema_params = plan.place_params(ema_params)
    train_step = plan.make_train_step(optimizer)
    eval_step = plan.make_eval_step()
    logger = StepLogger(model_path)

    # preemption safety: SIGTERM requests a final mid-epoch model_last save
    # and a clean return (utils/preempt.py); resume=True continues at the
    # next batch of the same shuffled order. restore() runs on every normal
    # exit path; an exception leaves the handler installed only until the
    # process dies, which is where an exception in train() goes anyway.
    from .utils.preempt import install_preemption_handler

    preempted, restore_sigterm = install_preemption_handler()

    def _interrupted_summary():
        return {"train_losses": train_losses, "val_losses": val_losses,
                "steps": step, "best_path": ckpt.best_path,
                "last_path": ckpt.last_path, "config": cfg,
                "alphabet": alphabet,
                "params": plan.canonical_params(params)}

    tracing = False  # --profile_steps: device trace of steady-state steps
    run_steps = 0  # steps run by THIS process (vs `step`, which resumes)
    save_every = cfg.train.save_every_steps
    for epoch in range(start_epoch, cfg.train.num_epochs + 1):
        # the epoch loss accumulates ON DEVICE: float(loss) per step would
        # synchronize the host with every step and stall async dispatch
        # (the device idles while the host waits); one bulk fetch at the
        # epoch boundary instead
        epoch_loss, n_batches = None, 0
        # absolute batch index within the epoch (a resumed mid-epoch pass
        # starts at its recorded offset; n_batches counts only the batches
        # THIS process ran, for the loss mean)
        batch_pos = resume_skip_batches
        resume_skip_batches = 0
        t0 = time.time()
        for batch, arrays in train_it:
            # stop BEFORE running the step: a resumed batch_pos may already
            # sit at the cap, and training one extra batch would diverge
            # from the uninterrupted run
            # batch_pos is the ABSOLUTE epoch position (a mid-epoch resume
            # starts it at the checkpoint's offset) — capping on it keeps
            # the resumed epoch's total batch count equal to an
            # uninterrupted run's, matching the train_cap check below
            if max_steps_per_epoch and batch_pos >= max_steps_per_epoch:
                break
            if train_cap is not None and batch_pos >= train_cap:
                break  # keep collective step counts equal across hosts
            if profile_steps > 0 and run_steps == 2 and not tracing:
                # skip compile (step 0) + first steady step, then trace
                # (run_steps counts THIS process's steps, so profiling
                # works on resumed runs where `step` continues)
                jax.profiler.start_trace(os.path.join(model_path, "trace"))
                tracing = True
            params, opt_state, rng, loss = train_step(params, opt_state, rng, *arrays)
            if use_ema:
                ema_params = _ema_update(ema_params, params,
                                         cfg.train.ema_decay)
            if tracing and run_steps >= 2 + profile_steps:
                jax.profiler.stop_trace()
                tracing = False
                print(f"[train] device trace written to {model_path}/trace")
            step += 1
            run_steps += 1
            n_batches += 1
            batch_pos += 1
            epoch_loss = loss if epoch_loss is None else epoch_loss + loss
            if is_main and step % cfg.train.log_every == 0:
                # host sync only at the log boundary
                logger.log(step=step, epoch=epoch, loss=float(loss),
                           utts_per_sec=batch.size * n_batches / (time.time() - t0))
            if save_every and is_main and batch_pos % save_every == 0:
                # preemption safety: model_last mid-epoch, with the batch
                # position so resume continues at the NEXT batch of the
                # same shuffled order
                mid = {"params": params, "opt_state": opt_state,
                       "step": step, "epoch": epoch,
                       "batches_done": batch_pos,
                       "best_val_loss": ckpt.best_val}
                if use_ema:
                    mid["ema_params"] = ema_params
                # background=True: the D2H transfer + write happen on the
                # checkpoint worker thread, off the training step
                ckpt.save(plan.canonical_state(mid), background=True)
            if fault_step is not None and step == fault_step:
                # fault injection (--fault_step, utils/elastic.py): die
                # ungracefully — no handler, no checkpoint flush, exactly
                # like an OOM kill — to exercise the elastic supervisor's
                # detect-and-relaunch path. One-shot via a marker file:
                # the last pre-crash checkpoint sits BEFORE fault_step, so
                # the relaunch replays through step==fault_step and a bare
                # step check would crash-loop forever.
                marker = os.path.join(model_path, ".fault_injected")
                if not os.path.exists(marker):
                    with open(marker, "w") as f:
                        f.write(str(step))
                    from .utils.elastic import FAULT_EXIT

                    os._exit(FAULT_EXIT)
            stop_now = preempted.is_set()
            if nproc > 1:
                # one host's SIGTERM must become EVERY host's decision: a
                # process that saves and returns alone leaves its peers
                # blocked in the next training-step collective forever.
                # One tiny allgather per step — noise next to the per-step
                # gradient reduction.
                from jax.experimental import multihost_utils

                stop_now = bool(np.any(multihost_utils.process_allgather(
                    np.array([stop_now], dtype=bool))))
            if stop_now:
                # SIGTERM mid-epoch: save model_last at the exact batch
                # position (even without --save_every_steps) and leave
                if is_main:
                    mid = {"params": params, "opt_state": opt_state,
                           "step": step, "epoch": epoch,
                           "batches_done": batch_pos,
                           "best_val_loss": ckpt.best_val}
                    if use_ema:
                        mid["ema_params"] = ema_params
                    ckpt.save(plan.canonical_state(mid))
                    ckpt.flush()
                    print(f"[train] SIGTERM: saved model_last at epoch "
                          f"{epoch} batch {batch_pos}; rerun with resume "
                          "to continue")
                restore_sigterm()
                return _interrupted_summary()
            if stop_after_steps and step >= stop_after_steps:
                # preemption-simulation hook (tests): vanish mid-epoch
                ckpt.flush()  # pending background saves land before exit
                restore_sigterm()
                return _interrupted_summary()
        if tracing:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            tracing = False
            print(f"[train] device trace written to {model_path}/trace")
        mean_train = (float(epoch_loss) / max(n_batches, 1)
                      if epoch_loss is not None else 0.0)
        train_losses.append(mean_train)
        if is_main:
            np.save(os.path.join(model_path, "train_loss.npy"),
                    np.array(train_losses))

        cur_val = None
        cur_cer = None
        eval_params = ema_params if use_ema else params
        if dev_it is not None and epoch % cfg.train.eval_every_epochs == 0:
            tot, n = 0.0, 0
            cer_d, cer_l = 0, 0
            dec_params = (plan.canonical_params(eval_params)
                          if select_on_cer else None)
            for batch in dev_it:
                arrays = shard_batch_arrays(_batch_arrays(batch), mesh,
                                            plan.batch_multiple)
                tot += float(eval_step(eval_params, *arrays))
                if select_on_cer:
                    # greedy decode folded into the SAME dev pass (each
                    # host decodes its local rows); counts reduce below
                    d, L = _batch_cer_counts(dec_params, batch, cfg,
                                             alphabet)
                    cer_d += d
                    cer_l += L
                n += 1
                if dev_cap is not None and n >= dev_cap:
                    break  # equal collective counts across hosts
            cur_val = tot / max(n, 1)
            val_losses.append(cur_val)
            if is_main:
                np.save(os.path.join(model_path, "val_losses.npy"),
                        np.array(val_losses))
            if select_on_cer:
                # corpus CER over ALL hosts' dev shards
                cer_d, cer_l = _allreduce_cer_counts(cer_d, cer_l)
                cur_cer = cer_d / max(cer_l, 1)

        dt = time.time() - t0
        if is_main:
            print(f"[train] epoch {epoch}/{cfg.train.num_epochs} "
                  f"train_loss={mean_train:.4f}"
                  + (f" val_loss={cur_val:.4f}" if cur_val is not None else "")
                  + (f" val_cer={cur_cer:.4f}" if cur_cer is not None else "")
                  + f" ({dt:.1f}s, {n_batches} steps)")

        # params are replicated, so only the main process writes checkpoints
        # (shared-FS collisions / duplicate IO on multi-host otherwise)
        if is_main:
            if cur_cer is not None:
                select = cur_cer  # val_metric="cer"
            else:
                select = cur_val if cur_val is not None else mean_train
            state = {"params": params, "opt_state": opt_state, "step": step,
                     "epoch": epoch, "batches_done": 0,
                     "best_val_loss": ckpt.best_val}
            if use_ema:
                state["ema_params"] = ema_params
            canon = plan.canonical_state(state)
            is_best = ckpt.save(canon, val_loss=select)
            if is_best:
                name = "cer" if cur_cer is not None else "val"
                print(f"[train] new best checkpoint ({name} {ckpt.best_val:.4f})")
            if cfg.train.keep_ckpts > 0:
                # rolling per-epoch snapshots for checkpoint averaging
                # (predict --ckpt avg)
                ckpt.save_rolling(canon, epoch, cfg.train.keep_ckpts)

    ckpt.flush()  # any trailing background saves land before we return
    restore_sigterm()
    return {
        "train_losses": train_losses,
        "val_losses": val_losses,
        "steps": step,
        "best_path": ckpt.best_path,
        "last_path": ckpt.last_path,
        "config": cfg,
        "alphabet": alphabet,
        "params": plan.canonical_params(params),
    }
