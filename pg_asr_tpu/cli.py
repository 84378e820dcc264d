"""Command-line interface.

Flag parity with the reference CLI (reference main.py:19-26): --mode
{train,predict,preproc} plus --corpus_path/--model_path/--num_epochs/
--batch_size/--device, extended with the capabilities the reference left
unexposed or unfinished: --mode finetune_pg (the policy-gradient loop),
decoder selection, beam width, feature kind, language.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native policy-gradient ASR")
    p.add_argument("--mode", required=True,
                   choices=["train", "predict", "preproc", "finetune_pg",
                            "stream", "export", "align", "pseudolabel"],
                   help="train | predict | preproc | finetune_pg | stream "
                        "(incremental transcription of one WAV) | export "
                        "(serialize wave->ids serving fn, weights baked in) "
                        "| align (force-align reference transcripts: "
                        "per-word [start, end] seconds -> alignments.jsonl) "
                        "| pseudolabel (decode unlabeled WAVs, keep the "
                        "confident subset as a train TSV)")
    p.add_argument("--corpus_path", type=str,
                   help="corpus dir (train/dev/test.tsv, clips/, alphabet.txt)")
    p.add_argument("--model_path", type=str,
                   help="dir for checkpoints, logs, loss curves")
    p.add_argument("--num_epochs", nargs="?", type=int, default=10)
    p.add_argument("--batch_size", nargs="?", type=int, default=None,
                   help="default 32; `--mode predict --decoder beam` "
                        "defaults to 128 (larger eval batches keep the "
                        "on-device beam search MXU-bound, docs/PERF.md "
                        "beam section)")
    p.add_argument("--device", type=int, default=None,
                   help="accepted for reference-CLI parity; device selection "
                        "is mesh-driven on TPU")
    # predict-mode extras (the reference hardcoded or broke these)
    p.add_argument("--test_path", type=str, default=None,
                   help="test manifest TSV (default <corpus_path>/test.tsv)")
    p.add_argument("--aud_path", type=str, default=None,
                   help="audio dir (default <corpus_path>/clips)")
    p.add_argument("--alphabet", type=str, default=None,
                   help="alphabet.txt (default <corpus_path>/alphabet.txt)")
    p.add_argument("--decoder", type=str, default="greedy",
                   choices=["greedy", "beam"])
    p.add_argument("--beam_size", type=int, default=None)
    p.add_argument("--beam_prune", type=int, default=None,
                   help="predict with --decoder beam: cap the per-frame "
                        "candidate symbols to the top-M. Default 6 "
                        "(config decode.beam_prune) — measured LOSSLESS "
                        "at M>=4 on trained posteriors (identical CER/WER "
                        "to the exact search on converged AND "
                        "undertrained checkpoints; docs/PERF.md "
                        "beam-prune table) and ~1.25x faster. Pass 0 for "
                        "the exact search (all beam+2 candidates)")
    p.add_argument("--lm_order", type=int, default=0, choices=[0, 2, 3],
                   help="predict: shallow-fuse a character n-gram LM of "
                        "this order (trained from the corpus train.tsv) "
                        "into the beam ranking; 0 = off")
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--lm_type", type=str, default="ngram",
                   choices=["ngram", "neural"],
                   help="predict: fusion LM flavor — add-k n-gram table "
                        "or a small LSTM LM with beam-carried states "
                        "(decoding/neural_lm.py; needs --lm_order != 0 to "
                        "enable fusion, cached at model_path/"
                        "lm_neural.ckpt)")
    p.add_argument("--lm_steps", type=int, default=300,
                   help="predict: neural-LM training steps (--lm_type "
                        "neural)")
    p.add_argument("--lm_pass", type=str, default="fused",
                   choices=("fused", "rescore"),
                   help="predict with --lm_type neural: fuse the LM "
                        "inside the beam search (biases the search) or "
                        "re-rank the K-best afterwards in one batched LM "
                        "sweep (decoding/rescore.py)")
    p.add_argument("--timestamps", action="store_true",
                   help="predict: also write timestamps.jsonl with per-word "
                        "[start, end] times (CTC emission peaks, seconds) "
                        "and per-word/utterance confidences (greedy "
                        "decoder, CTC families); stream: print one JSON "
                        "word-timing line per word after the transcript")
    p.add_argument("--min_conf", type=float, default=0.5,
                   help="pseudolabel: keep utterances whose utterance "
                        "confidence (geometric-mean emitted posterior) "
                        "clears this threshold")
    p.add_argument("--out_tsv", type=str, default=None,
                   help="pseudolabel: output manifest path (default "
                        "<model_path>/pseudo.tsv)")
    p.add_argument("--length_bonus", type=float, default=0.0)
    p.add_argument("--lang", type=str, default="en")
    p.add_argument("--librispeech_root", type=str, default=None,
                   help="preproc: build corpus manifests + alphabet from a "
                        "LibriSpeech tree (train-*/dev-*/test-* subdirs) "
                        "into --corpus_path")
    p.add_argument("--mesh", type=str, default=None,
                   help="train: device mesh spec, e.g. data=8 | "
                        "data=2,model=2 | data=2,pipe=2 | data=2,seq=2 | "
                        "data=2,expert=2 | fsdp=8 (ZeRO-sharded params/"
                        "optimizer) — 'data' composes with any one other "
                        "axis (data=2,fsdp=4 is HSDP); the step routes "
                        "through the matching strategy (parallel/driver.py)")
    p.add_argument("--microbatches", type=int, default=None,
                   help="train with a pipe axis: microbatches per batch "
                        "(default: the pipe axis size)")
    p.add_argument("--moe_experts", type=int, default=None,
                   help="transformer family: replace the dense FFNs with a "
                        "switch-MoE of N experts (shard with "
                        "--mesh ...,expert=K)")
    p.add_argument("--capacity_factor", type=float, default=None,
                   help="MoE: expert capacity = tokens/experts * factor")
    p.add_argument("--model", type=str, default=None,
                   choices=["ctc", "transformer", "conformer", "transducer",
                            "seq2seq", "moe"],
                   help="model family (default ctc; transformer/conformer = "
                        "the non-recurrent CTC encoders; transducer = RNN-T "
                        "with a streaming-capable encoder backbone; seq2seq "
                        "= the attention decoder family the reference left "
                        "unfinished)")
    p.add_argument("--transducer_encoder", type=str, default=None,
                   choices=["bilstm", "transformer", "conformer"],
                   help="transducer family: encoder backbone "
                        "(default conformer)")
    p.add_argument("--transducer_ctc_weight", type=float, default=None,
                   help="transducer family: hybrid training with an "
                        "auxiliary CTC head, L = L_rnnt + w * L_ctc "
                        "(0 = off)")
    p.add_argument("--features", type=str, default=None,
                   choices=["logmel", "mfcc"],
                   help="feature frontend (default from config)")
    p.add_argument("--units", type=str, default=None,
                   choices=["char", "bpe"],
                   help="label units: char (reference parity) or BPE "
                        "subwords (preproc trains them; train/predict use "
                        "<corpus>/bpe.vocab)")
    p.add_argument("--bpe_vocab_size", type=int, default=None,
                   help="preproc --units bpe: target subword vocabulary "
                        "size incl. pad (default 256)")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--lr_schedule", type=str, default=None,
                   choices=["warmup_constant", "warmup_cosine"],
                   help="train: lr schedule (cosine horizon derived from the "
                        "manifest unless Config.train.decay_steps is set)")
    p.add_argument("--accum_steps", type=int, default=None,
                   help="train: accumulate gradients over N micro-batches "
                        "per optimizer update")
    p.add_argument("--val_metric", type=str, default=None,
                   choices=["loss", "cer"],
                   help="train: select the best checkpoint on validation "
                        "loss (reference parity) or greedy-decode CER")
    p.add_argument("--save_every_steps", type=int, default=None,
                   help="train: also checkpoint model_last every N steps "
                        "WITHIN an epoch; resume replays the interrupted "
                        "epoch's batch order from the next batch "
                        "(preemption safety)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="train: exponential moving average of the params "
                        "(validation/predict use the averaged weights; "
                        "0 = off)")
    p.add_argument("--keep_ckpts", type=int, default=None,
                   help="train: retain the newest K per-epoch snapshots "
                        "(model_epochNNNN.ckpt) for checkpoint averaging "
                        "at predict time (--ckpt avg)")
    p.add_argument("--ckpt", type=str, default="best",
                   choices=("best", "last", "avg"),
                   help="predict: which checkpoint to serve — best/last, "
                        "or the uniform average of the retained per-epoch "
                        "snapshots (train with --keep_ckpts)")
    p.add_argument("--loader_threads", type=int, default=None,
                   help="decode workers building batches ahead of the "
                        "prefetch/staging thread (0 = inline; default 2)")
    p.add_argument("--cache_audio_mb", type=float, default=None,
                   help="train: RAM budget (MB) for caching built batches "
                        "across epochs — corpora that fit pay WAV "
                        "decode/padding only in epoch 1 (0 = off)")
    p.add_argument("--export_batch", type=int, default=8,
                   help="export: static batch size of the serving artifact")
    p.add_argument("--export_seconds", type=float, default=20.0,
                   help="export: max audio length (s) the artifact accepts")
    p.add_argument("--export_platforms", type=str, default=None,
                   help="export: comma list (e.g. cpu,tpu) for one "
                        "multi-platform artifact; default = current backend")
    p.add_argument("--export_quantize", type=str, default=None,
                   choices=["int8"],
                   help="export: weight-only per-channel int8 (~4x smaller "
                        "artifact, near-lossless; latency unchanged on "
                        "current XLA/TPU — see ops/quant.py)")
    p.add_argument("--init_from_torch", type=str, default=None,
                   help="train: warm-start from a reference torch "
                        "checkpoint (model_best.pth) when no pg_asr_tpu "
                        "checkpoint exists — migration path for reference "
                        "users (families: ctc/transducer/seq2seq; train "
                        "with --features mfcc to match the 120-dim input)")
    p.add_argument("--trust_torch_pickle", action="store_true",
                   help="init_from_torch: allow full unpickling when the "
                        "safe weights_only load fails (pickled nn.Module "
                        "checkpoints) — executes code embedded in the "
                        "file, use ONLY for trusted sources")
    p.add_argument("--pg_steps", type=int, default=200,
                   help="finetune_pg: number of fine-tune steps")
    p.add_argument("--pg_objective", type=str, default=None,
                   choices=["reinforce", "mwer"],
                   help="finetune_pg: REINFORCE over sampled alignment "
                        "paths (reference-style) or expected-CER over the "
                        "on-device K-best list (MWER)")
    p.add_argument("--mwer_beam", type=int, default=None,
                   help="finetune_pg: n-best width K for --pg_objective "
                        "mwer (default 4)")
    p.add_argument("--pg_reward", type=str, default=None,
                   choices=["neg_cer", "neg_wer", "stepwise_ed"],
                   help="finetune_pg: reward granularity — negative CER, "
                        "negative WER (on-chip word segmentation, the "
                        "north-star reward), or the reference's per-step "
                        "edit-distance deltas")
    p.add_argument("--pg_eval_every", type=int, default=50,
                   help="finetune_pg: greedy-decode the dev set every N "
                        "steps (real dev CER curve + best-on-CER "
                        "checkpoint); 0 disables")
    p.add_argument("--max_restarts", type=int, default=0,
                   help="train/finetune_pg: supervise the run and relaunch "
                        "it up to N times if it dies ungracefully (crash, "
                        "OOM kill); the relaunch resumes from model_last "
                        "(utils/elastic.py). 0 = no supervision")
    p.add_argument("--fault_step", type=int, default=None,
                   help="train: fault injection — os._exit at global step "
                        "N, like an OOM kill (tests the --max_restarts "
                        "recovery path end-to-end)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="train: capture a device trace of N steady-state "
                        "steps to <model_path>/trace (TensorBoard/xprof)")
    p.add_argument("--dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="compute dtype for activations (bfloat16 on TPU "
                        "halves HBM traffic; LN/softmax/losses stay f32)")
    p.add_argument("--remat", action="store_true",
                   help="train: rematerialize attention-family encoder "
                        "blocks in the backward pass (less activation "
                        "memory, ~1/3 extra FLOPs)")
    p.add_argument("--flash_attention", action="store_true",
                   help="transformer/conformer: MHSA via the Pallas TPU "
                        "flash kernel (tiled online softmax; no (B,H,T,T) "
                        "score tensor in HBM). Dense-path fallback off-TPU")
    p.add_argument("--speed_perturb", type=str, default=None,
                   metavar="MIN,MAX",
                   help="train: per-utterance speed perturbation factor "
                        "range, e.g. 0.9,1.1 (on-device resample; implies "
                        "augmentation enabled)")
    p.add_argument("--wave_noise", type=float, default=None,
                   help="train: additive white-noise std relative to each "
                        "utterance's RMS (implies augmentation enabled)")
    p.add_argument("--wave_gain_db", type=float, default=None,
                   help="train: random per-utterance gain in [-g, +g] dB "
                        "(implies augmentation enabled)")
    p.add_argument("--specaugment", action="store_true",
                   help="train: enable on-device SpecAugment time/frequency "
                        "masking (Config.augment for widths/counts)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.add_argument("--wav", type=str, default=None,
                   help="stream: input WAV file")
    p.add_argument("--chunk_frames", type=int, default=64,
                   help="stream: committed frames per step (emission "
                        "granularity)")
    p.add_argument("--right_context", type=int, default=32,
                   help="stream: lookahead frames (latency/accuracy dial)")
    p.add_argument("--left_context", type=int, default=512,
                   help="stream (transformer/conformer): exact left-context "
                        "frames per window (accuracy/compute dial)")
    p.add_argument("--block_ms", type=int, default=100,
                   help="stream: audio push block size in milliseconds")
    return p


def _config(args, from_model_path: bool = False):
    from .config import Config

    cfg = Config()
    if from_model_path and getattr(args, "model_path", None):
        # modes operating on an existing checkpoint (finetune_pg) must start
        # from the config the model was trained with — the default tree has
        # the wrong family/feature dims and the restore template would not
        # match the checkpoint
        cfg_path = os.path.join(args.model_path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = Config.from_json(f.read())
    if getattr(args, "model", None):
        family = args.model
        if family == "moe":
            # "moe" is the transformer family with switch-MoE FFN blocks
            family = "transformer"
            if getattr(args, "moe_experts", None) is None:
                args.moe_experts = 4
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "family": family}))
    if getattr(args, "dtype", None):
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "dtype": args.dtype}))
    if getattr(args, "remat", False):
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "remat": True}))
    if getattr(args, "flash_attention", False):
        cfg = cfg.replace(
            transformer=cfg.transformer.__class__(
                **{**cfg.transformer.__dict__, "flash_attention": True}),
            conformer=cfg.conformer.__class__(
                **{**cfg.conformer.__dict__, "flash_attention": True}))
    if getattr(args, "moe_experts", None) is not None:
        cfg = cfg.replace(transformer=cfg.transformer.__class__(
            **{**cfg.transformer.__dict__, "num_experts": args.moe_experts}))
    if getattr(args, "capacity_factor", None) is not None:
        cfg = cfg.replace(transformer=cfg.transformer.__class__(
            **{**cfg.transformer.__dict__,
               "capacity_factor": args.capacity_factor}))
    if getattr(args, "transducer_encoder", None):
        cfg = cfg.replace(transducer=cfg.transducer.__class__(
            **{**cfg.transducer.__dict__, "encoder": args.transducer_encoder}))
    if getattr(args, "transducer_ctc_weight", None) is not None:
        cfg = cfg.replace(transducer=cfg.transducer.__class__(
            **{**cfg.transducer.__dict__,
               "ctc_weight": args.transducer_ctc_weight}))
    if args.features:
        cfg = cfg.replace(features=cfg.features.__class__(
            **{**cfg.features.__dict__, "kind": args.features}))
    if getattr(args, "units", None):
        cfg = cfg.replace(text=cfg.text.__class__(
            **{**cfg.text.__dict__, "units": args.units}))
    if getattr(args, "bpe_vocab_size", None):
        cfg = cfg.replace(text=cfg.text.__class__(
            **{**cfg.text.__dict__, "bpe_vocab_size": args.bpe_vocab_size}))
    if getattr(args, "specaugment", False):
        cfg = cfg.replace(augment=cfg.augment.__class__(
            **{**cfg.augment.__dict__, "enabled": True}))
    aug_kw = {}
    if getattr(args, "speed_perturb", None):
        try:
            lo, hi = (float(x) for x in args.speed_perturb.split(","))
        except ValueError:
            raise SystemExit("--speed_perturb expects MIN,MAX (e.g. 0.9,1.1)")
        if not (0.5 <= lo <= hi <= 2.0):
            raise SystemExit("--speed_perturb factors must satisfy "
                             "0.5 <= MIN <= MAX <= 2.0")
        aug_kw.update(speed_min=lo, speed_max=hi)
    if getattr(args, "wave_noise", None) is not None:
        if args.wave_noise < 0:
            raise SystemExit("--wave_noise must be >= 0")
        aug_kw["noise_std"] = args.wave_noise
    if getattr(args, "wave_gain_db", None) is not None:
        if args.wave_gain_db < 0:
            raise SystemExit("--wave_gain_db must be >= 0")
        aug_kw["gain_db"] = args.wave_gain_db
    if aug_kw:
        # waveform augmentation implies the augment section is live; the
        # SpecAugment feature masks stay off unless --specaugment was given
        if not getattr(args, "specaugment", False):
            aug_kw.update(time_masks=0, freq_masks=0)
        cfg = cfg.replace(augment=cfg.augment.__class__(
            **{**cfg.augment.__dict__, "enabled": True, **aug_kw}))
    if getattr(args, "pg_objective", None):
        cfg = cfg.replace(rl=cfg.rl.__class__(
            **{**cfg.rl.__dict__, "objective": args.pg_objective}))
    if getattr(args, "mwer_beam", None) is not None:
        if args.mwer_beam < 2:
            raise SystemExit("--mwer_beam must be >= 2")
        cfg = cfg.replace(rl=cfg.rl.__class__(
            **{**cfg.rl.__dict__, "mwer_beam": args.mwer_beam}))
    if getattr(args, "pg_reward", None):
        cfg = cfg.replace(rl=cfg.rl.__class__(
            **{**cfg.rl.__dict__, "reward": args.pg_reward}))
    tr = dict(cfg.train.__dict__)
    tr["num_epochs"] = args.num_epochs
    if args.batch_size is not None:
        tr["batch_size"] = args.batch_size
    if args.learning_rate:
        tr["learning_rate"] = args.learning_rate
    if getattr(args, "lr_schedule", None):
        tr["lr_schedule"] = args.lr_schedule
    if getattr(args, "accum_steps", None):
        tr["accum_steps"] = args.accum_steps
    if getattr(args, "val_metric", None):
        tr["val_metric"] = args.val_metric
    if getattr(args, "ema_decay", None) is not None:
        tr["ema_decay"] = args.ema_decay
    if getattr(args, "save_every_steps", None) is not None:
        if args.save_every_steps < 0:
            raise SystemExit("--save_every_steps must be >= 0")
        tr["save_every_steps"] = args.save_every_steps
    if getattr(args, "keep_ckpts", None) is not None:
        if args.keep_ckpts < 0:
            raise SystemExit("--keep_ckpts must be >= 0")
        tr["keep_ckpts"] = args.keep_ckpts
    if getattr(args, "cache_audio_mb", None) is not None:
        if args.cache_audio_mb < 0:
            raise SystemExit("--cache_audio_mb must be >= 0")
        tr["cache_audio_mb"] = args.cache_audio_mb
    if getattr(args, "loader_threads", None) is not None:
        if args.loader_threads < 0:
            raise SystemExit("--loader_threads must be >= 0")
        tr["loader_threads"] = args.loader_threads
    if getattr(args, "init_from_torch", None):
        tr["init_from_torch"] = args.init_from_torch
    if getattr(args, "trust_torch_pickle", False):
        tr["trust_torch_pickle"] = True
    if getattr(args, "mesh", None):
        from .parallel.driver import parse_mesh_spec

        try:
            shape, axes = parse_mesh_spec(args.mesh)
        except ValueError as e:
            raise SystemExit(f"--mesh: {e}")
        tr["mesh_shape"] = shape
        tr["mesh_axes"] = axes
    if getattr(args, "microbatches", None) is not None:
        if args.microbatches < 1:
            raise SystemExit("--microbatches must be >= 1")
        tr["pipeline_microbatches"] = args.microbatches
    cfg = cfg.replace(train=cfg.train.__class__(**tr))
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .utils import elastic

    if (args.max_restarts > 0 and args.mode in ("train", "finetune_pg")
            and os.environ.get(elastic.CHILD_ENV) != "1"):
        # become the supervisor: re-exec this CLI as a supervised child
        # (marked via CHILD_ENV so it doesn't recurse); crashes relaunch
        # and resume from model_last, SIGTERM forwards for a graceful stop
        cmd = ([sys.executable, "-m", "pg_asr_tpu.cli"]
               + list(argv if argv is not None else sys.argv[1:]))
        return elastic.run_elastic(cmd, max_restarts=args.max_restarts)

    # Honour JAX_PLATFORMS=cpu BEFORE the backend initializes: this image
    # pins jax_platforms to "axon,cpu", which overrides the env var, and
    # backend init then touches the axon (TPU tunnel) plugin even for
    # CPU-selected runs — a dead tunnel hangs a pure-CPU job forever.
    env_plat = (os.environ.get("JAX_PLATFORMS")
                or os.environ.get("JAX_PLATFORM_NAME") or "").strip().lower()
    if env_plat == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    # Scoped-VMEM budget: the Pallas LSTM backward wants a 32 MiB stack
    # at long-T shapes (16 MiB default OOMs the 10k-utt stress compile),
    # but raising it globally costs the attention families ~20%/step in
    # changed XLA scheduling (benchmarks/vmem_ab.py). Request it only for
    # processes that run a recurrent (LSTM-scan) family. Must happen
    # before the TPU backend initializes.
    try:
        _probe = _config(args)
        _fam = _probe.model.family
        # ctc/seq2seq/bilstm-transducer/train_lm: REQUIRED (Pallas LSTM
        # backward OOMs the 16 MiB stack at long-T stress shapes).
        # transducer with any encoder: measured 2.7% faster at 32 MiB
        # (14.54 vs 14.94 ms/step, benchmarks/vmem_ab.py transducer) —
        # unlike transformer/conformer, which regress ~20% there.
        _needs_vmem = (_fam in ("ctc", "seq2seq", "transducer")
                       or args.mode == "train_lm")
    except Exception:
        _needs_vmem = True  # can't tell -> prefer the compile that works
    if _needs_vmem:
        from .utils.cache import request_scoped_vmem

        request_scoped_vmem()

    # persistent XLA compile cache: repeat runs (and irrelevant-flag
    # changes) skip the tunnel's minutes-long server-side compiles
    from .utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    if os.environ.get("PGASR_DISTRIBUTED") == "1":
        # multi-host (DCN) training: initialize the process group before
        # any backend use; no-op overhead for single-host runs
        from .parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=os.environ.get("PGASR_COORDINATOR"),
            num_processes=(int(os.environ["PGASR_NUM_PROCESSES"])
                           if "PGASR_NUM_PROCESSES" in os.environ else None),
            process_id=(int(os.environ["PGASR_PROCESS_ID"])
                        if "PGASR_PROCESS_ID" in os.environ else None))

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    if args.mode == "preproc":
        if args.librispeech_root:
            from .data.dataset import librispeech_to_corpus

            counts = librispeech_to_corpus(args.librispeech_root,
                                           args.corpus_path)
            print(f"[preproc] LibriSpeech -> {args.corpus_path}: {counts}")
        else:
            from .data.text import preproc_text

            preproc_text(args.corpus_path, args.lang)
            print(f"[preproc] normalized TSVs + alphabet.txt in "
                  f"{args.corpus_path}")
        if args.units == "bpe":
            from .data.bpe import train_bpe
            from .data.text import read_tsv

            _, rows = read_tsv(os.path.join(args.corpus_path, "train.tsv"))
            tok = train_bpe([r.get("sentence", "") for r in rows],
                            args.bpe_vocab_size or 256)
            tok.save(os.path.join(args.corpus_path, "bpe.vocab"))
            print(f"[preproc] BPE vocabulary ({tok.size} tokens, "
                  f"{len(tok.merges)} merges) -> "
                  f"{args.corpus_path}/bpe.vocab")
        return 0

    if args.mode == "train":
        from .train import train

        train(args.corpus_path, args.model_path, config=_config(args),
              profile_steps=args.profile_steps, fault_step=args.fault_step)
        return 0

    if args.mode == "predict":
        corpus = args.corpus_path or ""
        test_path = args.test_path or os.path.join(corpus, "test.tsv")
        aud_path = args.aud_path or os.path.join(corpus, "clips")
        alphabet = args.alphabet or os.path.join(corpus, "alphabet.txt")
        from .predict import predict

        # production default: beam eval batches at 128 (keeps the
        # on-device search MXU-bound; PERF.md beam table), greedy at 32
        bs = args.batch_size if args.batch_size is not None else (
            128 if args.decoder == "beam" else 32)
        predict(test_path, aud_path, alphabet, args.model_path,
                batch_size=bs, decoder=args.decoder,
                which_ckpt=args.ckpt,
                beam_size=args.beam_size, beam_prune=args.beam_prune,
                lm_order=args.lm_order,
                lm_weight=args.lm_weight, length_bonus=args.length_bonus,
                lm_train_tsv=(os.path.join(corpus, "train.tsv")
                              if (args.lm_order and corpus) else None),
                lm_type=args.lm_type, lm_steps=args.lm_steps,
                lm_pass=args.lm_pass, timestamps=args.timestamps)
        return 0

    if args.mode == "pseudolabel":
        corpus = args.corpus_path or ""
        wav_dir = args.aud_path or os.path.join(corpus, "clips")
        alphabet = args.alphabet or os.path.join(corpus, "alphabet.txt")
        from .selftrain import pseudo_label

        pseudo_label(wav_dir, alphabet, args.model_path,
                     out_tsv=args.out_tsv, batch_size=args.batch_size or 32,
                     min_conf=args.min_conf, which_ckpt=args.ckpt)
        return 0

    if args.mode == "align":
        corpus = args.corpus_path or ""
        test_path = args.test_path or os.path.join(corpus, "test.tsv")
        aud_path = args.aud_path or os.path.join(corpus, "clips")
        alphabet = args.alphabet or os.path.join(corpus, "alphabet.txt")
        from .alignment import align_corpus

        align_corpus(test_path, aud_path, alphabet, args.model_path,
                     batch_size=args.batch_size or 32, which_ckpt=args.ckpt)
        return 0

    if args.mode == "export":
        from .exporting import export_model

        platforms = tuple(s.strip() for s in
                          (args.export_platforms or "").split(",") if s.strip())
        export_model(args.model_path, corpus_path=args.corpus_path,
                     batch_size=args.export_batch,
                     max_seconds=args.export_seconds,
                     decoder=args.decoder,
                     beam_size=(args.beam_size or 0),
                     platforms=platforms,
                     quantize=args.export_quantize or "")
        return 0

    if args.mode == "stream":
        import numpy as np

        from .data.audio import load_audio
        from .data.bpe import load_tokenizer
        from .predict import load_model
        from .serving import StreamingTranscriber

        if not args.wav:
            raise SystemExit("--mode stream needs --wav <file>")
        if not args.corpus_path:
            raise SystemExit("--mode stream needs --corpus_path (for the "
                             "tokenizer artifacts)")
        corpus = args.corpus_path
        from .config import Config

        cfg_path = os.path.join(args.model_path, "config.json")
        cfg = (Config.from_json(open(cfg_path).read())
               if os.path.exists(cfg_path) else Config())
        alphabet = load_tokenizer(corpus, cfg.text.units)
        params, cfg = load_model(args.model_path, alphabet, cfg)
        lm_tab = None
        if args.lm_order:
            # n-gram shallow fusion in the streamed beam (same table the
            # offline --decoder beam fuses, trained on the train split)
            from .data.dataset import load_manifest
            from .decoding.lm import lm_from_manifest

            lm_manifest = load_manifest(os.path.join(corpus, "train.tsv"),
                                        os.path.join(corpus, "clips"))
            lm_tab = lm_from_manifest(lm_manifest, alphabet,
                                      order=args.lm_order)
        st = StreamingTranscriber(params, cfg, alphabet,
                                  chunk_frames=args.chunk_frames,
                                  right_context=args.right_context,
                                  left_context=args.left_context,
                                  timestamps=args.timestamps,
                                  decoder=args.decoder,
                                  beam_size=args.beam_size or 8,
                                  lm=lm_tab, lm_weight=args.lm_weight,
                                  length_bonus=args.length_bonus)
        wave, sr = load_audio(args.wav)
        if sr != cfg.features.sample_rate:
            from .data.dataset import _resample_linear

            n_out = int(round(len(wave) * cfg.features.sample_rate / sr))
            wave = _resample_linear(wave, n_out)
        block = max(1, args.block_ms * cfg.features.sample_rate // 1000)
        for i in range(0, len(wave), block):
            piece = st.push(np.asarray(wave[i:i + block], np.float32))
            if piece:
                print(piece, end="", flush=True)
        print(st.flush())
        if args.timestamps:
            import json as _json

            for w in st.words:
                print(_json.dumps(w, ensure_ascii=False))
        return 0

    if args.mode == "finetune_pg":
        from .rl.reinforce import finetune_pg

        finetune_pg(args.corpus_path, args.model_path,
                    num_steps=args.pg_steps, batch_size=args.batch_size or 32,
                    config=_config(args, from_model_path=True),
                    eval_every=args.pg_eval_every)
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
