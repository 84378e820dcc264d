"""Batch inference + scoring driver.

Covers the reference predict() capability surface (reference
model.py:277-339): load model_best, decode every test utterance (greedy or
CTC prefix beam), score CER/WER, dump predicted.txt. TPU-first differences:
featurization + forward + greedy decode run as one jitted batch; beam search
is the vectorized on-device kernel (decoding/beam.py) instead of a
per-utterance Python loop over full posteriors pulled to the host.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import numpy as np

from .checkpoint import CheckpointManager, load_checkpoint
from .config import Config
from .data.dataset import BatchIterator, load_manifest
from .data.text import Alphabet
from .decoding.greedy import greedy_decode, ids_to_strings
from .metrics import evaluate, evaluate_corpus, save_predictions
from .ops.features import extract_features


@partial(jax.jit, static_argnames=("cfg",))
def _forward(params, wave, num_samples, cfg: Config):
    from .models import acoustic_forward

    feats, mask, frame_lens = extract_features(wave, num_samples, cfg.features)
    return acoustic_forward(params, feats, mask, frame_lens, cfg, train=False)


@partial(jax.jit, static_argnames=("cfg",))
def _forward_seq2seq(params, wave, num_samples, cfg: Config):
    """Free-running greedy generation for the attention family. Returns
    (tokens (B, S), per-step log-probs (B, S, A)); pad(0) acts as EOS
    (losses.seq2seq_nll_loss trains the first pad slot)."""
    from .models import seq2seq

    feats, mask, _ = extract_features(wave, num_samples, cfg.features)
    return seq2seq.greedy_generate(params, feats, mask, cfg.model, cfg.seq2seq,
                                   max_steps=cfg.decode.max_label_len)


@partial(jax.jit, static_argnames=("cfg", "beam_size"))
def _forward_seq2seq_beam(params, wave, num_samples, cfg: Config,
                          beam_size: int = 8):
    """Featurize + encode + batched attention-decoder beam search
    (models/seq2seq.beam_generate), one jitted call. Returns
    (tokens (B, S) zero-padded after EOS, lens (B,))."""
    from .models import seq2seq

    feats, mask, _ = extract_features(wave, num_samples, cfg.features)
    tokens, lens, _ = seq2seq.beam_generate(
        params, feats, mask, cfg.model, cfg.seq2seq, beam_size=beam_size,
        max_steps=cfg.decode.max_label_len)
    return tokens, lens


@partial(jax.jit, static_argnames=("cfg", "beam_size"))
def _forward_transducer(params, wave, num_samples, cfg: Config,
                        beam_size: int = 0):
    """Featurize + encode + batched transducer decode (greedy, or the
    on-device RNN-T beam search when beam_size > 0), one jitted call.
    Returns (labels (B, L) int32, lens (B,))."""
    from .decoding.transducer import (transducer_beam_decode,
                                      transducer_greedy_decode)
    from .models import transducer

    feats, mask, frame_lens = extract_features(wave, num_samples, cfg.features)
    enc, _, out_lens = transducer.encode(params, feats, mask, frame_lens,
                                         cfg, train=False)
    if beam_size > 0:
        labels, lens, _ = transducer_beam_decode(
            params, enc, out_lens, cfg, beam_size=beam_size,
            max_label_len=cfg.decode.max_label_len)
        return labels, lens
    return transducer_greedy_decode(params, enc, out_lens, cfg,
                                    max_label_len=cfg.decode.max_label_len)


def _cut_at_eos(tokens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(B, S) generated ids -> 0-padded ids + lengths, cut at the first 0."""
    B, S = tokens.shape
    is_eos = tokens == 0
    lens = np.where(is_eos.any(axis=1), is_eos.argmax(axis=1), S).astype(np.int32)
    out = tokens.copy()
    for i in range(B):
        out[i, lens[i]:] = 0
    return out, lens


def load_model(model_path: str, alphabet: Alphabet, config: Config | None = None,
               which: str = "best"):
    """Load params from <model_path>/model_{best,last}.ckpt."""
    cfg_path = os.path.join(model_path, "config.json")
    if config is None and os.path.exists(cfg_path):
        config = Config.from_json(open(cfg_path).read())
    cfg = config or Config()
    if cfg.model.vocab_size != alphabet.size or cfg.model.input_dim != cfg.features.feature_dim:
        cfg = cfg.replace(model=cfg.model.__class__(**{
            **cfg.model.__dict__,
            "vocab_size": alphabet.size,
            "input_dim": cfg.features.feature_dim,
        }))
    if cfg.seq2seq.vocab_size != alphabet.size:
        cfg = cfg.replace(seq2seq=cfg.seq2seq.__class__(**{
            **cfg.seq2seq.__dict__, "vocab_size": alphabet.size}))
    from .train import init_model_params

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    mgr = CheckpointManager(model_path, cleanup_tmp=False)  # read-only
    if which == "avg":
        # uniform average of the retained per-epoch snapshots (train with
        # --keep_ckpts K) — the classic eval smoother
        from .checkpoint import average_checkpoints

        snaps = mgr.epoch_snapshots()
        if not snaps:
            raise FileNotFoundError(
                f"no model_epoch*.ckpt snapshots in {model_path} — train "
                "with --keep_ckpts K to enable checkpoint averaging")
        key = "ema_params" if cfg.train.ema_decay > 0.0 else "params"
        try:
            state = average_checkpoints(snaps, {key: params})
        except (ValueError, KeyError):
            state = average_checkpoints(snaps, {"params": params})
            key = "params"
        print(f"[predict] averaged {len(snaps)} epoch snapshots "
              f"({os.path.basename(snaps[0])}..{os.path.basename(snaps[-1])})")
        return state[key], cfg
    path = mgr.best_path if which == "best" else mgr.last_path
    if not os.path.exists(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    if cfg.train.ema_decay > 0.0:
        # EMA-trained models serve their averaged weights (the ones the
        # best-checkpoint selection was scored on). A checkpoint written
        # BEFORE EMA was enabled on a resumed run has no ema_params —
        # fall back to the raw params, matching train()'s tolerant restore.
        try:
            state = load_checkpoint(path, {"ema_params": params})
            return state["ema_params"], cfg
        except (ValueError, KeyError):
            print("[predict] checkpoint predates EMA being enabled - "
                  "serving the raw params")
    tpl = {"params": params}
    state = load_checkpoint(path, tpl)  # tolerant: loads matching subtree
    return state["params"], cfg


def predict(test_path: str, aud_path: str, alphabet_path: str, model_path: str,
            batch_size: int = 32, config: Config | None = None,
            decoder: str = "greedy", beam_size: int | None = None,
            beam_prune: int | None = None,
            which_ckpt: str = "best", limit: int | None = None,
            lm_order: int = 0, lm_weight: float = 0.3,
            length_bonus: float = 0.0, lm_train_tsv: str | None = None,
            lm_type: str = "ngram", lm_steps: int = 300,
            lm_pass: str = "fused", timestamps: bool = False) -> dict:
    """Decode a test manifest and report CER/WER (+ predicted.txt dump).

    With lm_order in (2, 3) and decoder="beam", a character n-gram LM is
    trained from lm_train_tsv's transcripts (decoding/lm.py) and shallow-
    fused into the beam ranking. lm_type="neural" (with any lm_order != 0
    to enable fusion) instead trains a small LSTM LM
    (decoding/neural_lm.py) — cached at <model_path>/lm_neural.ckpt — and
    fuses it with beam-carried LM states."""
    if timestamps and decoder != "greedy":
        raise ValueError("--timestamps uses CTC emission peaks — "
                         "greedy decoder only")
    # beam_prune: None -> config default (DecodeConfig.beam_prune, 6 —
    # measured lossless at >= 4 on trained posteriors, docs/PERF.md);
    # 0 -> exact search; explicit M >= 2 -> top-M cap. The default is
    # resolved after the config loads (below); only an EXPLICIT flag is
    # validated against the decoder/pass it cannot apply to.
    if beam_prune is not None:
        if decoder != "beam":
            raise ValueError("--beam_prune applies to --decoder beam")
        if lm_pass == "rescore" and beam_prune != 0:
            raise ValueError("--beam_prune shapes the fused in-beam search; "
                             "the rescore pass decodes its n-best exactly")
        if beam_prune != 0 and beam_prune < 2:
            raise ValueError("--beam_prune must be >= 2 (blank + one "
                             "symbol), or 0 for the exact search")
    if lm_pass not in ("fused", "rescore"):
        raise ValueError(f"unknown lm_pass {lm_pass!r}")
    if lm_pass == "rescore" and lm_type != "neural":
        raise ValueError("--lm_pass rescore re-ranks the n-best with the "
                         "neural LM — set --lm_type neural (the n-gram "
                         "table fuses in-beam)")
    # tokenizer choice comes from the model's training config (text.units
    # round-trips through config.json); BPE artifacts live next to
    # alphabet.txt in the corpus dir
    cfg_peek = config
    cfg_path = os.path.join(model_path, "config.json")
    if cfg_peek is None and os.path.exists(cfg_path):
        cfg_peek = Config.from_json(open(cfg_path).read())
    if cfg_peek is not None and cfg_peek.text.units == "bpe":
        from .data.bpe import load_tokenizer

        alphabet = load_tokenizer(os.path.dirname(alphabet_path), "bpe")
    else:
        alphabet = Alphabet.load(alphabet_path)
    params, cfg = load_model(model_path, alphabet, config, which=which_ckpt)
    beam_size = beam_size or cfg.decode.beam_size
    if beam_prune is None:
        # the config default applies only where a prune CAN apply (the
        # fused CTC beam search); rescore/transducer/seq2seq paths
        # decode exactly and just ignore it
        beam_prune = cfg.decode.beam_prune if lm_pass != "rescore" else 0
    beam_prune = beam_prune or None  # 0 -> exact (None internally)

    if decoder not in ("greedy", "beam"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if timestamps:
        if cfg.model.family in ("transducer", "seq2seq"):
            raise ValueError("--timestamps needs a CTC-family model "
                             "(frame-synchronous posteriors); the "
                             f"{cfg.model.family} decoder is label-"
                             "synchronous")
    lm_tab = None
    neural_lm = None
    if lm_order:
        if cfg.model.family == "transducer":
            raise ValueError("LM shallow fusion is a CTC-beam feature; the "
                             "transducer's prediction network IS its "
                             "language model")
        if cfg.model.family == "seq2seq":
            raise ValueError("LM shallow fusion is a CTC-beam feature; the "
                             "seq2seq decoder LSTM IS its language model")
        if decoder != "beam":
            raise ValueError("LM shallow fusion needs --decoder beam")
        if not lm_train_tsv:
            raise ValueError("lm_order set but no lm_train_tsv to train on")
        if lm_type == "neural":
            from .decoding.neural_lm import (load_lm, save_lm,
                                             train_neural_lm)

            lm_path = os.path.join(model_path, "lm_neural.ckpt")
            # the cache is keyed on WHAT it was trained on: reusing a
            # checkpoint after --lm_steps or the training TSV changed
            # would silently report fusion CER for a stale LM
            meta = {"steps": lm_steps, "vocab": alphabet.size,
                    "tsv": os.path.abspath(lm_train_tsv),
                    "tsv_size": os.path.getsize(lm_train_tsv),
                    "tsv_mtime": int(os.path.getmtime(lm_train_tsv))}
            meta_path = lm_path + ".json"
            cached = None
            if os.path.exists(meta_path):
                try:
                    with open(meta_path) as fo:
                        cached = json.load(fo)
                except Exception:
                    cached = None
            neural_lm = load_lm(lm_path, alphabet.size) \
                if cached == meta else None
            if neural_lm is None:
                lm_manifest = load_manifest(lm_train_tsv, aud_path)
                neural_lm = train_neural_lm(
                    (u.text for u in lm_manifest), alphabet, steps=lm_steps)
                save_lm(neural_lm, lm_path)
                with open(meta_path, "w") as fo:
                    json.dump(meta, fo)
                print(f"[predict] neural LM trained ({lm_steps} steps) -> "
                      f"{lm_path}")
            else:
                print(f"[predict] neural LM reused from {lm_path} "
                      f"(same steps + training TSV)")
        else:
            from .decoding.lm import lm_from_manifest

            lm_manifest = load_manifest(lm_train_tsv, aud_path)
            lm_tab = lm_from_manifest(lm_manifest, alphabet, order=lm_order)

    utts = load_manifest(test_path, aud_path)
    if limit:
        utts = utts[:limit]
    it = BatchIterator(utts, alphabet, batch_size, shuffle=False,
                       sample_rate=cfg.features.sample_rate)
    from .data.dataset import PrefetchIterator

    it = PrefetchIterator(it, depth=2)  # overlap WAV decode with decoding

    targets: list[str] = []
    predicted: list[str] = []
    timing_rows: list[dict] = []
    for batch in it:
        if cfg.model.family == "transducer":
            labels, lens = _forward_transducer(
                params, batch.wave, batch.num_samples, cfg,
                beam_size=beam_size if decoder == "beam" else 0)
            targets.extend(batch.texts)
            predicted.extend(ids_to_strings(labels, lens, alphabet))
            continue
        if cfg.model.family == "seq2seq":
            if decoder == "beam":
                # true attention-decoder beam search (the decode the
                # reference's predict assumed, model.py:324, realized over
                # the autoregressive decoder itself)
                labels, lens = _forward_seq2seq_beam(
                    params, batch.wave, batch.num_samples, cfg,
                    beam_size=beam_size)
                labels, lens = np.asarray(labels), np.asarray(lens)
            else:
                tokens, _ = _forward_seq2seq(params, batch.wave,
                                             batch.num_samples, cfg)
                labels, lens = _cut_at_eos(np.asarray(tokens))
            hyps = ids_to_strings(labels, lens, alphabet)
            targets.extend(batch.texts)
            predicted.extend(hyps)
            continue
        log_probs, mask, frame_lens = _forward(params, batch.wave,
                                               batch.num_samples, cfg)
        if decoder == "greedy":
            if timestamps:
                from .decoding.greedy import (assemble_word_timings,
                                              greedy_decode_with_timing)

                labels, lens, onsets, tok_lp = greedy_decode_with_timing(
                    log_probs, mask)
                labels, lens, onsets, tok_lp, flens_h = map(
                    np.asarray, (labels, lens, onsets, tok_lp, frame_lens))
                sr = cfg.features.sample_rate
                for i in range(labels.shape[0]):
                    # exact per-utterance frame duration: audio seconds
                    # over MODEL output frames (family-agnostic — covers
                    # any subsampling factor)
                    spf = ((float(batch.num_samples[i]) / sr)
                           / max(int(flens_h[i]), 1))
                    n = int(lens[i])
                    words = assemble_word_timings(
                        labels[i], n, onsets[i], tok_lp[i], alphabet, spf)
                    conf = (float(np.exp(np.mean(tok_lp[i][:n])))
                            if n else 0.0)
                    timing_rows.append({
                        "target": batch.texts[i],
                        "predicted": alphabet.decode(labels[i][:n]),
                        "confidence": round(conf, 4),
                        "words": words,
                    })
            else:
                labels, lens = greedy_decode(log_probs, mask)
            hyps = ids_to_strings(labels, lens, alphabet)
        elif decoder == "beam":
            if neural_lm is not None and lm_pass == "rescore":
                from .decoding.rescore import rescore_nbest

                labels, lens, _ = rescore_nbest(
                    log_probs, frame_lens, neural_lm, beam_size=beam_size,
                    max_label_len=cfg.decode.max_label_len,
                    lm_weight=lm_weight, length_bonus=length_bonus)
            else:
                from .decoding.beam import beam_decode

                labels, lens, _ = beam_decode(
                    log_probs, frame_lens, beam_size=beam_size,
                    max_label_len=cfg.decode.max_label_len,
                    lm=lm_tab, lm_weight=lm_weight,
                    length_bonus=length_bonus, neural_lm=neural_lm,
                    prune=beam_prune)
            hyps = ids_to_strings(labels, lens, alphabet)
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        targets.extend(batch.texts)
        predicted.extend(hyps)

    save_predictions(targets, predicted, model_path)
    if timestamps:
        ts_path = os.path.join(model_path, "timestamps.jsonl")
        with open(ts_path, "w") as fo:
            for row in timing_rows:
                fo.write(json.dumps(row, ensure_ascii=False) + "\n")
        print(f"[predict] word timings + confidences -> {ts_path}")
    stats = evaluate_corpus(targets, predicted)
    print(f"CER: {stats['cer_mean']:.4f} WER: {stats['wer_mean']:.4f} "
          f"(corpus: cer={stats['cer']:.4f} wer={stats['wer']:.4f}, "
          f"{stats['num_utts']} utts)")
    return stats
