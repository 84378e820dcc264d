"""`--mode pseudolabel`: confidence-filtered pseudo-labeling of unlabeled
audio — the self-training data loop.

Decode a directory of unlabeled WAVs (or a manifest without sentences)
with the timing decoder's utterance confidence (decoding/greedy.py,
geometric-mean posterior of the emitted frames), keep utterances whose
confidence clears --min_conf AND whose transcript is non-empty, and
write a Common Voice-style TSV (`path`, `sentence`, `confidence`) that
train/finetune_pg consume directly. The natural companion to the PG
loop: decode unlabeled audio -> train on the confident subset ->
PG-fine-tune on the reward — none of which the reference could start
(its decode loop returned bare strings, reference model.py:321-334).

CTC families only (confidence comes from frame posteriors)."""

from __future__ import annotations

import os

import numpy as np

from .config import Config
from .data.text import Alphabet


def _scan_wavs(wav_dir: str) -> list:
    from .data.dataset import Utterance

    exts = (".wav", ".flac")
    paths = sorted(
        os.path.join(wav_dir, f) for f in os.listdir(wav_dir)
        if f.lower().endswith(exts))
    return [Utterance(audio_path=p, text="", num_samples=-1) for p in paths]


def pseudo_label(wav_dir: str, alphabet_path: str, model_path: str,
                 out_tsv: str | None = None, batch_size: int = 32,
                 min_conf: float = 0.5, config: Config | None = None,
                 which_ckpt: str = "best", limit: int | None = None) -> dict:
    """Decode unlabeled WAVs; write the confident subset as a train TSV."""
    from .data.dataset import BatchIterator, load_manifest
    from .decoding.greedy import greedy_decode_with_timing, ids_to_strings
    from .predict import _forward, load_model

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
    if cfg.model.family in ("transducer", "seq2seq"):
        raise ValueError("--mode pseudolabel scores confidence from frame "
                         f"posteriors (CTC families); got "
                         f"{cfg.model.family!r}")

    if os.path.isdir(wav_dir):
        utts = _scan_wavs(wav_dir)
    else:  # a manifest of paths (sentences, if any, are ignored)
        utts = load_manifest(wav_dir, None)
    if limit:
        utts = utts[:limit]
    if not utts:
        raise FileNotFoundError(f"no audio found under {wav_dir}")
    it = BatchIterator(utts, alphabet, batch_size, shuffle=False,
                       sample_rate=cfg.features.sample_rate)

    out_tsv = out_tsv or os.path.join(model_path, "pseudo.tsv")
    kept, total = 0, 0
    rows = []
    for batch in it:  # batch.paths carries the source file per row
        log_probs, mask, _ = _forward(params, batch.wave,
                                      batch.num_samples, cfg)
        labels, lens, _, tok_lp = greedy_decode_with_timing(log_probs, mask)
        texts = ids_to_strings(labels, lens, alphabet)
        lens_h = np.asarray(lens)
        tok_lp_h = np.asarray(tok_lp)
        for i, text in enumerate(texts):
            total += 1
            n = int(lens_h[i])
            conf = float(np.exp(tok_lp_h[i, :n].mean())) if n else 0.0
            if n and conf >= min_conf and text.strip():
                rows.append((batch.paths[i], text, conf))
                kept += 1

    with open(out_tsv, "w") as fo:
        fo.write("path\tsentence\tconfidence\n")
        for path, text, conf in rows:
            fo.write(f"{path}\t{text}\t{conf:.4f}\n")
    print(f"[pseudolabel] kept {kept}/{total} utterances "
          f"(min_conf={min_conf}) -> {out_tsv}")
    return {"num_utts": total, "num_kept": kept, "path": out_tsv}
