"""`--mode align`: forced alignment of reference transcripts to audio.

For every manifest row, run the acoustic model, Viterbi-align the
REFERENCE text over the CTC lattice (ops/align.py), and write
<model_path>/alignments.jsonl — per word: [start, end] seconds (true
spans, not emission peaks) and a confidence (geometric-mean posterior of
the aligned frames); per utterance: the joint path log-prob. The
dataset-segmentation/captioning primitive (the reference repo had no
alignment surface at all; its decode loop returned bare strings,
reference model.py:321-334).

CTC families only — the transducer/seq2seq decoders are label-
synchronous and have no frame-level lattice of this shape.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .config import Config
from .data.text import Alphabet


def _group_words(ids, spans, alphabet):
    """Char/BPE token spans -> word groups. Boundary tokens: literal
    space (char units) or word-start marker (BPE). Returns a list of
    (word_text, [token span indices])."""
    from .data.bpe import MARKER

    words = []
    cur_text: list[str] = []
    cur_idx: list[int] = []

    def flush():
        text = "".join(cur_text).strip()
        if text and cur_idx:
            words.append((text, list(cur_idx)))
        cur_text.clear()
        cur_idx.clear()

    for k, (pos, _, _) in enumerate(spans):
        sym = alphabet.symbols[int(ids[pos])]
        if sym == " " or sym.startswith(MARKER):
            flush()
        piece = alphabet.piece(int(ids[pos])).lstrip(" ")
        if piece:
            cur_text.append(piece)
            cur_idx.append(k)
    flush()
    return words


def align_corpus(test_path: str, aud_path: str, alphabet_path: str,
                 model_path: str, batch_size: int = 32,
                 config: Config | None = None,
                 which_ckpt: str = "best", limit: int | None = None) -> dict:
    """Force-align every utterance of a manifest; write alignments.jsonl."""
    from .data.dataset import BatchIterator, load_manifest
    from .ops.align import ctc_forced_align
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
        raise ValueError("--mode align needs a CTC-family model (frame-"
                         f"synchronous lattice); got {cfg.model.family!r}")

    utts = load_manifest(test_path, aud_path)
    if limit:
        utts = utts[:limit]
    it = BatchIterator(utts, alphabet, batch_size, shuffle=False,
                       sample_rate=cfg.features.sample_rate)

    rows = []
    n_fail = 0
    sr = cfg.features.sample_rate
    for batch in it:
        log_probs, mask, frame_lens = _forward(params, batch.wave,
                                               batch.num_samples, cfg)
        spans_b = ctc_forced_align(log_probs, frame_lens, batch.labels,
                                   batch.label_lens)
        lp = np.asarray(log_probs)
        flens = np.asarray(frame_lens)
        for i, spans in enumerate(spans_b):
            text = batch.texts[i]
            if not spans:
                n_fail += 1
                rows.append({"text": text, "aligned": False, "words": []})
                continue
            # exact per-utterance frame duration (any subsampling factor)
            spf = ((float(batch.num_samples[i]) / sr)
                   / max(int(flens[i]), 1))
            ids = batch.labels[i]
            # per-token confidence: geometric-mean posterior of the
            # aligned symbol over its span frames
            confs = []
            for pos, s, e in spans:
                sym = int(ids[pos])
                confs.append(float(np.exp(lp[i, s:e, sym].mean())))
            words = []
            for word, idx in _group_words(ids, spans, alphabet):
                words.append({
                    "word": word,
                    "start": round(spans[idx[0]][1] * spf, 3),
                    "end": round(spans[idx[-1]][2] * spf, 3),
                    "conf": round(float(np.exp(np.mean(
                        [np.log(max(confs[k], 1e-30)) for k in idx]))), 4),
                })
            rows.append({"text": text, "aligned": True, "words": words})

    out_path = os.path.join(model_path, "alignments.jsonl")
    with open(out_path, "w") as fo:
        for row in rows:
            fo.write(json.dumps(row, ensure_ascii=False) + "\n")
    n_ok = len(rows) - n_fail
    print(f"[align] {n_ok}/{len(rows)} utterances aligned -> {out_path}"
          + (f" ({n_fail} infeasible)" if n_fail else ""))
    return {"num_utts": len(rows), "num_aligned": n_ok, "path": out_path}
