"""Accuracy effect of per-frame beam pruning on TRAINED posteriors
(VERDICT r3 #3: the prune=M knob was characterized only on synthetic flat
posteriors; production judgment needs its CER effect on a real model).

Trains the flagship BiLSTM-CTC on the phonetic corpus (the repo's standard
learnable accuracy testbed, benchmarks/head_to_head.py) at TWO operating
points — a fully-trained model (peaked posteriors, the deployment regime)
and a deliberately under-trained one (soft posteriors, the stress regime
where pruning can actually change the search) — then decodes the test
split with beam 16 at prune M in (exact, 8, 6, 4, 3, 2) plus greedy.

Prints one JSON line:
  {"full": {"greedy": {...}, "beam16_exact": {...}, "beam16_prune4": ...},
   "weak": {...}}
each cell {cer, wer, decode_s}. Paste the table into docs/PERF.md.

Run (TPU): python benchmarks/beam_prune_acc.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(corpus: str, model_dir: str, epochs: int, batch_size: int):
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TrainConfig)
    from pg_asr_tpu.train import train

    cfg = Config(
        features=FeatureConfig(kind="mfcc"),
        model=ModelConfig(family="ctc", vocab_size=8, input_dim=120,
                          input_proj_dim=512, hidden_size=256, num_layers=3,
                          dropout=0.3),
        train=TrainConfig(num_epochs=epochs, batch_size=batch_size,
                          learning_rate=5e-4, warmup_steps=0,
                          log_every=10_000),
    )
    train(corpus, model_dir, config=cfg, resume=False)


def _decode(corpus: str, model_dir: str, decoder: str,
            beam_size: int = 16, prune=None, batch_size: int = 8) -> dict:
    from pg_asr_tpu.predict import predict

    t0 = time.time()
    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=batch_size, decoder=decoder,
                    beam_size=beam_size, beam_prune=prune)
    return {"cer": round(stats["cer"], 4), "wer": round(stats["wer"], 4),
            "decode_s": round(time.time() - t0, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/pgasr_prune_corpus")
    ap.add_argument("--n_utts", type=int, default=96)
    ap.add_argument("--epochs_full", type=int, default=40)
    ap.add_argument("--epochs_weak", type=int, default=6)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pg_asr_tpu.data.dataset import make_phonetic_corpus

    if not os.path.exists(os.path.join(args.corpus, "train.tsv")):
        make_phonetic_corpus(args.corpus, n_utts=args.n_utts, seed=1)

    results: dict = {"corpus": args.corpus, "beam_size": 16}
    for tag, epochs in (("full", args.epochs_full),
                        ("weak", args.epochs_weak)):
        model_dir = f"/tmp/pgasr_prune_{tag}"
        print(f"[prune_acc] training {tag} ({epochs} epochs) ...",
              file=sys.stderr)
        _train(args.corpus, model_dir, epochs, args.batch_size)
        rows = {"greedy": _decode(args.corpus, model_dir, "greedy")}
        rows["beam16_exact"] = _decode(args.corpus, model_dir, "beam")
        for m in (8, 6, 4, 3, 2):
            rows[f"beam16_prune{m}"] = _decode(args.corpus, model_dir,
                                               "beam", prune=m)
        results[tag] = rows
        print(f"[prune_acc] {tag}: " + json.dumps(rows), file=sys.stderr)

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as fo:
            fo.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
