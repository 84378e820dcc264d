"""Accuracy + wall-clock head-to-head: bug-fixed torch reference vs
pg_asr_tpu, SAME corpus, SAME feature definition (BASELINE.md's "at equal
WER" leg — VERDICT r1 #2).

Corpus: the phonetic synthetic generator (data/dataset.make_phonetic_corpus)
whose audio ENCODES the transcript, so test CER measures real learning, and
~0 CER is achievable by a working system. Features: the MFCC+deltas 120-dim
parity frontend for every contestant (the reference's feature semantics,
data.py:44-79).

Contestants:
  * torch-reference-fixed — benchmarks/torch_reference.py (the reference's
    intended seq2seq-attention trainer with SURVEY §3.6 bugs fixed), CPU.
  * pg_asr_tpu seq2seq    — the same architecture family, TPU-native.
  * pg_asr_tpu bilstm-ctc — the flagship family (the reference's working
    spine re-targeted to CTC per the north star).

Prints one JSON line with every contestant's test CER/WER and wall-clock;
paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_ours(corpus: str, family: str, epochs: int, batch_size: int,
             model_dir: str) -> dict:
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   Seq2SeqConfig, TrainConfig)
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.train import train

    cfg = Config(
        features=FeatureConfig(kind="mfcc"),  # 120-dim reference parity
        model=ModelConfig(family=family, vocab_size=8, input_dim=120,
                          input_proj_dim=512, hidden_size=256, num_layers=3,
                          dropout=0.3),
        seq2seq=Seq2SeqConfig(vocab_size=8, embed_dim=128, dec_hidden=512,
                              dropout=0.3),
        train=TrainConfig(num_epochs=epochs, batch_size=batch_size,
                          learning_rate=5e-4, warmup_steps=0,
                          log_every=10_000),
    )
    t0 = time.time()
    out = train(corpus, model_dir, config=cfg, resume=False)
    train_s = time.time() - t0
    n_train = sum(1 for _ in open(os.path.join(corpus, "train.tsv"))) - 1
    t0 = time.time()
    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=batch_size,
                    decoder="beam",
                    beam_size=5)
    decode_s = time.time() - t0
    return {
        "cer": stats["cer"], "wer": stats["wer"],
        "num_test_utts": stats["num_utts"],
        "epochs": epochs, "batch_size": batch_size,
        "train_wall_s": train_s,
        "train_utts_per_sec": n_train * epochs / train_s,
        "decode_wall_s": decode_s,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/pgasr_h2h_corpus")
    ap.add_argument("--n_utts", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None, help="also write JSON here")
    ap.add_argument("--skip", default="", help="comma list of contestants "
                    "to skip (torch, seq2seq, ctc)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from pg_asr_tpu.data.dataset import make_phonetic_corpus

    if not os.path.exists(os.path.join(args.corpus, "train.tsv")):
        make_phonetic_corpus(args.corpus, n_utts=args.n_utts, seed=1)

    results: dict = {"corpus": args.corpus, "n_utts": args.n_utts,
                     "features": "mfcc+deltas 120-dim (parity frontend)"}
    if "torch" not in skip:
        from benchmarks.torch_reference import train_and_eval

        print("[h2h] torch reference (fixed) ...", file=sys.stderr)
        results["torch_reference_fixed"] = train_and_eval(
            args.corpus, epochs=args.epochs, batch_size=args.batch_size)
    if "torch_eos" not in skip:
        from benchmarks.torch_reference import train_and_eval

        print("[h2h] torch reference (fixed + EOS) ...", file=sys.stderr)
        results["torch_reference_eos_fix"] = train_and_eval(
            args.corpus, epochs=args.epochs, batch_size=args.batch_size,
            eos_fix=True)
    for fam, key in (("seq2seq", "ours_seq2seq"), ("ctc", "ours_bilstm_ctc")):
        if fam in skip:
            continue
        print(f"[h2h] pg_asr_tpu {fam} ...", file=sys.stderr)
        results[key] = run_ours(args.corpus, fam, args.epochs,
                                args.batch_size,
                                os.path.join("/tmp", f"h2h_{fam}"))
    import jax

    results["ours_backend"] = jax.default_backend()
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as fo:
            fo.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
