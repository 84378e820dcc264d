"""Scale/stress realism on synthetic data (VERDICT r3 #7): the reference
never trained past seconds-long clips (reference data.py:64-79 pads each
batch to its max length); the blueprint (SURVEY §5 long-context) says the
TPU build must handle long utterances and real epoch sizes.

Two runs through the REAL CLI (main.py subprocess — the exact user path):

  1. volume:  a 10k-utterance corpus (1-5 s clips, mixed lengths so the
     duration-sorted bucketing actually works), 1 warm + 1 timed epoch of
     supervised CTC training at batch 64.
  2. long:    256 x 30 s utterances, conformer encoder with --remat
     (attention rematerialization trades FLOPs for HBM) at batch 16.

Each run reports wall-clock, utts/s, audio-hours/hour, and the measured
PADDING WASTE of the bucketed batches (1 - true_samples/padded_samples
over a full epoch's batch composition — the quantity bucketing exists to
minimize; the reference's batch-max padding is the comparison).

Prints one JSON line; paste into docs/PERF.md.
Run (TPU): python benchmarks/stress_scale.py [--skip volume|long]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def padding_waste(corpus: str, batch_size: int) -> dict:
    """Iterate the training BatchIterator composition (no device work) and
    measure the padded-vs-true sample ratio — against the reference's
    batch-max policy (reference data.py:64-79: shuffled batches, each
    padded to ITS max length) on the same manifest."""
    import numpy as np

    from pg_asr_tpu.data.bpe import load_tokenizer
    from pg_asr_tpu.data.dataset import BatchIterator, load_manifest

    alphabet = load_tokenizer(corpus, "char")
    manifest = load_manifest(os.path.join(corpus, "train.tsv"),
                             os.path.join(corpus, "clips"))
    it = BatchIterator(manifest, alphabet, batch_size, shuffle=True, seed=0)
    true_s = padded_s = 0
    n_shapes = set()
    durations = []
    for b in it:
        ns = np.asarray(b.num_samples)
        durations.extend(int(x) for x in ns)
        true_s += int(ns.sum())
        padded_s += int(b.wave.shape[0] * b.wave.shape[1])
        n_shapes.add(b.wave.shape)
    # reference policy on the same utterances: random order, batch-max pad
    rng = np.random.default_rng(0)
    d = np.array(durations)
    rng.shuffle(d)
    ref_padded = sum(int(d[i:i + batch_size].max()) * len(d[i:i + batch_size])
                     for i in range(0, len(d), batch_size))
    return {"padding_waste_pct": round(100.0 * (1 - true_s / padded_s), 2),
            "reference_batch_max_waste_pct": round(
                100.0 * (1 - true_s / ref_padded), 2),
            "distinct_batch_shapes": len(n_shapes),
            "total_audio_hours": round(true_s / 16000 / 3600.0, 2)}


def run_cli(args_list: list[str], timeout: float) -> tuple[float, str, list]:
    t0 = time.time()
    proc = subprocess.run([sys.executable, os.path.join(REPO, "main.py")]
                          + args_list, capture_output=True, text=True,
                          timeout=timeout)
    dt = time.time() - t0
    full = proc.stdout + proc.stderr
    tail = "\n".join(full.splitlines()[-6:])
    if proc.returncode != 0:
        raise RuntimeError(f"CLI failed rc={proc.returncode}:\n{tail}")
    # per-epoch seconds from the train log ("[train] epoch k/N ... (12.3s,
    # M steps)") — epoch 1 carries the compile, later epochs are the
    # steady state a long run sustains
    import re

    epoch_s = [float(m) for m in
               re.findall(r"\((\d+(?:\.\d+)?)s, \d+ steps\)", full)]
    return dt, tail, epoch_s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: volume,long")
    ap.add_argument("--volume_utts", type=int, default=10_000)
    ap.add_argument("--long_utts", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    results: dict = {}

    if "volume" not in skip:
        corpus = "/tmp/pgasr_stress_10k"
        if not os.path.exists(os.path.join(corpus, "train.tsv")):
            print(f"[stress] generating {args.volume_utts} utts ...",
                  file=sys.stderr)
            make_synthetic_corpus(corpus, n_utts=args.volume_utts, seed=11,
                                  min_dur=1.0, max_dur=5.0)
        waste = padding_waste(corpus, 64)
        n_train = sum(1 for _ in open(os.path.join(corpus, "train.tsv"))) - 1
        print("[stress] volume: 2-epoch CLI train ...", file=sys.stderr)
        dt, tail, epoch_s = run_cli(
            ["--mode", "train", "--corpus_path", corpus, "--model_path",
             "/tmp/pgasr_stress_10k_model", "--num_epochs", "2",
             "--batch_size", "64"], timeout=3600)
        steady = epoch_s[-1] if len(epoch_s) >= 2 else None
        # The steady epoch INSIDE the 2-epoch process is tunnel-poisoned:
        # after epoch 1's minutes of compiles, that process's device_put
        # degrades ~70x (the documented axon pathology, bench.py
        # _device_put_probe) — measured r5: epoch 2 at 21.5 s for 7 500
        # utts (~350 utts/s) vs the same epoch at full rate from a clean
        # process. So ALSO measure a fresh-process resumed epoch (the
        # compile cache makes it compile-free), which is what a real
        # deployment's long-lived driver on locally attached chips sees.
        print("[stress] volume: fresh-process resumed epoch ...",
              file=sys.stderr)
        dt3, _, epoch3 = run_cli(
            ["--mode", "train", "--corpus_path", corpus, "--model_path",
             "/tmp/pgasr_stress_10k_model", "--num_epochs", "3",
             "--batch_size", "64"], timeout=3600)
        fresh = epoch3[-1] if epoch3 else None
        results["volume_10k"] = {
            "n_train_utts": n_train, "epochs": 2,
            "wall_s": round(dt, 1),
            "utts_per_sec": round(2 * n_train / dt, 1),
            "epoch_s": epoch_s,
            "steady_epoch_utts_per_sec": (round(n_train / steady, 1)
                                          if steady else None),
            "fresh_process_epoch_s": fresh,
            "fresh_process_utts_per_sec": (round(n_train / fresh, 1)
                                           if fresh else None),
            "audio_hours_per_hour": round(
                2 * waste["total_audio_hours"] / (dt / 3600.0), 1),
            **waste,
            "tail": tail.splitlines()[-2:],
        }
        print(json.dumps(results["volume_10k"]), file=sys.stderr)

    if "long" not in skip:
        corpus = "/tmp/pgasr_stress_long"
        if not os.path.exists(os.path.join(corpus, "train.tsv")):
            print(f"[stress] generating {args.long_utts} x 30 s utts ...",
                  file=sys.stderr)
            make_synthetic_corpus(corpus, n_utts=args.long_utts, seed=12,
                                  min_dur=28.0, max_dur=30.0)
        waste = padding_waste(corpus, 16)
        n_train = sum(1 for _ in open(os.path.join(corpus, "train.tsv"))) - 1
        print("[stress] long: conformer --remat CLI train ...",
              file=sys.stderr)
        dt, tail, epoch_s = run_cli(
            ["--mode", "train", "--corpus_path", corpus, "--model_path",
             "/tmp/pgasr_stress_long_model", "--num_epochs", "2",
             "--batch_size", "16", "--model", "conformer", "--remat"],
            timeout=3600)
        steady = epoch_s[-1] if len(epoch_s) >= 2 else None
        print("[stress] long: fresh-process resumed epoch ...",
              file=sys.stderr)
        dt3, _, epoch3 = run_cli(
            ["--mode", "train", "--corpus_path", corpus, "--model_path",
             "/tmp/pgasr_stress_long_model", "--num_epochs", "3",
             "--batch_size", "16", "--model", "conformer", "--remat"],
            timeout=3600)
        fresh = epoch3[-1] if epoch3 else None
        results["long_30s"] = {
            "n_train_utts": n_train, "epochs": 2, "batch": 16,
            "model": "conformer+remat",
            "wall_s": round(dt, 1),
            "utts_per_sec": round(2 * n_train / dt, 2),
            "epoch_s": epoch_s,
            "steady_epoch_utts_per_sec": (round(n_train / steady, 2)
                                          if steady else None),
            "fresh_process_epoch_s": fresh,
            "fresh_process_utts_per_sec": (round(n_train / fresh, 2)
                                           if fresh else None),
            "audio_hours_per_hour": round(
                2 * waste["total_audio_hours"] / (dt / 3600.0), 1),
            **waste,
            "tail": tail.splitlines()[-2:],
        }
        print(json.dumps(results["long_30s"]), file=sys.stderr)

    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as fo:
            fo.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
