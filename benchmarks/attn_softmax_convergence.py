"""Convergence gate for ConformerConfig.attn_softmax_bf16 (r5).

The bf16 score/softmax path is 5.7%/step faster at bench shapes
(benchmarks/attn_softmax_ab.py) but changes training numerics, so the
default flip is gated on this check: train the SAME small conformer on
the phonetic corpus (audio encodes the transcript per character — real
learning, not memorization) under f32 and bf16 softmax, same seed, and
compare test CER through the real train/predict drivers.

RESULT (v5e, seed 0, 16 epochs, 96 utts): both modes reach test
CER 0.0000 / WER 0.0000 — identical convergence, which gates the True
default. {"f32": {"test_cer": 0.0, "test_wer": 0.0}, "bf16":
{"test_cer": 0.0, "test_wer": 0.0}}

Run (TPU): python benchmarks/attn_softmax_convergence.py [workdir]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from pg_asr_tpu.config import (Config, ConformerConfig, FeatureConfig,
                               ModelConfig, TrainConfig)
from pg_asr_tpu.data.dataset import make_phonetic_corpus
from pg_asr_tpu.predict import predict
from pg_asr_tpu.train import train


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/attn_sm_conv"
    corpus = os.path.join(work, "corpus")
    if not os.path.exists(os.path.join(corpus, "train.tsv")):
        make_phonetic_corpus(corpus, n_utts=96, seed=0)

    out = {}
    for name, bf16 in (("f32", False), ("bf16", True)):
        cfg = Config(
            features=FeatureConfig(kind="logmel", n_mels=40, n_fft=256,
                                   win_length=256, hop_length=128),
            model=ModelConfig(family="conformer", vocab_size=8, input_dim=40,
                              dropout=0.1),
            conformer=ConformerConfig(num_layers=2, d_model=128, num_heads=4,
                                      ffn_dim=256, dropout=0.1,
                                      attn_softmax_bf16=bf16),
            train=TrainConfig(num_epochs=16, batch_size=8, learning_rate=3e-3,
                              warmup_steps=50, log_every=10000,
                              prefetch_depth=0),
        )
        model = os.path.join(work, f"model_{name}")
        shutil.rmtree(model, ignore_errors=True)
        t0 = time.time()
        train(corpus, model, config=cfg, resume=False)
        dt = time.time() - t0
        stats = predict(os.path.join(corpus, "test.tsv"),
                        os.path.join(corpus, "clips"),
                        os.path.join(corpus, "alphabet.txt"),
                        model, batch_size=8)
        cer, wer = stats["cer"], stats["wer"]
        out[name] = {"test_cer": round(float(cer), 4),
                     "test_wer": round(float(wer), 4),
                     "train_s": round(dt, 1)}
        print(f"attn softmax {name:5s}: test CER {cer:.4f} WER {wer:.4f} "
              f"({dt:.0f}s)", flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
