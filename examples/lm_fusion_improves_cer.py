"""LM shallow fusion improves CER on the phonetic corpus (measured).

Trains a deliberately under-trained BiLSTM-CTC model (few epochs, so the
acoustics leave headroom), then decodes the test split three ways:

  beam16                 acoustic only (the reference's eval decode)
  beam16 + trigram       add-k char n-gram table fusion (decoding/lm.py)
  beam16 + neural LM     LSTM LM with beam-carried states
                         (decoding/neural_lm.py) — the hook the reference
                         left as a comment (reference CTCdecoder.py:98)

Both LMs train on the corpus train-split transcripts only. Results are
recorded in docs/PERF.md ("LM shallow fusion" section).

Run: python examples/lm_fusion_improves_cer.py [workdir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.data.dataset import make_phonetic_corpus
from pg_asr_tpu.predict import predict
from pg_asr_tpu.train import train
from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache


def main() -> int:
    enable_persistent_compilation_cache()
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lm_demo"
    corpus = os.path.join(work, "corpus")
    model = os.path.join(work, "model")
    if not os.path.exists(os.path.join(corpus, "train.tsv")):
        make_phonetic_corpus(corpus, n_utts=96, seed=0)

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=40, n_fft=256,
                               win_length=256, hop_length=128),
        model=ModelConfig(vocab_size=8, input_dim=40, input_proj_dim=128,
                          hidden_size=64, num_layers=2, dropout=0.1),
        # under-train on purpose: fusion's value shows where the acoustic
        # model is uncertain
        train=TrainConfig(num_epochs=6, batch_size=8, learning_rate=3e-3,
                          warmup_steps=50, log_every=10000,
                          prefetch_depth=0),
    )
    t0 = time.time()
    train(corpus, model, config=cfg, resume=False)
    t_train = time.time() - t0

    args = (os.path.join(corpus, "test.tsv"), os.path.join(corpus, "clips"),
            os.path.join(corpus, "alphabet.txt"), model)
    train_tsv = os.path.join(corpus, "train.tsv")
    common = dict(batch_size=8, decoder="beam", beam_size=16,
                  lm_train_tsv=train_tsv)

    plain = predict(*args, batch_size=8, decoder="beam", beam_size=16)
    ngram = predict(*args, lm_order=3, lm_weight=0.4, **common)
    neural = predict(*args, lm_order=3, lm_type="neural", lm_weight=0.4,
                     lm_steps=400, **common)

    print(json.dumps({
        "cer_beam": plain["cer"], "cer_trigram": ngram["cer"],
        "cer_neural": neural["cer"],
        "wer_beam": plain["wer"], "wer_trigram": ngram["wer"],
        "wer_neural": neural["wer"],
        "train_s": round(t_train, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
