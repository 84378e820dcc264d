#!/usr/bin/env bash
# Canonical launch recipes (the reference kept one saved command in
# ` server.txt`: Common Voice 5.1 eu, mode=train, device 0 — reference
#  server.txt:1). Same surface here, all four modes.
set -euo pipefail

CORPUS=${CORPUS:-/data/cv-corpus/eu}      # train/dev/test.tsv + clips/ + alphabet.txt
MODEL=${MODEL:-/tmp/pg_asr_model}

# offline text normalization + alphabet generation
python main.py --mode preproc --corpus_path "$CORPUS" --lang eu

# supervised CTC training (reference defaults: 10 epochs, batch 32)
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL" \
    --num_epochs 10 --batch_size 32

# policy-gradient fine-tune from model_best
python main.py --mode finetune_pg --corpus_path "$CORPUS" --model_path "$MODEL" \
    --pg_steps 500 --batch_size 32

# evaluation with the on-device beam decoder (reference eval beam = 5)
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL" \
    --decoder beam --beam_size 5 --batch_size 32
