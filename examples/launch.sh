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

# ---------------------------------------------------------------------------
# Beyond-reference recipes
# ---------------------------------------------------------------------------

# model families: transformer / conformer CTC (shared decoders + PG loop)
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.tr" \
    --model transformer --num_epochs 10 --batch_size 32
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.cf" \
    --model conformer --num_epochs 10 --batch_size 32

# RNN-T transducer (streaming-ready), hybrid-trained with an auxiliary CTC
# head; decode greedy or with the on-device RNN-T beam search
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.rnnt" \
    --model transducer --transducer_encoder conformer \
    --transducer_ctc_weight 0.3 --num_epochs 10 --batch_size 32
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL.rnnt" \
    --decoder beam --beam_size 4 --batch_size 32

# BPE subword units: train the vocabulary at preproc time, then train on it
python main.py --mode preproc --corpus_path "$CORPUS" --lang eu \
    --units bpe --bpe_vocab_size 256
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.bpe" \
    --units bpe --num_epochs 10 --batch_size 32

# character n-gram LM shallow fusion in the CTC beam
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL" \
    --decoder beam --beam_size 16 --lm_order 3 --lm_weight 0.3 --batch_size 32

# LibriSpeech tree -> corpus manifests
# python main.py --mode preproc --librispeech_root /data/LibriSpeech \
#     --corpus_path /data/ls-corpus
