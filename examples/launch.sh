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

# migrate a reference-repo torch checkpoint (model_best.pth) into a warm
# start; the reference consumed 120-dim MFCC features, so match with
# --features mfcc (models/torch_import.py maps Linear/BiLSTM/embedding
# tensors exactly; heads the reference never built stay fresh)
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.mig" \
    --features mfcc --init_from_torch /path/to/model_best.pth \
    --num_epochs 5 --batch_size 32

# waveform + SpecAugment train-time augmentation (all on-device)
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.aug" \
    --specaugment --speed_perturb 0.9,1.1 --wave_noise 0.1 --wave_gain_db 3 \
    --num_epochs 10 --batch_size 32

# MWER discriminative fine-tuning over the on-device 8-best (the
# production alternative to REINFORCE; same driver + checkpoints)
python main.py --mode finetune_pg --corpus_path "$CORPUS" --model_path "$MODEL" \
    --pg_objective mwer --mwer_beam 8 --pg_steps 500 --batch_size 32

# SPMD meshes, drivable from the CLI: data parallel, GPipe pipeline,
# ZeRO-style FSDP (params + Adam moments sharded; data=2,fsdp=4 = HSDP)
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.dp" \
    --mesh data=8 --num_epochs 10 --batch_size 64
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.pp" \
    --model transformer --mesh data=2,pipe=2 --microbatches 4 \
    --num_epochs 10 --batch_size 64
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.fs" \
    --model transformer --mesh fsdp=8 --num_epochs 10 --batch_size 64

# word timestamps + confidences (CTC emission peaks) -> timestamps.jsonl
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL" \
    --timestamps --batch_size 32

# two-pass n-best rescoring with the neural LM (vs in-beam fusion above)
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL" \
    --decoder beam --beam_size 16 --lm_order 2 --lm_type neural \
    --lm_pass rescore --lm_weight 0.3 --batch_size 32

# forced alignment of reference transcripts -> alignments.jsonl
python main.py --mode align --corpus_path "$CORPUS" --model_path "$MODEL" \
    --batch_size 32

# pseudo-label unlabeled audio -> confident train TSV (self-training)
python main.py --mode pseudolabel --corpus_path "$CORPUS" \
    --model_path "$MODEL" --min_conf 0.6 --out_tsv /tmp/pseudo_train.tsv

# checkpoint averaging: retain rolling epoch snapshots, serve their mean
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL.ka" \
    --num_epochs 10 --batch_size 32 --keep_ckpts 5
python main.py --mode predict --corpus_path "$CORPUS" --model_path "$MODEL.ka" \
    --ckpt avg --batch_size 32

# deployment export: one self-contained StableHLO artifact (weights baked
# in; loadable via jax.export.deserialize with no pg_asr_tpu dependency),
# optionally weight-only int8 (~4x smaller file)
python main.py --mode export --corpus_path "$CORPUS" --model_path "$MODEL" \
    --export_batch 8 --export_seconds 20 --export_platforms cpu,tpu \
    --export_quantize int8

# elastic training: supervise the run; a crashed/OOM-killed process is
# relaunched (up to 3 times) and resumes from model_last. --fault_step
# injects one ungraceful death to drive the whole path.
python main.py --mode train --corpus_path "$CORPUS" --model_path "$MODEL" \
    --num_epochs 10 --batch_size 32 --save_every_steps 50 --max_restarts 3

# streaming with a cross-chunk prefix BEAM (emitted text = the live
# beams' agreed prefix, final by construction) + n-gram shallow fusion
python main.py --mode stream --corpus_path "$CORPUS" --model_path "$MODEL" \
    --wav utt.wav --decoder beam --beam_size 8 --lm_order 2 --lm_weight 0.3 \
    --chunk_frames 64 --right_context 32
