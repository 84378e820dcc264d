"""pg_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) policy-gradient ASR framework.

Re-implements, TPU-first, the capability surface of the reference repo
ana-kuznetsova/Policy-Gradient-ASR (see SURVEY.md): waveform -> log-mel/MFCC
featurization fused on-device, a lax.scan BiLSTM acoustic encoder with a Pallas
fused-gate LSTM cell, on-chip CTC forward-backward loss, REINFORCE fine-tuning
over sampled CTC alignment paths scored by on-chip edit-distance rewards,
vectorized greedy + prefix-beam CTC decoding, CER/WER metrics, best/last
checkpointing, and data-parallel SPMD scaling over a TPU mesh.

Layout:
  ops/       fused numerical primitives (features, LSTM, CTC, edit distance, Pallas kernels)
  models/    model families (BiLSTM-CTC flagship; transformer/conformer CTC; attention seq2seq)
  decoding/  greedy + prefix beam search (vectorized on-device, host oracle)
  rl/        REINFORCE policy-gradient fine-tuning + reward functions
  data/      manifests, alphabets, text preproc, batching/bucketing, audio IO
  parallel/  mesh construction + sharding rules (dp/tp over ICI)
  serving.py streaming (LC-BLSTM chunked) transcription
  utils/     profiling, logging, misc
"""

__version__ = "0.1.0"
