"""Model families + the shared CTC-family forward dispatch.

Families (config.model.family):
  * "ctc"         — flagship BiLSTM-CTC (models/bilstm_ctc.py), structure
                    parity with the reference encoder (reference
                    model.py:34-56)
  * "transformer" — non-recurrent transformer-CTC (models/transformer_ctc.py)
  * "conformer"   — convolution-augmented attention CTC
                    (models/conformer_ctc.py)
  * "seq2seq"     — attention encoder-decoder (models/seq2seq.py), the
                    family the reference left unfinished (model.py:99-183)

The CTC families share every downstream component (CTC loss, greedy +
prefix-beam decoding, CER/WER, REINFORCE fine-tune); `acoustic_forward`
is the single dispatch point they plug into. The attention families
subsample time, so the dispatch returns the (possibly shorter) output
mask/lengths alongside the log-probs — BiLSTM callers get their inputs
back unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp


def acoustic_forward(params, feats, frame_mask, frame_lens, cfg,
                     train: bool = False, dropout_rng=None):
    """CTC-family forward: (B,T,F) feats -> (log_probs (B,T',A),
    out_mask (B,T') f32, out_lens (B,)). T' == T for the BiLSTM family."""
    if cfg.model.family == "transformer":
        if cfg.transformer.num_experts > 0:
            from ..parallel.moe import moe_apply

            return moe_apply(params, feats, frame_mask, frame_lens, cfg,
                             train=train, dropout_rng=dropout_rng)
        from . import transformer_ctc

        return transformer_ctc.apply(params, feats, frame_mask, frame_lens,
                                     cfg.model, cfg.transformer, train=train,
                                     dropout_rng=dropout_rng)
    if cfg.model.family == "conformer":
        from . import conformer_ctc

        return conformer_ctc.apply(params, feats, frame_mask, frame_lens,
                                   cfg.model, cfg.conformer, train=train,
                                   dropout_rng=dropout_rng)
    from . import bilstm_ctc

    log_probs = bilstm_ctc.apply(params, feats, frame_mask, cfg.model,
                                 train=train, dropout_rng=dropout_rng)
    return log_probs, frame_mask.astype(jnp.float32), frame_lens
