"""RNN-T (transducer) model family: encoder + prediction net + joint net.

Beyond-reference capability (the reference is CTC + an unfinished seq2seq,
reference model.py / CTCdecoder.py): the transducer (Graves 2012) is the
standard streaming-ASR architecture — frame-synchronous like CTC, but with
an autoregressive label history (the prediction network) like seq2seq.

Composition, all on-chip:
  * Encoder: any of the existing acoustic encoder backbones, reused via
    their `encode()`/`init_encoder_params()` (models/bilstm_ctc.py,
    models/transformer_ctc.py, models/conformer_ctc.py) — picked by
    config.transducer.encoder.
  * Prediction network: embedding + ONE unidirectional LSTM over the label
    sequence (ops/lstm.lstm_scan — input projections hoisted, masked carry).
    Inputs are [blank, y_1 .. y_U] so position u conditions on the first u
    labels.
  * Joint network: project encoder states and prediction states to a shared
    joint_dim, broadcast-add over the (T, U+1) lattice, tanh, vocab head.
    The (B, T', U+1, A) logits tensor is the memory hot spot; it is built
    from two small matmuls plus one broadcast add (MXU + fused VPU epilogue)
    and consumed immediately by the loss (ops/transducer.py).

TPU-first notes:
  * The embedding lookup is a one-hot matmul (MXU) — no gathers.
  * Everything has static shapes; the lattice is padded to (T', U+1) and
    invalid cells are never read by the loss (see ops/transducer.py).
  * Compute dtype follows config.model.dtype (bf16 on TPU); the loss
    normalizes in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.lstm import init_lstm_params, lstm_scan
from .bilstm_ctc import _dropout, init_linear, linear


def _enc_dim(cfg: Config) -> int:
    enc = cfg.transducer.encoder
    if enc == "bilstm":
        return 2 * cfg.model.hidden_size
    if enc == "transformer":
        return cfg.transformer.d_model
    if enc == "conformer":
        return cfg.conformer.d_model
    raise ValueError(f"unknown transducer encoder {enc!r}")


def init_params(key, cfg: Config) -> dict:
    tr = cfg.transducer
    mcfg = cfg.model
    dtype = jnp.dtype(mcfg.dtype)
    k_enc, k_emb, k_lstm, k_je, k_jp, k_out = jax.random.split(key, 6)

    if tr.encoder == "bilstm":
        from . import bilstm_ctc

        enc_params = bilstm_ctc.init_encoder_params(k_enc, mcfg)
    elif tr.encoder == "transformer":
        from . import transformer_ctc

        enc_params = transformer_ctc.init_encoder_params(k_enc, mcfg,
                                                         cfg.transformer)
    elif tr.encoder == "conformer":
        from . import conformer_ctc

        enc_params = conformer_ctc.init_encoder_params(k_enc, mcfg,
                                                       cfg.conformer)
    else:
        raise ValueError(f"unknown transducer encoder {tr.encoder!r}")

    std = (2.0 / (mcfg.vocab_size + tr.pred_embed_dim)) ** 0.5
    params = {
        "encoder": enc_params,
        "pred_embed": jax.random.normal(
            k_emb, (mcfg.vocab_size, tr.pred_embed_dim), dtype) * std,
        "pred_lstm": init_lstm_params(k_lstm, tr.pred_embed_dim,
                                      tr.pred_hidden, dtype),
        "joint_enc": init_linear(k_je, _enc_dim(cfg), tr.joint_dim, dtype),
        "joint_pred": init_linear(k_jp, tr.pred_hidden, tr.joint_dim, dtype),
        "joint_out": init_linear(k_out, tr.joint_dim, mcfg.vocab_size, dtype),
    }
    if tr.ctc_weight > 0.0:  # hybrid training: auxiliary CTC head
        params["ctc_head"] = init_linear(jax.random.fold_in(k_out, 1),
                                         _enc_dim(cfg), mcfg.vocab_size,
                                         dtype)
    return params


def encode(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
           frame_lens: jnp.ndarray, cfg: Config, train: bool = False,
           dropout_rng=None):
    """Backbone dispatch -> (enc (B, T', De), out_mask (B, T') bool,
    out_lens (B,))."""
    enc_kind = cfg.transducer.encoder
    p = params["encoder"]
    if enc_kind == "bilstm":
        from . import bilstm_ctc

        x = bilstm_ctc.encode(p, feats, frame_mask, cfg.model, train=train,
                              dropout_rng=dropout_rng)
        return x, frame_mask.astype(bool), frame_lens
    if enc_kind == "transformer":
        from . import transformer_ctc

        return transformer_ctc.encode(p, feats, frame_mask, frame_lens,
                                      cfg.model, cfg.transformer, train=train,
                                      dropout_rng=dropout_rng)
    from . import conformer_ctc

    return conformer_ctc.encode(p, feats, frame_mask, frame_lens, cfg.model,
                                cfg.conformer, train=train,
                                dropout_rng=dropout_rng)


def embed_labels(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    """(..., ) int ids -> (..., E) embeddings via a one-hot MXU matmul."""
    A = params["pred_embed"].shape[0]
    onehot = jax.nn.one_hot(ids, A, dtype=params["pred_embed"].dtype)
    return jnp.einsum("...a,ae->...e", onehot, params["pred_embed"],
                      preferred_element_type=params["pred_embed"].dtype)


def predict_states(params: dict, labels: jnp.ndarray,
                   label_lens: jnp.ndarray, cfg: Config, train: bool = False,
                   dropout_rng=None) -> jnp.ndarray:
    """Prediction-network states g_u for u = 0..U.

    g_u conditions on labels[:u]: the LSTM consumes [blank, y_1 .. y_U]
    (blank = 0 doubles as the start token, matching the id the decoder
    feeds before any emission). Returns (B, U+1, P); positions past
    label_lens are frozen-carry outputs (never read by the loss).
    """
    tr = cfg.transducer
    B, U = labels.shape
    inputs = jnp.pad(labels.astype(jnp.int32), ((0, 0), (1, 0)))  # (B, U+1)
    x = embed_labels(params, inputs)
    x = _dropout(x, cfg.model.dropout, dropout_rng, train)
    # position u valid iff u <= label_lens (position 0 = empty history)
    umask = (jnp.arange(U + 1)[None, :]
             <= label_lens[:, None]).astype(x.dtype)
    p = params["pred_lstm"]
    xp = jnp.einsum("bue,eh->buh", x, p["W"],
                    preferred_element_type=x.dtype) + p["b"]
    return lstm_scan(xp, p["U"], umask, tr.pred_hidden)


def joint_logits(params: dict, enc: jnp.ndarray,
                 pred: jnp.ndarray) -> jnp.ndarray:
    """Joint network over the full lattice.

    enc: (B, T, De), pred: (B, U+1, P) -> logits (B, T, U+1, A).
    Two matmuls + a broadcast add; the big 4-D tensor only exists for the
    cheap tanh/head stage.
    """
    e = linear(params["joint_enc"], enc)    # (B, T, J)
    g = linear(params["joint_pred"], pred)  # (B, U+1, J)
    h = jnp.tanh(e[:, :, None, :] + g[:, None, :, :])  # (B, T, U+1, J)
    return linear(params["joint_out"], h)


def joint_lattice_log_probs(params: dict, enc: jnp.ndarray,
                            pred: jnp.ndarray, labels: jnp.ndarray,
                            cfg: Config):
    """enc/pred states + labels -> (lp_blank (B,T,U+1), lp_label (B,T,U)).

    The training/MWER hot path over the WHOLE lattice. Default is the
    unfused joint_logits + joint_log_probs composition — XLA fuses the
    tanh(e ⊕ g) broadcast into the head matmul and runs it near the bf16
    compute floor (3.9 ms fwd+bwd at bench shapes). The Pallas fused
    kernel (ops/pallas_joint.py) is an opt-in via
    cfg.transducer.fused_joint for regimes where the (B,T,U+1,J) tensor
    genuinely blows HBM; it measured SLOWER at bench shapes (see the
    kernel header). Both satisfy the same contract
    (tests/test_pallas_joint.py)."""
    from ..ops.lstm import resolve_use_pallas
    from ..ops.transducer import joint_log_probs

    e = linear(params["joint_enc"], enc)
    g = linear(params["joint_pred"], pred)
    if resolve_use_pallas(cfg.transducer.fused_joint):
        from ..ops.pallas_joint import fused_joint_log_probs

        A = params["joint_out"]["w"].shape[1]
        onehot = jax.nn.one_hot(labels, A, dtype=jnp.float32)
        return fused_joint_log_probs(e, g, params["joint_out"]["w"],
                                     params["joint_out"]["b"], onehot)
    h = jnp.tanh(e[:, :, None, :] + g[:, None, :, :])
    return joint_log_probs(linear(params["joint_out"], h), labels)


def apply_lattice(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                  frame_lens: jnp.ndarray, labels: jnp.ndarray,
                  label_lens: jnp.ndarray, cfg: Config, train: bool = False,
                  dropout_rng=None, with_ctc: bool = False):
    """Full training forward: features + labels -> (lp_blank (B,T',U+1),
    lp_label (B,T',U), out_lens (B,)) for ops/transducer.transducer_loss.

    With with_ctc (hybrid training, TransducerConfig.ctc_weight > 0), also
    returns the auxiliary head's (B, T', A) CTC log-probs as a 4th value.
    """
    rngs = (jax.random.split(dropout_rng, 2)
            if dropout_rng is not None else (None, None))
    enc, out_mask, out_lens = encode(params, feats, frame_mask, frame_lens,
                                     cfg, train=train, dropout_rng=rngs[0])
    pred = predict_states(params, labels, label_lens, cfg, train=train,
                          dropout_rng=rngs[1])
    lp_blank, lp_label = joint_lattice_log_probs(params, enc, pred, labels,
                                                 cfg)
    if not with_ctc:
        return lp_blank, lp_label, out_lens
    ctc_lp = jax.nn.log_softmax(
        linear(params["ctc_head"], enc).astype(jnp.float32), axis=-1)
    ctc_lp = ctc_lp * out_mask.astype(jnp.float32)[:, :, None]
    return lp_blank, lp_label, out_lens, ctc_lp


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
