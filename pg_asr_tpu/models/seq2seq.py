"""Attention seq2seq (LAS-style) model family.

The reference's *intended* second model: its active decoder is unfinished
(returns None, reference model.py:117) and the complete variant lives in a
commented-out block whose contract is embed(A,128) -> LSTM(128->H) teacher-
forced, dot-product attention over encoder states, Linear(2H -> A),
log_softmax, producing (B, T_dec, A) log-probs (reference model.py:123-173,
SURVEY.md #9). This is a working TPU-first realization of that contract:

  * teacher-forced decoding runs the decoder LSTM over ALL steps with one
    lax.scan, then computes attention for every step as ONE batched matmul
    (B, Td, H) x (B, H, Te) on the MXU + masked softmax — not a per-step
    Python loop over encoder positions (the reference's worst hot loop,
    reference model.py:68-91);
  * inputs are shift-right teacher forcing (BOS = pad id 0), fixing the
    reference's same-position identity-copy degeneracy;
  * step-wise greedy inference is a lax.scan over decode steps carrying the
    LSTM state.

Encoder: the same BiLSTM stack as the flagship CTC model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig, Seq2SeqConfig
from ..ops.lstm import _gate_step, init_lstm_params, lstm_scan
from .bilstm_ctc import init_linear, linear, normalize_features, init_params as init_encoder_params
from ..ops.lstm import bilstm_layer


def init_params(key, enc_cfg: ModelConfig, dec_cfg: Seq2SeqConfig) -> dict:
    k_enc, k_emb, k_lstm, k_out = jax.random.split(key, 4)
    enc = init_encoder_params(k_enc, enc_cfg)
    enc.pop("ctc_head")  # encoder-only here
    embed = jax.random.normal(k_emb, (dec_cfg.vocab_size, dec_cfg.embed_dim)) * 0.1
    return {
        "encoder": enc,
        "embed": embed,
        "dec_lstm": init_lstm_params(k_lstm, dec_cfg.embed_dim, dec_cfg.dec_hidden),
        "output": init_linear(k_out, dec_cfg.dec_hidden + 2 * enc_cfg.hidden_size,
                              dec_cfg.vocab_size),
    }


def encode(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
           cfg: ModelConfig, train: bool = False, dropout_rng=None) -> jnp.ndarray:
    """(B, T, F) -> (B, T, 2H) encoder states (same stack as the CTC model,
    incl. the reference's encoder dropout, reference model.py:51,44)."""
    from ..ops.lstm import resolve_use_pallas
    from .bilstm_ctc import _dropout

    dtype = jnp.dtype(cfg.dtype)
    mask = frame_mask.astype(dtype)
    x = normalize_features(feats.astype(dtype), mask)
    x = jax.nn.leaky_relu(linear(params["input_proj"], x))
    rngs = (jax.random.split(dropout_rng, cfg.num_layers + 1)
            if (train and dropout_rng is not None)
            else [None] * (cfg.num_layers + 1))
    x = _dropout(x, cfg.dropout, rngs[0], train)
    use_pallas = resolve_use_pallas(cfg.use_pallas_lstm)
    for i, layer in enumerate(params["lstm"]):
        x = bilstm_layer(layer, x, mask, use_pallas=use_pallas)
        if i < len(params["lstm"]) - 1:
            x = _dropout(x, cfg.dropout, rngs[i + 1], train)
    return x


def _attend(dec_states: jnp.ndarray, enc_out: jnp.ndarray,
            frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Batched dot-product attention: (B,Td,H),(B,Te,E) -> context (B,Td,E)."""
    scores = jnp.einsum("bdh,beh->bde", dec_states, enc_out,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(frame_mask[:, None, :] > 0, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bde,beh->bdh", attn, enc_out,
                      preferred_element_type=dec_states.dtype)


def decode_teacher_forced(params: dict, enc_out: jnp.ndarray,
                          frame_mask: jnp.ndarray, targets: jnp.ndarray,
                          dec_cfg: Seq2SeqConfig) -> jnp.ndarray:
    """Teacher-forced decoder over precomputed encoder states:
    (B,Te,2H) enc_out + (B,Td) targets -> (B,Td,A) log-probs. Factored out
    of apply_teacher_forced so hypothesis rescoring (seq2seq MWER,
    rl/reinforce.py) pays the encoder ONCE for K hypotheses."""
    # shift-right teacher forcing, BOS = 0
    dec_in = jnp.pad(targets[:, :-1], ((0, 0), (1, 0)))
    x = params["embed"][dec_in]  # (B, Td, E)
    dec_mask = jnp.ones(dec_in.shape, x.dtype)
    dec_states = lstm_scan(
        jnp.einsum("bti,ih->bth", x, params["dec_lstm"]["W"],
                   preferred_element_type=x.dtype) + params["dec_lstm"]["b"],
        params["dec_lstm"]["U"], dec_mask, dec_cfg.dec_hidden)

    ctx = _attend(dec_states, enc_out, frame_mask)
    logits = linear(params["output"], jnp.concatenate([dec_states, ctx], -1))
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


@partial(jax.jit, static_argnames=("enc_cfg", "dec_cfg", "train"))
def apply_teacher_forced(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                         targets: jnp.ndarray, enc_cfg: ModelConfig,
                         dec_cfg: Seq2SeqConfig, train: bool = False,
                         dropout_rng=None) -> jnp.ndarray:
    """Teacher-forced forward: (B,T,F) audio features + (B,Td) targets ->
    (B,Td,A) log-probs (positions predict targets[:, t])."""
    enc_out = encode(params["encoder"], feats, frame_mask, enc_cfg,
                     train=train, dropout_rng=dropout_rng)
    return decode_teacher_forced(params, enc_out, frame_mask, targets,
                                 dec_cfg)


def greedy_from_encoder(params: dict, enc_out: jnp.ndarray,
                        frame_mask: jnp.ndarray, dec_cfg: Seq2SeqConfig,
                        max_steps: int = 128):
    """Greedy decode over precomputed encoder states (see greedy_generate)."""
    B = enc_out.shape[0]
    H = dec_cfg.dec_hidden
    U = params["dec_lstm"]["U"]
    W = params["dec_lstm"]["W"]
    b = params["dec_lstm"]["b"]

    def step(carry, _):
        tok, h, c = carry
        x = params["embed"][tok]  # (B, E)
        pre = x @ W + h @ U + b
        h, c = _gate_step(h, c, pre, H)
        ctx = _attend(h[:, None, :], enc_out, frame_mask)[:, 0]
        logits = linear(params["output"], jnp.concatenate([h, ctx], -1))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        return (nxt, h, c), (nxt, lp)

    init = (jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, H), enc_out.dtype), jnp.zeros((B, H), enc_out.dtype))
    _, (toks, lps) = jax.lax.scan(step, init, None, length=max_steps)
    return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(lps, 0, 1)


@partial(jax.jit, static_argnames=("enc_cfg", "dec_cfg", "max_steps"))
def greedy_generate(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                    enc_cfg: ModelConfig, dec_cfg: Seq2SeqConfig,
                    max_steps: int = 128):
    """Step-wise greedy decoding via lax.scan carrying the decoder LSTM state.
    Returns (tokens (B, max_steps), log_probs (B, max_steps, A))."""
    enc_out = encode(params["encoder"], feats, frame_mask, enc_cfg)
    return greedy_from_encoder(params, enc_out, frame_mask, dec_cfg,
                               max_steps)


def generated_lengths(tokens: jnp.ndarray) -> jnp.ndarray:
    """(.., L) 0-padded generated tokens -> length at the first EOS (pad id
    0 doubles as EOS, the contract losses.seq2seq_nll_loss trains)."""
    is_eos = tokens == 0
    return jnp.where(is_eos.any(axis=-1),
                     jnp.argmax(is_eos, axis=-1),
                     tokens.shape[-1]).astype(jnp.int32)


def sample_from_encoder(params: dict, enc_out: jnp.ndarray,
                        frame_mask: jnp.ndarray, dec_cfg: Seq2SeqConfig,
                        rng, num_samples: int, max_steps: int = 128,
                        temperature: float = 1.0):
    """Autoregressive DECODER SAMPLING for SCST policy-gradient training:
    one lax.scan advances all S*B sampled continuations together, drawing
    each step's token with jax.random.categorical from the (temperature-
    scaled, stop-gradiented) step posterior while the returned per-step
    log-probs stay DIFFERENTIABLE w.r.t. params — exactly what REINFORCE
    needs (grad flows through the decoder LSTM carry, the attention
    contexts, and the shared encoder states; the sampled ids do not).

    The reference's namesake concept aims at these decoder posteriors
    (reference policy_grad.py:4-16 consumes Seq2Seq.forward outputs,
    reference model.py:174-183); it never had the sampler.

    Returns (tokens (S,B,L) int32, tok_lp (S,B,L) f32 log p(token_t),
    entropy (S,B,L) f32 of each step's full posterior).
    """
    B, Te, E = enc_out.shape
    S = num_samples
    H = dec_cfg.dec_hidden
    W, U, b = (params["dec_lstm"]["W"], params["dec_lstm"]["U"],
               params["dec_lstm"]["b"])
    enc_t = jnp.tile(enc_out, (S, 1, 1))        # (S*B, Te, E)
    mask_t = jnp.tile(frame_mask, (S, 1))       # (S*B, Te)
    N = S * B
    inv_temp = 1.0 / jnp.maximum(jnp.float32(temperature), 1e-6)

    def step(carry, key):
        tok, h, c = carry
        x = params["embed"][tok]  # (N, E)
        pre = x @ W + h @ U + b
        h, c = _gate_step(h, c, pre, H)
        ctx = _attend(h[:, None, :], enc_t, mask_t)[:, 0]
        logits = linear(params["output"], jnp.concatenate([h, ctx], -1))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # (N, A)
        nxt = jax.random.categorical(
            key, jax.lax.stop_gradient(lp) * inv_temp, axis=-1
        ).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
        ent = -jnp.sum(jnp.exp(lp) * lp, axis=-1)
        return (nxt, h, c), (nxt, tok_lp, ent)

    init = (jnp.zeros((N,), jnp.int32),
            jnp.zeros((N, H), enc_out.dtype), jnp.zeros((N, H), enc_out.dtype))
    keys = jax.random.split(rng, max_steps)
    _, (toks, tok_lp, ent) = jax.lax.scan(step, init, keys)
    # (L, N) -> (S, B, L)
    to_sbl = lambda a: jnp.moveaxis(a, 0, -1).reshape(S, B, max_steps)
    return to_sbl(toks), to_sbl(tok_lp), to_sbl(ent)


def _attend_beam(h: jnp.ndarray, enc_out: jnp.ndarray,
                 frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Beam-batched attention: (B,K,H),(B,Te,E) -> context (B,K,E)."""
    scores = jnp.einsum("bkh,beh->bke", h, enc_out,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(frame_mask[:, None, :] > 0, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bke,beh->bkh", attn, enc_out,
                      preferred_element_type=h.dtype)


@partial(jax.jit, static_argnames=("enc_cfg", "dec_cfg", "beam_size",
                                   "max_steps"))
def beam_generate(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                  enc_cfg: ModelConfig, dec_cfg: Seq2SeqConfig,
                  beam_size: int = 8, max_steps: int = 128,
                  length_norm: float = 0.6):
    """Batched beam search over the attention decoder — the decode the
    reference's predict() assumed but never had (reference model.py:324
    ran a CTC beam over seq2seq outputs; here the beam expands the
    autoregressive decoder itself).

    TPU-first: ALL beams of ALL utterances advance together — one
    (B*K)-row LSTM gate step, one beam-batched attention einsum, one
    top-k over the (K*A) candidate scores per utterance per step. EOS is
    the pad id 0 (the contract losses.seq2seq_nll_loss trains); finished
    beams propagate with a single zero-cost EOS continuation so their
    scores freeze. Final ranking uses GNMT length normalization
    score / ((5+L)/6)^length_norm.

    Returns (tokens (B, max_steps) int32 zero-padded after EOS,
    lens (B,) int32, scores (B,) f32 normalized best-beam scores).
    """
    enc_out = encode(params["encoder"], feats, frame_mask, enc_cfg)
    buf, lens, normed = beam_scan_from_encoder(
        params, enc_out, frame_mask, dec_cfg, beam_size, max_steps,
        length_norm)
    best = jnp.argmax(normed, axis=1)  # (B,)
    pick = jax.vmap(lambda a, i: a[i])
    tokens = pick(buf, best)  # (B, S) — already zero-padded after EOS
    out_lens = pick(lens, best).astype(jnp.int32)
    return tokens, out_lens, pick(normed, best)


def beam_scan_from_encoder(params: dict, enc_out: jnp.ndarray,
                           frame_mask: jnp.ndarray, dec_cfg: Seq2SeqConfig,
                           beam_size: int = 8, max_steps: int = 128,
                           length_norm: float = 0.6):
    """The beam search proper, over precomputed encoder states. Returns the
    FULL n-best list: (tokens (B,K,max_steps) int32 zero-padded after EOS,
    lens (B,K) int32, normed_scores (B,K) f32 — GNMT length-normalized,
    descending is NOT guaranteed; dead beams score ~-1e30)."""
    B = enc_out.shape[0]
    K = beam_size
    A = dec_cfg.vocab_size
    H = dec_cfg.dec_hidden
    W, U, b = (params["dec_lstm"]["W"], params["dec_lstm"]["U"],
               params["dec_lstm"]["b"])
    dtype = enc_out.dtype
    NEG = jnp.float32(-1e30)

    def step(carry, t):
        tok, h, c, scores, finished, buf = carry
        # one fused gate step for all B*K beams
        x = params["embed"][tok]  # (B, K, E)
        pre = (x.reshape(B * K, -1) @ W + h.reshape(B * K, H) @ U + b)
        h2, c2 = _gate_step(h.reshape(B * K, H), c.reshape(B * K, H), pre, H)
        h2 = h2.reshape(B, K, H)
        c2 = c2.reshape(B, K, H)
        ctx = _attend_beam(h2, enc_out, frame_mask)
        logits = linear(params["output"], jnp.concatenate([h2, ctx], -1))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # (B,K,A)

        # finished beams: only a zero-cost EOS continuation survives
        eos_only = jnp.full((A,), NEG).at[0].set(0.0)
        lp = jnp.where(finished[:, :, None], eos_only[None, None, :], lp)
        cand = scores[:, :, None] + lp  # (B, K, A)
        flat = cand.reshape(B, K * A)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # (B, K)
        parent = top_idx // A  # (B, K)
        new_tok = (top_idx % A).astype(jnp.int32)

        take = jax.vmap(lambda a, i: a[i])  # gather beams per utterance
        h2 = take(h2, parent)
        c2 = take(c2, parent)
        finished = take(finished, parent) | (new_tok == 0)
        buf = take(buf, parent)
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, new_tok[:, :, None], t, axis=2)
        return (new_tok, h2, c2, top_scores, finished, buf), None

    init = (jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K, H), dtype), jnp.zeros((B, K, H), dtype),
            jnp.concatenate([jnp.zeros((B, 1), jnp.float32),
                             jnp.full((B, K - 1), NEG)], axis=1)
            if K > 1 else jnp.zeros((B, K), jnp.float32),
            jnp.zeros((B, K), bool),
            jnp.zeros((B, K, max_steps), jnp.int32))
    (_, _, _, scores, _, buf), _ = jax.lax.scan(
        step, init, jnp.arange(max_steps))

    # per-beam lengths (first EOS), GNMT length-normalized scores
    is_eos = buf == 0  # (B, K, S)
    lens = jnp.where(is_eos.any(axis=2),
                     jnp.argmax(is_eos, axis=2), max_steps)  # (B, K)
    penalty = jnp.power((5.0 + lens.astype(jnp.float32)) / 6.0,
                        jnp.float32(length_norm))
    # dead beams keep the RAW -1e30 sentinel: dividing it by the length
    # penalty would lift it above the -1e29 liveness cutoff consumers
    # (rl/reinforce._mwer_seq2seq_terms) threshold against
    normed = jnp.where(scores > jnp.float32(-1e29),
                       scores / jnp.maximum(penalty, 1e-6), NEG)
    # zero-pad every beam after its first EOS
    pos = jnp.arange(max_steps)[None, None, :]
    buf = jnp.where(pos < lens[:, :, None], buf, 0)
    return buf, lens.astype(jnp.int32), normed
