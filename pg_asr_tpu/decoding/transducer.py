"""Batched on-device greedy transducer decoding.

Frame-synchronous greedy search (the standard RNN-T decode): at each encoder
frame, repeatedly take the joint network's argmax; a label advances the
prediction network and stays on the frame (capped at
config.transducer.max_symbols_per_frame emissions/frame, the usual guard
against degenerate loops), blank moves to the next frame.

TPU-first: ONE lax.scan over frames for the whole batch; the per-frame
expansion is a statically unrolled max_symbols loop of batched joint + LSTM
steps. Output positions are written with one-hot adds (no scatters), the
embedding lookup is a one-hot matmul, and the encoder-side joint projection
is hoisted out of the scan as one (B, T, J) matmul.

The reference has no transducer at all (CTC decode only, reference
CTCdecoder.py); the host oracle lives in tests/test_transducer.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.bilstm_ctc import linear
from ..models.transducer import embed_labels
from ..ops.lstm import _gate_step


def _pred_step(params: dict, sym: jnp.ndarray, h: jnp.ndarray,
               c: jnp.ndarray):
    """One prediction-network LSTM step on label ids sym (B,)."""
    p = params["pred_lstm"]
    hidden = p["U"].shape[0]
    x = embed_labels(params, sym)
    pre = (jnp.dot(x, p["W"], preferred_element_type=x.dtype) + p["b"]
           + jnp.dot(h, p["U"], preferred_element_type=x.dtype))
    return _gate_step(h, c, pre, hidden)


def init_decode_state(params: dict, batch: int, dtype):
    """Empty-history decoder state (h, c, g): the prediction net after
    consuming the start (blank) token. Carried across chunks by the
    streaming path (serving.py)."""
    H = params["pred_lstm"]["U"].shape[0]
    h0 = jnp.zeros((batch, H), dtype)
    c0 = jnp.zeros((batch, H), dtype)
    h, c = _pred_step(params, jnp.zeros((batch,), jnp.int32), h0, c0)
    return h, c, linear(params["joint_pred"], h)


def greedy_scan(params: dict, E: jnp.ndarray, out_lens: jnp.ndarray,
                state, max_label_len: int, max_symbols: int):
    """Resumable greedy search over pre-projected encoder frames.

    Args:
      E: (B, T, J) joint-projected encoder states (linear(joint_enc, enc)).
      out_lens: (B,) valid frame counts within E.
      state: (h, c, g) decoder state from init_decode_state / a previous
        chunk's return.
    Returns: (labels (B, max_label_len) int32 0-padded, lens (B,), state).
    """
    B, T, _ = E.shape
    L = max_label_len

    def frame(carry, inp):
        h, c, g, pos, out = carry
        e_t, t = inp  # (B, J), scalar frame index
        active = t < out_lens  # (B,) bool
        for _ in range(max_symbols):
            logits = linear(params["joint_out"],
                            jnp.tanh(e_t + g)).astype(jnp.float32)  # (B, A)
            sym = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = active & (sym != 0) & (pos < L)
            h2, c2 = _pred_step(params, sym, h, c)
            keep = emit[:, None]
            h = jnp.where(keep, h2, h)
            c = jnp.where(keep, c2, c)
            g = jnp.where(keep, linear(params["joint_pred"], h2), g)
            out = out + (jax.nn.one_hot(pos, L, dtype=jnp.int32)
                         * (sym * emit.astype(jnp.int32))[:, None])
            pos = pos + emit.astype(jnp.int32)
            active = emit  # blank or cap stops this frame's expansion
        return (h, c, g, pos, out), None

    pos0 = jnp.zeros((B,), jnp.int32)
    out0 = jnp.zeros((B, L), jnp.int32)
    h, c, g = state
    (h, c, g, pos, out), _ = jax.lax.scan(
        frame, (h, c, g, pos0, out0),
        (jnp.swapaxes(E, 0, 1), jnp.arange(T)))
    return out, pos, (h, c, g)


@partial(jax.jit, static_argnames=("cfg", "max_label_len", "max_symbols"))
def transducer_greedy_decode(params: dict, enc: jnp.ndarray,
                             out_lens: jnp.ndarray, cfg: Config,
                             max_label_len: int = 256,
                             max_symbols: int | None = None):
    """Greedy decode encoder states.

    Args:
      enc: (B, T', De) encoder states (models/transducer.encode).
      out_lens: (B,) valid encoder frame counts.
    Returns: (labels (B, max_label_len) int32 0-padded, lens (B,) int32).
    """
    tr = cfg.transducer
    max_symbols = max_symbols or tr.max_symbols_per_frame
    B = enc.shape[0]
    E = linear(params["joint_enc"], enc)  # (B, T, J) hoisted out of the scan
    state = init_decode_state(params, B, enc.dtype)
    out, pos, _ = greedy_scan(params, E, out_lens, state, max_label_len,
                              max_symbols)
    return out, pos
