"""LSTM recurrence as jax.lax.scan, TPU-first.

Design (vs the reference's cuDNN packed-sequence BiLSTM, reference
model.py:39-44,53-55):
  * The input projection x@W + b for ALL timesteps is hoisted out of the
    recurrence into one large (B*T, I) x (I, 4H) matmul — MXU-shaped work.
  * The scan body is only h@U + fused gate nonlinearities; XLA fuses the
    elementwise gates into the recurrent matmul.
  * Variable lengths are handled with masks (carry frozen / outputs zeroed at
    padded steps), not packing: static shapes keep XLA happy and match
    pad_packed_sequence semantics (padded outputs are zero).
  * An optional Pallas fused-gate kernel (ops/pallas_lstm.py) keeps h,c and
    the recurrent weights resident in VMEM across the whole time loop.

Gate order everywhere: i, f, g, o (sigmoid, sigmoid, tanh, sigmoid).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

# Scan-unroll factor for the recurrence (see lstm_scan). Overridable for
# perf sweeps without code edits: PGASR_LSTM_UNROLL=4 python bench.py
UNROLL = int(os.environ.get("PGASR_LSTM_UNROLL", "8"))


def resolve_use_pallas(flag) -> bool:
    """Resolve a ModelConfig.use_pallas_lstm value ("auto" | bool).

    "auto" enables the Pallas kernels only on single-device TPU: they are
    the measured win there, while CPU lacks Mosaic and multi-device SPMD
    would need a shard_map wrapping for pallas_call to partition."""
    if flag == "auto":
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    return bool(flag)


def init_lstm_params(key, input_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init for all LSTM weights (the standard
    recurrent init; bias starts at 0 except forget gate +1 for stable early
    training)."""
    k_w, k_u = jax.random.split(key)
    bound = 1.0 / math.sqrt(hidden)
    W = jax.random.uniform(k_w, (input_dim, 4 * hidden), dtype, -bound, bound)
    U = jax.random.uniform(k_u, (hidden, 4 * hidden), dtype, -bound, bound)
    b = jnp.zeros((4 * hidden,), dtype).at[hidden : 2 * hidden].set(1.0)
    return {"W": W, "U": U, "b": b}


def _gate_step(h, c, pre, hidden: int):
    """Fused gate math. pre: (B, 4H) pre-activations (x-proj + h@U + b)."""
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden : 2 * hidden])
    g = jnp.tanh(pre[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(pre[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


@partial(jax.jit, static_argnames=("reverse", "hidden", "unroll"))
def lstm_scan(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
              hidden: int, reverse: bool = False, unroll: int = UNROLL) -> jnp.ndarray:
    """Run the recurrence over time.

    Args:
      xp: (B, T, 4H) precomputed input projections (x@W + b).
      U: (H, 4H) recurrent weights.
      mask: (B, T) 1.0 at valid steps.
      reverse: scan right-to-left (the backward direction of a BiLSTM).
      unroll: scan body replication — the recurrence is latency-bound
        (tiny per-step matmuls, T sequential steps), so amortizing XLA's
        per-iteration loop overhead over several steps is a direct win.
    Returns: (B, T, H) hidden states, zeroed at padded steps.
    """
    B = xp.shape[0]
    xp_t = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H) time-major for scan
    mask_t = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (T, B, 1)

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        pre = x_t + jnp.dot(h, U, preferred_element_type=xp.dtype)
        h_new, c_new = _gate_step(h, c, pre, hidden)
        # Freeze carry at padded steps (forward: after length; reverse:
        # before entering the valid region) and zero the emitted output.
        h = jnp.where(m_t > 0, h_new, h)
        c = jnp.where(m_t > 0, c_new, c)
        return (h, c), h_new * m_t

    h0 = jnp.zeros((B, hidden), xp.dtype)
    c0 = jnp.zeros((B, hidden), xp.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), (xp_t, mask_t), reverse=reverse,
                         unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def lstm_layer(params: dict, x: jnp.ndarray, mask: jnp.ndarray,
               reverse: bool = False, use_pallas: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """Single-direction LSTM layer over a padded batch. x: (B, T, I)."""
    hidden = params["U"].shape[0]
    xp = jnp.einsum("bti,ih->bth", x, params["W"],
                    preferred_element_type=x.dtype) + params["b"]
    if use_pallas:
        from .pallas_lstm import pallas_lstm_scan

        return pallas_lstm_scan(xp, params["U"], mask, reverse, interpret)
    return lstm_scan(xp, params["U"], mask, hidden, reverse=reverse)


def init_bilstm_params(key, input_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    kf, kb = jax.random.split(key)
    return {
        "fwd": init_lstm_params(kf, input_dim, hidden, dtype),
        "bwd": init_lstm_params(kb, input_dim, hidden, dtype),
    }


def bilstm_layer(params: dict, x: jnp.ndarray, mask: jnp.ndarray,
                 use_pallas: bool = False, fuse_directions: bool = False,
                 interpret: bool = False) -> jnp.ndarray:
    """Bidirectional layer -> (B, T, 2H).

    With fuse_directions, both directions run in ONE scan over a
    2B-stacked batch: the backward copy is time-flipped on the way in and
    out, so a single forward recurrence serves both. Same T sequential
    steps, but each step's recurrent matmul is (2B, H) x (H, 4H) — double
    the MXU fill and half the total scan/launch overhead of two separate
    scans. Flipping a padded row puts its padding at the START, where the
    zero-initialized carry is frozen by the mask until the valid region —
    exactly the reverse-scan semantics.

    The fused path requires both directions to share the recurrent U matmul
    shape; parameters stay separate (block-diagonal batching, not weight
    tying): xp carries each copy's own x@W+b, and U is selected per-half by
    stacking into the batch dimension of a block matmul.

    Measured on v5e at B=64/H=256/T=401: fused 83.5 ms vs separate 78.8 ms
    per train step — XLA already schedules the two scans well and the time
    flips cost more than the saved overhead, so fused is OFF by default and
    kept as an option for other shapes.
    """
    if use_pallas and fuse_directions:
        # Fused-direction Pallas kernel: ONE grid walk serves both
        # directions (forward time t + backward time T-1-t per step).
        # Measured on v5e at B=64/H=256/T=401: 18.78 ms/step vs 17.83 for
        # two separate kernels — the separate launches already pipeline
        # and the fused step doubles the DMA streams, so separate is the
        # default; the fused kernel may win at smaller B/T.
        from .pallas_lstm import pallas_bilstm_scan

        xpf = jnp.einsum("bti,ih->bth", x, params["fwd"]["W"],
                         preferred_element_type=x.dtype) + params["fwd"]["b"]
        xpb = jnp.einsum("bti,ih->bth", x, params["bwd"]["W"],
                         preferred_element_type=x.dtype) + params["bwd"]["b"]
        return pallas_bilstm_scan(xpf, xpb, params["fwd"]["U"],
                                  params["bwd"]["U"], mask, interpret)
    if use_pallas or not fuse_directions:
        fwd = lstm_layer(params["fwd"], x, mask, reverse=False,
                         use_pallas=use_pallas, interpret=interpret)
        bwd = lstm_layer(params["bwd"], x, mask, reverse=True,
                         use_pallas=use_pallas, interpret=interpret)
        return jnp.concatenate([fwd, bwd], axis=-1)

    B = x.shape[0]
    hidden = params["fwd"]["U"].shape[0]
    xp_f = jnp.einsum("bti,ih->bth", x, params["fwd"]["W"],
                      preferred_element_type=x.dtype) + params["fwd"]["b"]
    xp_b = jnp.einsum("bti,ih->bth", x, params["bwd"]["W"],
                      preferred_element_type=x.dtype) + params["bwd"]["b"]
    xp_b = jnp.flip(xp_b, axis=1)
    mask_b = jnp.flip(mask, axis=1)
    xp2 = jnp.concatenate([xp_f, xp_b], axis=0)        # (2B, T, 4H)
    mask2 = jnp.concatenate([mask, mask_b], axis=0)    # (2B, T)
    U2 = jnp.stack([params["fwd"]["U"], params["bwd"]["U"]])  # (2, H, 4H)

    xp_t = jnp.swapaxes(xp2, 0, 1)                     # (T, 2B, 4H)
    mask_t = jnp.swapaxes(mask2, 0, 1)[:, :, None]

    def step(carry, inp):
        h, c = carry                                    # (2B, H)
        x_t, m_t = inp
        h3 = h.reshape(2, B, hidden)
        pre = x_t + jnp.einsum("dbh,dhg->dbg", h3, U2,
                               preferred_element_type=xp2.dtype).reshape(2 * B, -1)
        h_new, c_new = _gate_step(h, c, pre, hidden)
        h = jnp.where(m_t > 0, h_new, h)
        c = jnp.where(m_t > 0, c_new, c)
        return (h, c), h_new * m_t

    h0 = jnp.zeros((2 * B, hidden), xp2.dtype)
    c0 = jnp.zeros((2 * B, hidden), xp2.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), (xp_t, mask_t))
    ys = jnp.swapaxes(ys, 0, 1)                        # (2B, T, H)
    fwd, bwd = ys[:B], jnp.flip(ys[B:], axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)
