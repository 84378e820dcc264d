"""Neural (LSTM) character language model for shallow fusion in the
on-device beam search.

Completes the decoding story the reference left as a comment — its decoder
marks the LM hook ("*NB* this would be a good place to include an LM
score", reference CTCdecoder.py:98) — beyond the add-k n-gram tables
(decoding/lm.py): a small 2-layer LSTM LM trained on the corpus
transcripts, fused on-device inside the hash beam
(decoding/beam.py `neural_lm=`) with the same objective

    score(prefix) = log P_ctc(prefix) + lm_weight * log P_lm(prefix)
                    + length_bonus * |prefix|

Conventions shared with the n-gram tables: id 0 (the CTC blank/pad) doubles
as BOS — the state machine consumes BOS first, and the next-symbol
distribution never assigns mass to 0 (extensions are never blank), so
log P(0 | ctx) = NEG_LM.

In-beam state: each live hypothesis carries its LSTM state (consumed
[BOS, prefix...]); per frame the fused ranking needs ONE head matmul
(K, H) @ (H, A), and after selection the extended slots advance by one
batched LSTM step — all gather-free (one-hot embedding matmul), matching
the hash-scan discipline.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .lm import NEG_LM


def init_lm_params(key, vocab: int, embed_dim: int = 48, hidden: int = 160,
                   layers: int = 2) -> dict:
    """Tiny LSTM LM: embed -> `layers` x LSTM(hidden) -> head(vocab)."""
    from ..models.bilstm_ctc import init_linear
    from ..ops.lstm import init_lstm_params

    keys = jax.random.split(key, layers + 2)
    params = {
        "embed": jax.random.normal(keys[0], (vocab, embed_dim),
                                   jnp.float32) * 0.1,
        "layers": [init_lstm_params(keys[1 + i],
                                    embed_dim if i == 0 else hidden, hidden)
                   for i in range(layers)],
        "head": init_linear(keys[-1], hidden, vocab, jnp.float32),
    }
    return params


def lm_dims(params: dict) -> tuple[int, int, int]:
    """(layers, hidden, vocab) from a params tree."""
    L = len(params["layers"])
    H = params["layers"][0]["U"].shape[0]
    A = params["head"]["b"].shape[0]
    return L, H, A


def _cell(layer: dict, x, h, c):
    from ..ops.lstm import _gate_step

    H = layer["U"].shape[0]
    pre = x @ layer["W"] + h @ layer["U"] + layer["b"]
    return _gate_step(h, c, pre, H)


def lm_advance(params: dict, state: jnp.ndarray,
               sym_onehot: jnp.ndarray) -> jnp.ndarray:
    """Advance the state machine by one symbol.

    Args:
      state: (L, 2, B, H) stacked (h, c) per layer.
      sym_onehot: (B, A) one-hot of the consumed symbol (one-hot matmul
        embedding lookup — no gathers, beam-scan friendly).
    Returns: new state, same shape.
    """
    x = sym_onehot @ params["embed"]  # (B, E)
    new = []
    for i, layer in enumerate(params["layers"]):
        h, c = _cell(layer, x, state[i, 0], state[i, 1])
        new.append(jnp.stack([h, c]))
        x = h
    return jnp.stack(new)


def lm_next_logp(params: dict, state: jnp.ndarray) -> jnp.ndarray:
    """(B, A) log P(next symbol | consumed prefix): softmax over non-blank
    symbols; column 0 (blank) = NEG_LM (extensions are never blank)."""
    from ..models.bilstm_ctc import linear

    logits = linear(params["head"], state[-1, 0]).astype(jnp.float32)
    A = logits.shape[-1]
    mask = jnp.arange(A) == 0
    logits = jnp.where(mask[None, :], -jnp.inf, logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.where(mask[None, :], NEG_LM, logp)


def lm_init_state(params: dict, batch: int, dtype=jnp.float32) -> jnp.ndarray:
    """State after consuming BOS (id 0) from zeros — the decode start."""
    L, H, A = lm_dims(params)
    zeros = jnp.zeros((L, 2, batch, H), dtype)
    bos = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32), A, dtype=dtype)
    return lm_advance(params, zeros, bos)


def lm_sequence_logp(params: dict, ids: jnp.ndarray,
                     lens: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced log P(ids[:len]) per row. ids: (B, T) int32
    (0-padded). Used for training (negated) and as the host-side scoring
    oracle for fusion-parity tests."""
    B, T = ids.shape
    L, H, A = lm_dims(params)
    state = lm_init_state(params, B)

    def step(carry, t):
        state, acc = carry
        logp = lm_next_logp(params, state)  # (B, A)
        tok = ids[:, t]
        tok_lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        valid = t < lens
        acc = acc + jnp.where(valid, tok_lp, 0.0)
        onehot = jax.nn.one_hot(tok, A, dtype=state.dtype)
        new_state = lm_advance(params, state, onehot)
        state = jnp.where(valid[None, None, :, None], new_state, state)
        return (state, acc), None

    (state, acc), _ = jax.lax.scan(step, (state, jnp.zeros((B,))),
                                   jnp.arange(T))
    return acc


def score_prefix_neural(params: dict, ids) -> float:
    """Host oracle: log P_lm of one prefix (mirrors lm.score_prefix).

    Pure numpy on purpose: the host beam oracle calls this once per live
    prefix per frame with ever-varying lengths — jitting here would
    compile hundreds of shapes. Mirrors lm_advance/lm_next_logp exactly
    (f32)."""
    host = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    ids = [int(s) for s in ids]
    L = len(host["layers"])
    H = host["layers"][0]["U"].shape[0]
    A = host["head"]["b"].shape[0]

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    def advance(state, sym):
        x = host["embed"][sym]
        new = []
        for i, layer in enumerate(host["layers"]):
            h, c = state[i]
            pre = x @ layer["W"] + h @ layer["U"] + layer["b"]
            i_g = sigmoid(pre[:H])
            f_g = sigmoid(pre[H:2 * H])
            g_g = np.tanh(pre[2 * H:3 * H])
            o_g = sigmoid(pre[3 * H:])
            c = f_g * c + i_g * g_g
            h = o_g * np.tanh(c)
            new.append((h, c))
            x = h
        return new

    def next_logp(state):
        logits = state[-1][0] @ host["head"]["w"] + host["head"]["b"]
        logits = logits.astype(np.float64)
        logits[0] = -np.inf
        m = np.max(logits[1:])
        logp = logits - (m + np.log(np.sum(np.exp(logits - m))))
        logp[0] = NEG_LM
        return logp

    state = advance([(np.zeros(H, np.float32),) * 2 for _ in range(L)], 0)
    total = 0.0
    for s in ids:
        total += float(next_logp(state)[s])
        state = advance(state, s)
    return total


def train_neural_lm(texts, alphabet, *, steps: int = 300, batch: int = 32,
                    lr: float = 3e-3, max_len: int = 128, seed: int = 0,
                    embed_dim: int = 48, hidden: int = 160,
                    layers: int = 2) -> dict:
    """Train the LM on transcripts (next-char prediction, Adam).

    Tiny by design: the corpus transcripts the n-gram tables train on are
    the only data; a couple hundred steps converge on corpus-scale text.
    """
    import optax

    texts = [t for t in texts if t]
    if not texts:
        raise ValueError("no transcripts to train the LM on")
    enc = [np.asarray(alphabet.encode(t)[:max_len], np.int32) for t in texts]
    T = max(1, max(len(e) for e in enc))
    ids = np.zeros((len(enc), T), np.int32)
    lens = np.zeros((len(enc),), np.int32)
    for i, e in enumerate(enc):
        ids[i, : len(e)] = e
        lens[i] = len(e)

    params = init_lm_params(jax.random.PRNGKey(seed), alphabet.size,
                            embed_dim=embed_dim, hidden=hidden, layers=layers)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)

    def loss_fn(p, bids, blens):
        lp = lm_sequence_logp(p, bids, blens)
        return -jnp.sum(lp) / jnp.maximum(jnp.sum(blens), 1)

    @jax.jit
    def step(p, o, bids, blens):
        loss, grads = jax.value_and_grad(loss_fn)(p, bids, blens)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    n = len(enc)
    for _ in range(steps):
        idx = rng.integers(0, n, min(batch, n))
        params, opt_state, _ = step(params, opt_state,
                                    jnp.asarray(ids[idx]),
                                    jnp.asarray(lens[idx]))
    return params


def save_lm(params: dict, path: str) -> None:
    from flax import serialization

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    with open(path, "wb") as fo:
        fo.write(serialization.to_bytes(host))


def load_lm(path: str, vocab: int, embed_dim: int = 48, hidden: int = 160,
            layers: int = 2) -> dict | None:
    if not os.path.exists(path):
        return None
    from flax import serialization

    template = init_lm_params(jax.random.PRNGKey(0), vocab,
                              embed_dim=embed_dim, hidden=hidden,
                              layers=layers)
    with open(path, "rb") as fo:
        return serialization.from_bytes(template, fo.read())
