"""Streaming inference: latency-controlled BiLSTM transcription.

The reference has no serving story at all (its predict loop pulls full
posteriors to the host per batch, reference model.py:314-326); this module
adds an online path the reference never had: transcribe audio as it
arrives, emitting text incrementally with bounded latency.

Approach — LC-BLSTM-style chunked streaming on the flagship BiLSTM-CTC
model, built for how jit wants to run:
  * audio is consumed in fixed CHUNKS of C committed frames plus R frames
    of right context (lookahead). One jitted step processes the (C+R)
    window — static shapes, one compilation, reused forever.
  * the FORWARD direction of every BiLSTM layer is exact: its (h, c)
    carries cross chunk boundaries (the jitted step returns them), so the
    left context is unbounded, exactly as offline.
  * the BACKWARD direction runs fresh within each window (zero initial
    state at the window's right edge) — right context is limited to R
    frames. This is the latency/accuracy dial of LC-BLSTM: R frames of
    lookahead latency buy that much exact backward context.
  * featurization is exact, not approximated: frame t of the offline
    conv-DFT frontend (ops/features.py) reads samples
    [t*hop - n_fft/2, t*hop + n_fft/2) with reflect padding at the stream
    start and zeros past the stream end; the host buffers raw samples and
    reproduces exactly that window per chunk, so streamed features equal
    offline features bit-for-bit.
  * per-utterance normalization (the offline model's masked instance norm)
    is inherently non-causal; streaming uses RUNNING statistics over all
    committed frames so far (exact once the utterance is complete in one
    window), or caller-provided fixed (mean, var) — e.g. corpus-level CMVN
    — which makes multi-chunk streaming exactly reproduce the offline
    forward pass whenever R reaches the utterance end (parity-tested).
  * greedy CTC collapse carries its previous-id across chunks, so repeats
    spanning a boundary collapse correctly.

Streamable families:
  * family="ctc" (LC-BLSTM machinery above) — greedy CTC collapse over
    each chunk's committed frames, previous-id carried across chunks.
  * family="transducer" with encoder="bilstm" — the frame-synchronous
    greedy transducer search continues across chunks by carrying the
    prediction-network state (h, c, joint-projected g); the transducer
    decodes strictly left-to-right, so given identical encoder states the
    streamed decode EQUALS the offline decode (parity-tested).
  * family="transformer"/"conformer" — Emformer-style block processing
    with OVERLAPPING windows (_chunk_step_attention): each committed chunk
    is encoded together with `left_context` exact left frames and R
    lookahead frames through the family's own encode() (absolute position
    offset for the transformer's sinusoidal positions; the conformer's
    rotary attention is offset-invariant, and its depthwise convs get
    their receptive field from the same context margins). Left context is
    recomputed per window — the simple-and-correct block scheme (compute
    overhead (L+C+R)/C) rather than per-layer k/v caching; with context
    covering the whole utterance the streamed outputs equal the offline
    forward exactly (parity-tested).

Restrictions (validated in __init__): feature kind="logmel" (MFCC deltas
use whole-utterance edge replication), Pallas kernels off (B=1 windows;
the lax.scan path is the right tool), transducer streaming needs the
bilstm backbone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .ops.features import dft_conv_kernel, mel_filterbank
from .ops.lstm import _gate_step, lstm_scan


def _fwd_scan_from(xp: jnp.ndarray, U: jnp.ndarray, mask: jnp.ndarray,
                   h0: jnp.ndarray, c0: jnp.ndarray, hidden: int):
    """Forward LSTM over (B, T, 4H) pre-activations from an explicit carry.
    Returns (outputs (B, T, H) zeroed at masked steps, final (h, c) frozen
    at masked steps) — the streaming version of ops.lstm.lstm_scan."""
    xp_t = jnp.swapaxes(xp, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1)[:, :, None]

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        pre = x_t + jnp.dot(h, U, preferred_element_type=xp.dtype)
        h_new, c_new = _gate_step(h, c, pre, hidden)
        h = jnp.where(m_t > 0, h_new, h)
        c = jnp.where(m_t > 0, c_new, c)
        return (h, c), h_new * m_t

    (h, c), ys = jax.lax.scan(step, (h0, c0), (xp_t, mask_t))
    return jnp.swapaxes(ys, 0, 1), (h, c)


def _window_features(window: jnp.ndarray, fcfg) -> jnp.ndarray:
    """Featurization of one (1, L) sample window: identical math to
    ops.features._frontend, VALID conv over the pre-padded host window (no
    reflect here — the host already placed reflected/zero samples).
    Returns (1, Wf, F) log-mel features."""
    kern = jnp.asarray(dft_conv_kernel(fcfg.n_fft, fcfg.win_length))
    spec = jax.lax.conv_general_dilated(
        window[:, None, :], kern, window_strides=(fcfg.hop_length,),
        padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    K = fcfg.n_fft // 2 + 1
    power = jnp.swapaxes(spec[:, :K, :] ** 2 + spec[:, K:, :] ** 2, 1, 2)
    fb = jnp.asarray(mel_filterbank(fcfg.n_mels, fcfg.n_fft,
                                    fcfg.sample_rate, fcfg.fmin, fcfg.fmax,
                                    fcfg.mel_scale))
    mel = jnp.einsum("bfk,km->bfm", power, fb,
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, fcfg.log_floor))


def _running_norm(feats: jnp.ndarray, valid: jnp.ndarray,
                  committed: jnp.ndarray, stats, fixed_norm: bool, dtype):
    """Shared streaming normalization: running scalar stats over committed
    frames (or fixed CMVN (mean, var)); pools over frames x channels like
    the offline models' normalize_features. Returns (x, new_stats)."""
    s, ss, cnt = stats
    if fixed_norm:
        mean, var = s, ss
        new_stats = stats
    else:
        cm = committed[:, :, None]
        s = s + jnp.sum(feats * cm)
        ss = ss + jnp.sum(jnp.square(feats) * cm)
        cnt = cnt + jnp.sum(committed) * feats.shape[-1]
        mean = s / jnp.maximum(cnt, 1.0)
        var = jnp.maximum(ss / jnp.maximum(cnt, 1.0) - jnp.square(mean), 0.0)
        new_stats = (s, ss, cnt)
    x = ((feats - mean) * jax.lax.rsqrt(var + 1e-5)
         * valid[:, :, None]).astype(dtype)
    return x, new_stats


@partial(jax.jit, static_argnames=("cfg", "n_ctx", "chunk", "fixed_norm"))
def _chunk_step_attention(params, window: jnp.ndarray, stats,
                          n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                          abs_frame0: jnp.ndarray, cfg: Config, n_ctx: int,
                          chunk: int, fixed_norm: bool):
    """One attention-family (transformer/conformer) streaming step.

    Block processing with overlapping windows: the (1, L) sample window
    covers n_ctx left-context + chunk committed + R lookahead raw frames,
    ALL real audio (the host grows n_ctx chunk-by-chunk until the
    configured left_context, so there is never an invalid prefix). The
    window runs through the family's OWN encode() (pre_normalized=True;
    transformer gets the absolute position offset, conformer's rotary
    attention is offset-invariant), and only the chunk's committed
    subframes are emitted. Each committed frame therefore sees n_ctx
    exact left frames and up to R right frames — Emformer-style
    limited-context semantics; with context covering the whole utterance
    the outputs equal the offline forward exactly (parity-tested).

    Returns (ids (chunk//s,) greedy argmax over committed subframes,
    new_stats).
    """
    fcfg, mcfg = cfg.features, cfg.model
    dtype = jnp.dtype(mcfg.dtype)
    feats = _window_features(window, fcfg)  # (1, Wf, F)
    Wf = feats.shape[1]
    idx = jnp.arange(Wf)[None, :]
    valid = (idx < n_valid).astype(jnp.float32)
    committed = ((idx >= n_ctx)
                 & (idx < n_ctx + n_committed)).astype(jnp.float32)
    feats = feats * valid[:, :, None]
    x, new_stats = _running_norm(feats, valid, committed, stats, fixed_norm,
                                 dtype)

    from .models.bilstm_ctc import linear

    mask = valid.astype(dtype)
    frame_lens = n_valid[None] if n_valid.ndim == 0 else n_valid
    if mcfg.family == "conformer":
        from .models import conformer_ctc

        s = cfg.conformer.subsample
        xs, _, _ = conformer_ctc.encode(params, x, mask, frame_lens, mcfg,
                                        cfg.conformer, pre_normalized=True)
    else:
        from .models import transformer_ctc

        s = cfg.transformer.subsample
        xs, _, _ = transformer_ctc.encode(
            params, x, mask, frame_lens, mcfg, cfg.transformer,
            pos_offset=abs_frame0 // s, pre_normalized=True)
    logits = linear(params["ctc_head"], xs)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(log_probs, axis=-1)[0]  # (Wf/s,)
    lp_max = jnp.max(log_probs, axis=-1)[0]  # (Wf/s,)
    return (jax.lax.dynamic_slice_in_dim(ids, n_ctx // s, chunk // s),
            jax.lax.dynamic_slice_in_dim(lp_max, n_ctx // s, chunk // s),
            new_stats)


def _encode_window(enc_params, window: jnp.ndarray, stats, carries,
                   n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                   cfg: Config, chunk: int, fixed_norm: bool):
    """Featurize + normalize + LC-BLSTM-encode one (1, L) sample window
    covering C+R frames. Shared by the CTC and transducer streaming heads.

    Returns (x (1, C+R, 2H) encoder states, updated stats, updated forward
    carries). stats is (sum, sumsq, count) running scalars (or (mean, var,
    _) when fixed_norm). carries is a tuple of per-layer (h (1,H), c (1,H))
    for the forward direction. enc_params is the encoder subtree
    ({"input_proj", "lstm"} — bilstm_ctc.init_encoder_params layout).
    """
    from .models.bilstm_ctc import linear

    fcfg, mcfg = cfg.features, cfg.model
    dtype = jnp.dtype(mcfg.dtype)
    feats = _window_features(window, fcfg)  # (1, Wf, F)
    Wf = feats.shape[1]
    valid = (jnp.arange(Wf)[None, :] < n_valid).astype(jnp.float32)
    committed = (jnp.arange(Wf)[None, :] < n_committed).astype(jnp.float32)
    feats = feats * valid[:, :, None]

    # --- normalization: running scalar stats over committed frames
    # (offline normalize_features pools over valid frames x channels)
    x, new_stats = _running_norm(feats, valid, committed, stats, fixed_norm,
                                 dtype)

    # --- encoder (mirrors bilstm_ctc.encode at train=False)
    mask = valid.astype(dtype)
    x = jax.nn.leaky_relu(linear(enc_params["input_proj"], x))
    new_carries = []
    hidden = mcfg.hidden_size
    for layer, (h0, c0) in zip(enc_params["lstm"], carries):
        xp_f = jnp.einsum("bti,ih->bth", x, layer["fwd"]["W"],
                          preferred_element_type=dtype) + layer["fwd"]["b"]
        # committed region continues the cross-chunk carry; the carry out
        # is taken at the committed boundary (context frames must not
        # advance it — they are re-fed as committed frames next chunk)
        ys_a, (h1, c1) = _fwd_scan_from(xp_f[:, :chunk], layer["fwd"]["U"],
                                        mask[:, :chunk] * committed[:, :chunk],
                                        h0.astype(dtype), c0.astype(dtype),
                                        hidden)
        ys_b, _ = _fwd_scan_from(xp_f[:, chunk:], layer["fwd"]["U"],
                                 mask[:, chunk:], h1, c1, hidden)
        fwd = jnp.concatenate([ys_a, ys_b], axis=1)
        xp_b = jnp.einsum("bti,ih->bth", x, layer["bwd"]["W"],
                          preferred_element_type=dtype) + layer["bwd"]["b"]
        bwd = lstm_scan(xp_b, layer["bwd"]["U"], mask, hidden, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        new_carries.append((h1, c1))

    return x, new_stats, tuple(new_carries)


@partial(jax.jit, static_argnames=("cfg", "chunk", "fixed_norm"))
def _chunk_step(params, window: jnp.ndarray, stats, carries,
                n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                cfg: Config, chunk: int, fixed_norm: bool):
    """One CTC streaming step: encode the window, emit argmax ids over the
    C committed slots."""
    from .models.bilstm_ctc import linear

    x, new_stats, new_carries = _encode_window(
        params, window, stats, carries, n_valid, n_committed, cfg, chunk,
        fixed_norm)
    logits = linear(params["ctc_head"], x[:, :chunk])
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(log_probs, axis=-1)[0]  # (C,)
    lp_max = jnp.max(log_probs, axis=-1)[0]  # (C,)
    return ids, lp_max, new_stats, tuple(new_carries)


@partial(jax.jit, static_argnames=("cfg", "chunk", "fixed_norm", "K",
                                   "Lmax"))
def _chunk_step_beam(params, window: jnp.ndarray, stats, carries, beam_state,
                     n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                     cfg: Config, chunk: int, fixed_norm: bool,
                     K: int, Lmax: int):
    """One CTC streaming step with PREFIX BEAM SEARCH carried across
    chunks: encode the window, then advance the buffer-implementation beam
    state (decoding/beam._step — prefixes (K, Lmax) + lens + (p_b, p_nb),
    a fully self-contained carry, which is exactly why the buffer variant
    exists alongside the faster backpointer hash scan: backpointer records
    grow with T and cannot stream) over the committed frames. With fixed
    norm + lookahead to the stream end this accumulates the SAME per-frame
    posteriors as the offline pass, so the final beam state is bit-equal
    to `beam_decode(impl="buffer")` on the whole utterance (tested)."""
    from .decoding.beam import _step
    from .models.bilstm_ctc import linear

    x, new_stats, new_carries = _encode_window(
        params, window, stats, carries, n_valid, n_committed, cfg, chunk,
        fixed_norm)
    logits = linear(params["ctc_head"], x[:, :chunk])
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[0]
    A = log_probs.shape[-1]

    def body(state, inp):
        lp, t = inp
        new = _step(state, lp, K=K, A=A, Lmax=Lmax, blank=0)
        # frames at/past n_committed (a partial final chunk) leave the
        # beam untouched — same discipline as _decode_one's frame_len mask
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(t < n_committed, n, o), new, state), None

    beam_state, _ = jax.lax.scan(
        body, beam_state, (log_probs, jnp.arange(chunk)))
    return beam_state, new_stats, tuple(new_carries)


@partial(jax.jit, static_argnames=("cfg", "chunk", "fixed_norm", "K",
                                   "Lmax"))
def _chunk_step_beam_lm(params, window: jnp.ndarray, stats, carries,
                        beam_state, lm_tab, lam, beta,
                        n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                        cfg: Config, chunk: int, fixed_norm: bool,
                        K: int, Lmax: int):
    """_chunk_step_beam with n-gram shallow fusion: the streamed carry is
    decoding/beam._step_lm_buffer's state (prefix buffers + LM contexts +
    cumulative LM scores), candidates rank by acoustic + lam*lm +
    beta*len — frame-for-frame identical to the offline
    beam_decode(lm=...) hash scan (tested)."""
    from .decoding.beam import _step_lm_buffer, lm_context_scores
    from .models.bilstm_ctc import linear

    x, new_stats, new_carries = _encode_window(
        params, window, stats, carries, n_valid, n_committed, cfg, chunk,
        fixed_norm)
    logits = linear(params["ctc_head"], x[:, :chunk])
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[0]
    A = log_probs.shape[-1]

    def body(state, inp):
        lp, t = inp
        lmn = lm_context_scores(lm_tab, state[2], state[3])
        new = _step_lm_buffer(state, lp, lmn, K=K, A=A, Lmax=Lmax, blank=0,
                              lam=lam, beta=beta)
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(t < n_committed, n, o), new, state), None

    beam_state, _ = jax.lax.scan(
        body, beam_state, (log_probs, jnp.arange(chunk)))
    return beam_state, new_stats, tuple(new_carries)


@partial(jax.jit, static_argnames=("cfg", "chunk", "fixed_norm",
                                   "max_symbols"))
def _chunk_step_rnnt(params, window: jnp.ndarray, stats, carries, dec_state,
                     n_emitted: jnp.ndarray,
                     n_valid: jnp.ndarray, n_committed: jnp.ndarray,
                     cfg: Config, chunk: int, fixed_norm: bool,
                     max_symbols: int):
    """One transducer streaming step: encode the window, then continue the
    frame-synchronous greedy search over the C committed frames from the
    carried decoder state (prediction-net h/c + joint-projected g). The
    transducer decodes strictly left-to-right, so streaming is exact given
    the same encoder states — no collapse carry needed.

    Returns (ids (C*max_symbols,), n_emitted, stats, carries, dec_state).
    """
    from .decoding.transducer import greedy_scan
    from .models.bilstm_ctc import linear

    x, new_stats, new_carries = _encode_window(
        params["encoder"], window, stats, carries, n_valid, n_committed,
        cfg, chunk, fixed_norm)
    E = linear(params["joint_enc"], x[:, :chunk])  # (1, C, J)
    # the whole-stream emission cap mirrors the offline decode's
    # max_label_len truncation (state frozen past it) exactly
    out, pos, dec_state = greedy_scan(
        params, E, n_committed[None], dec_state,
        max_label_len=chunk * max_symbols, max_symbols=max_symbols,
        pos_offset=n_emitted[None], global_cap=cfg.decode.max_label_len)
    return out[0], pos[0], new_stats, new_carries, dec_state


class StreamingTranscriber:
    """Incremental transcription of one audio stream.

    >>> st = StreamingTranscriber(params, cfg, alphabet)
    >>> for block in audio_blocks:
    ...     print(st.push(block), end="")
    >>> print(st.flush())

    Args:
      chunk_frames: committed frames per step (C) — emission granularity.
      right_context: lookahead frames (R) — the backward direction's
        context window; adds R*hop_length samples of latency.
      norm: "streaming" (running stats over committed frames) or a fixed
        (mean, var) pair (corpus CMVN); fixed norm + lookahead to the
        stream end reproduces the offline forward pass exactly.
    """

    def __init__(self, params, cfg: Config, alphabet,
                 chunk_frames: int = 64, right_context: int = 32,
                 norm: str | tuple = "streaming", left_context: int = 512,
                 timestamps: bool = False, decoder: str = "greedy",
                 beam_size: int = 8, max_label_len: int | None = None,
                 lm=None, lm_weight: float = 0.3,
                 length_bonus: float = 0.0):
        self.rnnt = cfg.model.family == "transducer"
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"decoder={decoder!r} (greedy or beam)")
        self.beam = decoder == "beam"
        if self.beam and (self.rnnt
                          or cfg.model.family not in ("ctc",)):
            raise ValueError(
                "streaming beam search is implemented for the recurrent "
                f"CTC family (got {cfg.model.family!r}); the transducer "
                "streams its own frame-synchronous search and the "
                "attention families stream greedily")
        if self.beam and timestamps:
            raise ValueError("streaming timestamps use greedy emission "
                             "peaks; decoder='beam' revises hypotheses")
        self.K = int(beam_size)
        self.Lmax = int(max_label_len if max_label_len is not None
                        else min(cfg.decode.max_label_len, 512))
        if lm is not None and not self.beam:
            raise ValueError("streaming LM fusion needs decoder='beam'")
        if lm is None and length_bonus:
            raise ValueError(
                "length_bonus applies only under LM fusion (matching "
                "offline beam_decode, which ignores it without an LM); "
                "pass lm= or drop length_bonus")
        self._lm = None if lm is None else jnp.asarray(lm, jnp.float32)
        self._lam = jnp.float32(lm_weight)
        self._beta = jnp.float32(length_bonus)
        if timestamps and self.rnnt:
            raise ValueError("streaming timestamps use CTC emission peaks; "
                             "the transducer decoder is label-synchronous")
        self.timestamps = bool(timestamps)
        # transformer/conformer stream via block processing with
        # overlapping windows: left_context exact left frames + right
        # lookahead per committed chunk (_chunk_step_attention)
        self.attention = cfg.model.family in ("transformer", "conformer")
        if self.rnnt and cfg.transducer.encoder != "bilstm":
            raise ValueError(
                "streaming transducer needs the recurrent encoder backbone "
                f"(TransducerConfig.encoder='bilstm', got "
                f"{cfg.transducer.encoder!r}): attention backbones require "
                "full left context")
        if cfg.model.family not in ("ctc", "transducer", "transformer",
                                    "conformer"):
            raise ValueError(
                f"family {cfg.model.family!r} has no streaming path "
                "(--model ctc/transducer/transformer/conformer)")
        if (self.attention and cfg.model.family == "transformer"
                and cfg.transformer.num_experts > 0):
            raise ValueError("MoE encoders have no streaming path yet")
        if cfg.features.kind != "logmel":
            raise ValueError("streaming supports logmel features only "
                             "(MFCC deltas use whole-utterance context)")
        self.params = params
        # B=1 windows: the scan path, not Pallas kernels
        self.cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "use_pallas_lstm": False}))
        self.alphabet = alphabet
        self.chunk = int(chunk_frames)
        self.right = int(right_context)
        if self.attention:
            # chunk boundaries must land on subsample boundaries so each
            # chunk emits exactly chunk/s subframes
            s = (cfg.conformer.subsample
                 if cfg.model.family == "conformer"
                 else cfg.transformer.subsample)
            self.sub = s
            self.chunk = -(-self.chunk // s) * s
            self.right = -(-self.right // s) * s
            # left context in whole chunks: n_ctx grows chunk-by-chunk, so
            # only left_context/chunk + 1 jit specializations ever compile
            self.left = -(-int(left_context) // self.chunk) * self.chunk
        self.fixed_norm = not isinstance(norm, str)
        if self.fixed_norm:
            self._norm0 = (jnp.float32(norm[0]), jnp.float32(norm[1]),
                           jnp.float32(0.0))
        else:
            self._norm0 = (jnp.float32(0.0), jnp.float32(0.0),
                           jnp.float32(0.0))
        self.reset()

    def reset(self):
        H = self.cfg.model.hidden_size
        dt = jnp.dtype(self.cfg.model.dtype)
        self._carries = tuple(
            (jnp.zeros((1, H), dt), jnp.zeros((1, H), dt))
            for _ in range(self.cfg.model.num_layers))
        self._stats = self._norm0
        self._buf = np.zeros((0,), np.float32)  # samples from _buf_start on
        self._buf_start = 0  # absolute index of _buf[0]
        self._n_samples = 0  # absolute samples received
        self._frames_done = 0
        self._prev_id = 0
        self._text: list[str] = []
        self._ended = False
        self._emitted = 0  # whole-stream label count (rnnt emission cap)
        self._words: list[dict] = []          # finalized word timings
        self._cur_word: list[tuple] = []      # (text, frame, logp, sub)
        if self.beam:
            from .decoding.beam import NEG

            K, L = self.K, self.Lmax
            p_b0 = jnp.full((K,), NEG).at[0].set(0.0)
            if self._lm is None:
                self._beam_state = (
                    jnp.zeros((K, L), jnp.int32), jnp.zeros((K,), jnp.int32),
                    p_b0, jnp.full((K,), NEG))
            else:
                # _step_lm_buffer layout: prefixes, hash, last, last2,
                # lens, p_b, p_nb, cumulative lm (init = hash-LM decode's)
                self._beam_state = (
                    jnp.zeros((K, L), jnp.int32), jnp.zeros((K,), jnp.int32),
                    jnp.full((K,), -1, jnp.int32),
                    jnp.full((K,), -1, jnp.int32),
                    jnp.zeros((K,), jnp.int32), p_b0, jnp.full((K,), NEG),
                    jnp.zeros((K,)))
            self._beam_emitted = 0  # common-prefix ids already emitted
        if self.rnnt:
            from .decoding.transducer import init_decode_state

            self._dec_state = init_decode_state(self.params, 1, dt)

    # -- host-side exact window assembly ------------------------------------
    def _sec_per_frame(self, sub: int) -> float:
        fcfg = self.cfg.features
        return fcfg.hop_length * sub / fcfg.sample_rate

    def _on_token(self, sym_id: int, frame: int, logp: float, sub: int):
        """Incremental word-timing builder (same conventions as the batch
        decoder, decoding/greedy.assemble_word_timings: tokens anchor at
        their CTC emission peak, words split on space / BPE word marker,
        confidence is the geometric mean of the word's token posteriors)."""
        from .data.bpe import MARKER

        sym = self.alphabet.symbols[sym_id]
        if sym == " " or sym.startswith(MARKER):
            self._flush_word()
        text = self.alphabet.piece(sym_id).lstrip(" ")
        if text:
            self._cur_word.append((text, frame, logp, sub))

    def _flush_word(self):
        import math

        if not self._cur_word:
            return
        spf = self._sec_per_frame(self._cur_word[0][3])
        text = "".join(t for t, _, _, _ in self._cur_word).strip()
        if text:
            self._words.append({
                "word": text,
                "start": round(self._cur_word[0][1] * spf, 3),
                "end": round((self._cur_word[-1][1] + 1) * spf, 3),
                "conf": round(math.exp(
                    sum(l for _, _, l, _ in self._cur_word)
                    / len(self._cur_word)), 4),
            })
        self._cur_word.clear()

    @property
    def words(self) -> list[dict]:
        """Finalized word timings so far (timestamps=True). The word in
        progress finalizes at the next boundary or at flush()."""
        return list(self._words)

    def _beam_snapshot(self):
        """Host view of the carried beam: (prefixes, lens, score, live).
        score is the DECISION key — acoustic total, plus
        lam*lm + beta*len under fusion (the offline hash-LM's fused
        ranking, decoding/beam._decode_one_hash_lm)."""
        from .decoding.beam import NEG

        if self._lm is None:
            prefixes, lens, p_b, p_nb = self._beam_state
            lm_sc = 0.0
        else:
            prefixes, _, _, _, lens, p_b, p_nb, lm_sc = self._beam_state
            lm_sc = np.asarray(lm_sc, np.float64)
        lens = np.asarray(lens)
        tot = np.logaddexp(np.asarray(p_b, np.float64),
                           np.asarray(p_nb, np.float64))
        live = tot > NEG / 2
        # beta ranks only under fusion — offline beam_decode(lm=None)
        # ignores length_bonus, and the per-frame _step pruning is purely
        # acoustic, so applying it here without an LM would silently
        # diverge from both the offline decode and the search objective
        score = tot + (float(self._lam) * lm_sc + float(self._beta) * lens
                       if self._lm is not None else 0.0)
        return np.asarray(prefixes), lens, np.where(live, score, tot), live

    @property
    def partial_text(self) -> str:
        """decoder='beam': the CURRENT best hypothesis (may still be
        revised by later audio, unlike the emitted/`text` stream, which is
        the live beams' agreed prefix and therefore final)."""
        if not self.beam:
            return self.text
        prefixes, lens, tot, live = self._beam_snapshot()
        if not live.any():
            return ""
        best = int(np.where(live, tot, -np.inf).argmax())
        return "".join(self.alphabet.piece(int(i))
                       for i in prefixes[best, :lens[best]])

    def _window_samples(self, f0: int, wf: int | None = None) -> np.ndarray:
        """Samples backing frames [f0, f0 + wf): absolute range
        [f0*hop - pad, (f0 + wf - 1)*hop + pad), reflect-padded at the
        stream start, zero past the stream end (= offline semantics, where
        batch zero-padding follows the utterance)."""
        fcfg = self.cfg.features
        pad = fcfg.n_fft // 2
        if wf is None:
            wf = self.chunk + self.right
        lo = f0 * fcfg.hop_length - pad
        hi = (f0 + wf - 1) * fcfg.hop_length + pad
        out = np.zeros((hi - lo,), np.float32)
        a, b = max(lo, 0), min(hi, self._n_samples)
        if b > a:
            out[a - lo : b - lo] = self._buf[a - self._buf_start :
                                             b - self._buf_start]
        if lo < 0:
            # reflect (no edge repeat): sample[-k] == sample[k]
            k = -lo
            n = min(k, max(self._n_samples - 1, 0))
            src = self._buf[1 : 1 + n][::-1]  # samples 1..n reversed
            out[k - n : k] = src
        return out

    def _ready(self, f0: int) -> bool:
        """All real samples for the window exist (mid-stream)."""
        fcfg = self.cfg.features
        pad = fcfg.n_fft // 2
        wf = self.chunk + self.right
        return (f0 + wf - 1) * fcfg.hop_length + pad <= self._n_samples

    def _total_frames(self) -> int:
        return self._n_samples // self.cfg.features.hop_length + 1

    def _run_chunk(self, n_valid: int, n_committed: int) -> str:
        piece = self.alphabet.piece  # tokenizer-aware (BPE marker -> space)
        if self.attention:
            return self._run_chunk_attention(n_valid, n_committed)
        window = jnp.asarray(
            self._window_samples(self._frames_done))[None, :]
        if self.rnnt:
            ids, n_emit, self._stats, self._carries, self._dec_state = (
                _chunk_step_rnnt(
                    self.params, window, self._stats, self._carries,
                    self._dec_state, jnp.int32(self._emitted),
                    jnp.int32(n_valid), jnp.int32(n_committed), self.cfg,
                    self.chunk, self.fixed_norm,
                    self.cfg.transducer.max_symbols_per_frame))
            out = [piece(int(i)) for i in np.asarray(ids)[:int(n_emit)]]
            self._emitted += len(out)
        elif self.beam:
            if self._lm is None:
                self._beam_state, self._stats, self._carries = \
                    _chunk_step_beam(
                        self.params, window, self._stats, self._carries,
                        self._beam_state, jnp.int32(n_valid),
                        jnp.int32(n_committed), self.cfg, self.chunk,
                        self.fixed_norm, self.K, self.Lmax)
            else:
                self._beam_state, self._stats, self._carries = \
                    _chunk_step_beam_lm(
                        self.params, window, self._stats, self._carries,
                        self._beam_state, self._lm, self._lam, self._beta,
                        jnp.int32(n_valid), jnp.int32(n_committed),
                        self.cfg, self.chunk, self.fixed_norm, self.K,
                        self.Lmax)
            # emit the agreed prefix: every live hypothesis extends an
            # earlier live hypothesis by at most one trailing symbol and
            # pruning only removes rows, so the common prefix of the live
            # beams is monotone non-decreasing — emitted text is FINAL
            prefixes, lens, _, live = self._beam_snapshot()
            out = []
            if live.any():
                rows = prefixes[live]
                m = int(lens[live].min())
                agree = 0
                while agree < m and (rows[:, agree] == rows[0, agree]).all():
                    agree += 1
                out = [piece(int(i))
                       for i in rows[0, self._beam_emitted:agree]]
                self._beam_emitted = max(agree, self._beam_emitted)
        else:
            ids, lp_max, self._stats, self._carries = _chunk_step(
                self.params, window, self._stats, self._carries,
                jnp.int32(n_valid), jnp.int32(n_committed),
                self.cfg, self.chunk, self.fixed_norm)
            ids = np.asarray(ids)[:n_committed]
            lp_max = np.asarray(lp_max)[:n_committed]
            out = []
            for j, i in enumerate(ids):
                i = int(i)
                if i != self._prev_id and i != 0:
                    out.append(piece(i))
                    if self.timestamps:
                        self._on_token(i, self._frames_done + j,
                                       float(lp_max[j]), sub=1)
                self._prev_id = i
        self._frames_done += n_committed
        # drop samples no longer needed by any future window
        fcfg = self.cfg.features
        keep_from = max(self._frames_done * fcfg.hop_length
                        - fcfg.n_fft // 2, 0)
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        piece = "".join(out)
        self._text.append(piece)
        return piece

    def _run_chunk_attention(self, n_valid: int, n_committed: int) -> str:
        """Attention families: overlapping-window block processing. The
        window covers [f0 - n_ctx, f0 + C + R) raw frames, all real audio
        (n_ctx grows chunk-by-chunk up to left_context, so every window
        prefix is valid); only the committed C subframes are emitted."""
        f0 = self._frames_done
        n_ctx = min(f0, self.left)  # multiple of chunk by construction
        wf = n_ctx + self.chunk + self.right
        window = jnp.asarray(self._window_samples(f0 - n_ctx, wf))[None, :]
        ids, lp_max, self._stats = _chunk_step_attention(
            self.params, window, self._stats,
            jnp.int32(n_ctx + n_valid), jnp.int32(n_committed),
            jnp.int32(f0 - n_ctx), self.cfg, n_ctx, self.chunk,
            self.fixed_norm)
        n_emit = -(-n_committed // self.sub)  # ceil: offline out_lens parity
        ids = np.asarray(ids)[:n_emit]
        lp_max = np.asarray(lp_max)[:n_emit]
        piece = self.alphabet.piece
        out = []
        for j, i in enumerate(ids):
            i = int(i)
            if i != self._prev_id and i != 0:
                out.append(piece(i))
                if self.timestamps:
                    self._on_token(i, f0 // self.sub + j,
                                   float(lp_max[j]), sub=self.sub)
            self._prev_id = i
        self._frames_done += n_committed
        # drop samples no longer needed by any future window (which reaches
        # back left_context frames before the next committed frame)
        fcfg = self.cfg.features
        keep_from = max((self._frames_done - self.left) * fcfg.hop_length
                        - fcfg.n_fft // 2, 0)
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        text = "".join(out)
        self._text.append(text)
        return text

    # -- public API ----------------------------------------------------------
    def push(self, samples: np.ndarray) -> str:
        """Feed raw float32 samples; returns newly emitted text."""
        if self._ended:
            raise RuntimeError("push() after flush(); call reset() first")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._n_samples += len(samples)
        emitted = []
        wf = self.chunk + self.right
        while self._ready(self._frames_done):
            emitted.append(self._run_chunk(n_valid=wf,
                                           n_committed=self.chunk))
        return "".join(emitted)

    def flush(self) -> str:
        """End of stream: process the remaining frames and return the text
        they emit."""
        if self._ended:
            return ""
        self._ended = True
        total = self._total_frames() if self._n_samples > 0 else 0
        emitted = []
        while self._frames_done < total:
            left = total - self._frames_done
            emitted.append(self._run_chunk(
                n_valid=min(left, self.chunk + self.right),
                n_committed=min(left, self.chunk)))
        if self.timestamps:
            self._flush_word()  # finalize the word in progress
        if self.beam:
            # end of stream: the best hypothesis is final — emit its
            # remainder past the agreed prefix emitted so far
            prefixes, lens, tot, live = self._beam_snapshot()
            if live.any():
                best = int(np.where(live, tot, -np.inf).argmax())
                rest = "".join(
                    self.alphabet.piece(int(i))
                    for i in prefixes[best, self._beam_emitted:lens[best]])
                self._beam_emitted = int(lens[best])
                if rest:
                    self._text.append(rest)
                    emitted.append(rest)
        return "".join(emitted)

    @property
    def text(self) -> str:
        """Everything emitted so far."""
        return "".join(self._text)


class BatchedStreamingTranscriber:
    """S concurrent audio streams through ONE jitted chunk step.

    The single-stream transcriber is latency-optimal but leaves the MXU
    mostly idle — a (1, C) window's matmuls cannot fill the systolic
    array. Serving many sessions, the production layout is slot-batched
    lockstep: every tick stacks the ready slots' windows into one
    (S, 1, L) step (`jax.vmap` of the single-stream chunk step, jitted
    once), so per-step device cost is one dispatch with S-row matmuls.
    Idle/empty slots ride along with zero valid/committed masks — their
    device state provably freezes (the masked LSTM scan propagates (h, c)
    unchanged and the running norm accumulates nothing), so slot
    occupancy can change every tick without recompiles or state leaks.

    Per-slot HOST state (sample buffer, collapse carry, text) lives in
    embedded single-stream transcribers; the DEVICE state (LSTM carries,
    norm stats) lives stacked (S, ...) here. CTC BiLSTM family only (the
    carried-state streaming path).

    >>> srv = BatchedStreamingTranscriber(params, cfg, alphabet, slots=8)
    >>> a, b = srv.open(), srv.open()
    >>> srv.push(a, wave_a); srv.push(b, wave_b)
    >>> emitted = srv.step()         # {slot: new_text} for ready slots
    >>> final_a = srv.flush(a); srv.close(a)
    """

    def __init__(self, params, cfg: Config, alphabet, slots: int = 8,
                 chunk_frames: int = 64, right_context: int = 32,
                 norm: str | tuple = "streaming", decoder: str = "greedy",
                 beam_size: int = 8, max_label_len: int | None = None):
        if cfg.model.family != "ctc":
            raise ValueError(
                "batched streaming serves the CTC BiLSTM family (carried-"
                f"state path); got {cfg.model.family!r} — run attention/"
                "RNN-T streams through StreamingTranscriber")
        if slots < 1:
            raise ValueError("slots must be >= 1")
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"decoder={decoder!r} (greedy or beam)")
        self.beam = decoder == "beam"
        self.K = int(beam_size)
        self.Lmax = int(max_label_len if max_label_len is not None
                        else min(cfg.decode.max_label_len, 512))
        self.params = params
        self.alphabet = alphabet
        self.slots = slots
        # embedded single-stream transcribers hold the per-slot HOST state
        # (sample buffer, collapse carry / emitted-prefix counter, text);
        # the stacked DEVICE state (carries, norm stats, beam) lives here.
        # decoder= flows through so each slot carries the right host-side
        # emission state (_beam_emitted for beam, _prev_id for greedy).
        self._st = [StreamingTranscriber(params, cfg, alphabet,
                                         chunk_frames=chunk_frames,
                                         right_context=right_context,
                                         norm=norm, decoder=decoder,
                                         beam_size=beam_size,
                                         max_label_len=max_label_len)
                    for _ in range(slots)]
        proto = self._st[0]
        self.cfg = proto.cfg
        self.chunk = proto.chunk
        self.right = proto.right
        self.fixed_norm = proto.fixed_norm
        self._norm0 = proto._norm0
        H = self.cfg.model.hidden_size
        dt = jnp.dtype(self.cfg.model.dtype)
        self._carries = tuple(
            (jnp.zeros((slots, 1, H), dt), jnp.zeros((slots, 1, H), dt))
            for _ in range(self.cfg.model.num_layers))
        self._stats = tuple(jnp.full((slots,), v) for v in self._norm0)
        self._is_open = [False] * slots

        cfg_c, chunk_c, fx = self.cfg, self.chunk, self.fixed_norm

        if self.beam:
            # stacked (S, K, Lmax) prefix-beam carry; per-slot search is
            # the exact single-stream _chunk_step_beam, vmapped. Idle
            # slots pass nc=0, which freezes their beam (the scan body
            # masks every update with t < n_committed).
            from .decoding.beam import NEG

            K, L = self.K, self.Lmax
            self._beam_state = (
                jnp.zeros((slots, K, L), jnp.int32),
                jnp.zeros((slots, K), jnp.int32),
                jnp.full((slots, K), NEG).at[:, 0].set(0.0),
                jnp.full((slots, K), NEG))

            def one_beam(w, stats, carries, bstate, nv, nc):
                return _chunk_step_beam(params, w, stats, carries, bstate,
                                        nv, nc, cfg_c, chunk_c, fx,
                                        K, L)

            self._vstep = jax.jit(
                jax.vmap(one_beam, in_axes=(0, 0, 0, 0, 0, 0)))
        else:
            def one(w, stats, carries, nv, nc):
                return _chunk_step(params, w, stats, carries, nv, nc,
                                   cfg_c, chunk_c, fx)

            self._vstep = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0)))

    # -- session lifecycle ---------------------------------------------------
    def open(self) -> int:
        """Claim a free slot for a new stream; returns the slot id."""
        try:
            i = self._is_open.index(False)
        except ValueError:
            raise RuntimeError(f"all {self.slots} slots busy") from None
        self._is_open[i] = True
        self._st[i].reset()
        self._carries = tuple(
            (h.at[i].set(0), c.at[i].set(0)) for h, c in self._carries)
        self._stats = tuple(
            s.at[i].set(v) for s, v in zip(self._stats, self._norm0))
        if self.beam:
            from .decoding.beam import NEG

            P, Ln, pb, pnb = self._beam_state
            self._beam_state = (P.at[i].set(0), Ln.at[i].set(0),
                                pb.at[i].set(NEG).at[i, 0].set(0.0),
                                pnb.at[i].set(NEG))
        return i

    def close(self, slot: int) -> None:
        self._is_open[slot] = False

    def push(self, slot: int, samples: np.ndarray) -> None:
        """Buffer raw float32 samples for one slot (no device work —
        chunks run on the next step())."""
        if not self._is_open[slot]:
            raise RuntimeError(f"slot {slot} is not open")
        st = self._st[slot]
        if st._ended:
            raise RuntimeError("push() after flush(); close + open anew")
        samples = np.asarray(samples, np.float32).reshape(-1)
        st._buf = np.concatenate([st._buf, samples])
        st._n_samples += len(samples)

    # -- the lockstep tick -----------------------------------------------
    def _window_len(self) -> int:
        fcfg = self.cfg.features
        wf = self.chunk + self.right
        return (wf - 1) * fcfg.hop_length + 2 * (fcfg.n_fft // 2)

    def _run(self, work: list[tuple[int, int, int]]) -> dict[int, str]:
        """One batched device step over `work` = [(slot, n_valid,
        n_committed)]; idle slots freeze. Returns {slot: new_text}."""
        if not work:
            return {}
        S, WL = self.slots, self._window_len()
        windows = np.zeros((S, 1, WL), np.float32)
        nv = np.zeros((S,), np.int32)
        nc = np.zeros((S,), np.int32)
        for i, v, c in work:
            st = self._st[i]
            windows[i, 0] = st._window_samples(st._frames_done)
            nv[i], nc[i] = v, c
        if self.beam:
            self._beam_state, self._stats, self._carries = self._vstep(
                jnp.asarray(windows), self._stats, self._carries,
                self._beam_state, jnp.asarray(nv), jnp.asarray(nc))
            ids = None
        else:
            ids, _, self._stats, self._carries = self._vstep(
                jnp.asarray(windows), self._stats, self._carries,
                jnp.asarray(nv), jnp.asarray(nc))
            ids = np.asarray(ids)  # (S, chunk)

        piece = self.alphabet.piece
        fcfg = self.cfg.features
        out: dict[int, str] = {}
        for i, _, c in work:
            st = self._st[i]
            toks = []
            if self.beam:
                # emit the live beams' agreed prefix — final by the same
                # monotonicity argument as the single-stream path
                prefixes, lens, _, live = self._beam_rows(i)
                if live.any():
                    rows = prefixes[live]
                    m = int(lens[live].min())
                    agree = 0
                    while agree < m and (rows[:, agree]
                                         == rows[0, agree]).all():
                        agree += 1
                    toks = [piece(int(t))
                            for t in rows[0, st._beam_emitted:agree]]
                    st._beam_emitted = max(agree, st._beam_emitted)
            else:
                for sym in ids[i, :c]:
                    sym = int(sym)
                    if sym != st._prev_id and sym != 0:
                        toks.append(piece(sym))
                    st._prev_id = sym
            st._frames_done += c
            keep_from = max(st._frames_done * fcfg.hop_length
                            - fcfg.n_fft // 2, 0)
            if keep_from > st._buf_start:
                st._buf = st._buf[keep_from - st._buf_start:]
                st._buf_start = keep_from
            text = "".join(toks)
            st._text.append(text)
            out[i] = text
        return out

    def _beam_rows(self, slot: int):
        """Host view of one slot's carried beam: (prefixes, lens, tot,
        live) — the batched analogue of StreamingTranscriber._beam_snapshot
        (acoustic ranking; the batched path carries no LM)."""
        from .decoding.beam import NEG

        P, Ln, pb, pnb = self._beam_state
        tot = np.logaddexp(np.asarray(pb[slot], np.float64),
                           np.asarray(pnb[slot], np.float64))
        live = tot > NEG / 2
        return np.asarray(P[slot]), np.asarray(Ln[slot]), tot, live

    def step(self) -> dict[int, str]:
        """Process ONE chunk for every open slot with a full window ready.
        Returns {slot: newly emitted text} for the slots that ran."""
        wf = self.chunk + self.right
        work = [(i, wf, self.chunk) for i in range(self.slots)
                if self._is_open[i]
                and self._st[i]._ready(self._st[i]._frames_done)]
        return self._run(work)

    def drain(self) -> dict[int, str]:
        """step() until no slot has a ready chunk; concatenates emissions."""
        out: dict[int, str] = {}
        while True:
            got = self.step()
            if not got:
                return out
            for i, t in got.items():
                out[i] = out.get(i, "") + t

    def flush(self, slot: int) -> str:
        """End of one stream: process its remaining frames (other slots
        idle through the same batched step) and return the text emitted."""
        st = self._st[slot]
        if st._ended:
            return ""
        st._ended = True
        wf = self.chunk + self.right
        total = st._total_frames() if st._n_samples > 0 else 0
        pieces = []
        while st._frames_done < total:
            left = total - st._frames_done
            got = self._run([(slot, min(left, wf), min(left, self.chunk))])
            pieces.append(got.get(slot, ""))
        if self.beam:
            # end of stream: the slot's best hypothesis is final — emit
            # its remainder past the agreed prefix emitted so far
            prefixes, lens, tot, live = self._beam_rows(slot)
            if live.any():
                best = int(np.where(live, tot, -np.inf).argmax())
                rest = "".join(
                    self.alphabet.piece(int(i))
                    for i in prefixes[best, st._beam_emitted:lens[best]])
                st._beam_emitted = int(lens[best])
                if rest:
                    st._text.append(rest)
                    pieces.append(rest)
        return "".join(pieces)

    def text(self, slot: int) -> str:
        """Everything slot has emitted so far."""
        return self._st[slot].text
