"""Fused on-device audio feature frontend (XLA).

The reference featurizes on the host, per file, per epoch, with no caching
(reference data.py:44-79: torchaudio.load -> MFCC -> ComputeDeltas x2 ->
concat to 120 dims -> pad). Here the entire frontend is a single jitted
function over a padded waveform batch: framing (gather) -> Hann window ->
rFFT power spectrum -> mel filterbank matmul (MXU) -> log / DCT -> optional
delta + delta-delta (as small conv matmuls). Raw int16-scale audio is the
only H2D transfer; everything else stays on chip and fuses under XLA.

Two modes (FeatureConfig.kind):
  * "logmel": STFT -> log-mel (the north-star LibriSpeech pipeline)
  * "mfcc":   40 MFCC + delta + delta-delta = 120 dims (reference feature
              parity, reference data.py:57-61)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig


# ---------------------------------------------------------------------------
# Static (trace-time, numpy) construction of DSP constants
# ---------------------------------------------------------------------------

def hz_to_mel(f, scale: str = "htk"):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m, scale: str = "htk"):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: float | None = None,
                   scale: str = "htk", norm: str | None = None) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft//2 + 1, n_mels)."""
    fmax = fmax or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(fmin, scale), hz_to_mel(fmax, scale), n_mels + 2)
    f_pts = mel_to_hz(m_pts, scale)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, shape (n_mels, n_mfcc)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) * np.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return dct.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def delta_kernel(n: int = 2) -> np.ndarray:
    """Regression delta coefficients over window 2n+1 (ComputeDeltas parity:
    win_length=5 <-> n=2)."""
    k = np.arange(-n, n + 1, dtype=np.float32)
    return k / np.sum(k * k)


def dft_conv_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT bases as a 1-D conv kernel, shape (2K, 1, n_fft)
    with K = n_fft//2 + 1: rows 0..K-1 are cos bases, K..2K-1 sin bases,
    each pre-multiplied by the (padded) Hann window.

    The STFT then becomes ONE strided convolution — an MXU matmul per frame
    — instead of frame-gather + rFFT: the gather serializes on TPU and XLA's
    FFT for non-power-of-two lengths (e.g. the standard n_fft=400) is slow,
    while the conv formulation measured ~4 ms -> sub-ms at the bench shape.
    """
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    K = n_fft // 2 + 1
    k = np.arange(K, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    cos_b = np.cos(ang) * window[None, :]
    sin_b = -np.sin(ang) * window[None, :]
    return np.concatenate([cos_b, sin_b], axis=0).astype(np.float32)[:, None, :]


# ---------------------------------------------------------------------------
# On-device frontend
# ---------------------------------------------------------------------------

def num_frames(num_samples, hop_length: int):
    """Frames produced for a waveform of given sample count (center=True)."""
    return num_samples // hop_length + 1


def _frame(wave: jnp.ndarray, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """(B, N) -> (B, F, n_fft) centered frames with reflect padding."""
    pad = n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    n = wave.shape[1]
    F = n // hop + 1
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n_fft)[None, :]  # (F, n_fft)
    return x[:, idx]


def _deltas(x: jnp.ndarray, n: int = 2) -> jnp.ndarray:
    """Delta features along time with edge replication. x: (B, T, C)."""
    k = jnp.asarray(delta_kernel(n))  # (2n+1,)
    xp = jnp.concatenate([jnp.repeat(x[:, :1], n, axis=1), x,
                          jnp.repeat(x[:, -1:], n, axis=1)], axis=1)
    # sum_j k[j] * x[t + j - n]  — small unrolled shifted-add (fuses on VPU)
    out = jnp.zeros_like(x)
    T = x.shape[1]
    for j in range(2 * n + 1):
        out = out + k[j] * jax.lax.dynamic_slice_in_dim(xp, j, T, axis=1)
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def _frontend(wave: jnp.ndarray, num_samples: jnp.ndarray, cfg: FeatureConfig):
    B, N = wave.shape
    # STFT as ONE strided conv against windowed DFT bases (see
    # dft_conv_kernel): centered frames via reflect padding, then an MXU
    # matmul per frame position. f32 accumulation for DSP-oracle parity.
    pad = cfg.n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")[:, None, :]
    kern = jnp.asarray(dft_conv_kernel(cfg.n_fft, cfg.win_length))
    spec = jax.lax.conv_general_dilated(
        x, kern, window_strides=(cfg.hop_length,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (B, 2K, F)
    K = cfg.n_fft // 2 + 1
    power = jnp.swapaxes(spec[:, :K, :] ** 2 + spec[:, K:, :] ** 2, 1, 2)
    # power: (B, F, n_fft//2+1)

    n_mels = 128 if cfg.kind == "mfcc" else cfg.n_mels
    fb = jnp.asarray(mel_filterbank(n_mels, cfg.n_fft, cfg.sample_rate,
                                    cfg.fmin, cfg.fmax, cfg.mel_scale))
    mel = jnp.einsum("bfk,km->bfm", power, fb,
                     preferred_element_type=jnp.float32)  # MXU matmul

    if cfg.kind == "mfcc":
        # log-compress in dB then DCT-II (orthonormal), keep n_mfcc coeffs
        db = 10.0 * jnp.log10(jnp.maximum(mel, cfg.log_floor))
        dct = jnp.asarray(dct_matrix(cfg.n_mfcc, n_mels))
        feats = jnp.einsum("bfm,mc->bfc", db, dct, preferred_element_type=jnp.float32)
        if cfg.add_deltas:
            d1 = _deltas(feats, cfg.delta_window)
            d2 = _deltas(d1, cfg.delta_window)
            feats = jnp.concatenate([feats, d1, d2], axis=-1)  # (B, F, 120)
    else:
        feats = jnp.log(jnp.maximum(mel, cfg.log_floor))

    F = feats.shape[1]
    frame_lens = jnp.minimum(num_samples // cfg.hop_length + 1, F)
    mask = (jnp.arange(F)[None, :] < frame_lens[:, None]).astype(feats.dtype)
    feats = feats * mask[:, :, None]
    return feats, mask, frame_lens.astype(jnp.int32)


def extract_features(wave, num_samples, cfg: FeatureConfig):
    """Batched waveforms -> (features (B,T,C), frame_mask (B,T), frame_lens (B,)).

    `wave` is a zero-padded (B, N) float array in [-1, 1] — or int16 PCM,
    which is converted on-device with x/32768 (exactly the host decoders'
    scaling, native/pgasr_io.cpp decode / data/audio.py): shipping PCM
    halves the host->device transfer and lets the host skip the float
    conversion entirely. `num_samples` holds the true sample counts.
    Fully on-device; jit-cached per (shape, dtype, cfg).
    """
    wave = jnp.asarray(wave)
    if jnp.issubdtype(wave.dtype, jnp.integer):
        wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
    wave = wave.astype(jnp.float32)
    num_samples = jnp.asarray(num_samples, dtype=jnp.int32)
    return _frontend(wave, num_samples, cfg)
