"""Feature frontend tests: jitted on-device pipeline vs a naive scipy/numpy
reference built independently in this file (SURVEY.md §4: frontend vs a
scipy STFT->mel reference)."""

import numpy as np
import pytest
import scipy.fft

from pg_asr_tpu.config import FeatureConfig
from pg_asr_tpu.ops import features as F


def naive_logmel(wave, cfg: FeatureConfig):
    """Loop-based STFT -> log-mel, written naively for cross-checking."""
    pad = cfg.n_fft // 2
    x = np.pad(wave, (pad, pad), mode="reflect")
    win = F.hann_window(cfg.win_length)
    if cfg.win_length < cfg.n_fft:
        lp = (cfg.n_fft - cfg.win_length) // 2
        win = np.pad(win, (lp, cfg.n_fft - cfg.win_length - lp))
    n_frames = len(wave) // cfg.hop_length + 1
    out = []
    for f in range(n_frames):
        seg = x[f * cfg.hop_length : f * cfg.hop_length + cfg.n_fft] * win
        spec = scipy.fft.rfft(seg, n=cfg.n_fft)
        out.append(np.abs(spec) ** 2)
    power = np.stack(out)
    fb = F.mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate,
                          cfg.fmin, cfg.fmax, cfg.mel_scale)
    return np.log(np.maximum(power @ fb, cfg.log_floor))


def test_logmel_matches_naive():
    cfg = FeatureConfig(kind="logmel", n_mels=24, n_fft=128, win_length=128, hop_length=64)
    rng = np.random.default_rng(0)
    n = 1000
    wave = rng.standard_normal(n).astype(np.float32) * 0.1
    batch = np.stack([wave, np.concatenate([wave[:500], np.zeros(500, np.float32)])])
    lens = np.array([n, 500])
    feats, mask, flens = F.extract_features(batch, lens, cfg)
    feats = np.asarray(feats)

    ref_full = naive_logmel(wave, cfg)
    assert feats.shape[0] == 2 and feats.shape[2] == 24
    np.testing.assert_allclose(feats[0], ref_full, rtol=1e-3, atol=2e-2)

    # second utterance: interior valid frames match the naive frontend on its
    # true span (the final frames see zero-padding in the batch but reflect
    # padding standalone — an inherent edge effect, so exclude them)
    ref_short = naive_logmel(wave[:500], cfg)
    n_valid = int(flens[1])
    assert n_valid == 500 // cfg.hop_length + 1
    interior = n_valid - (cfg.n_fft // 2) // cfg.hop_length - 1
    np.testing.assert_allclose(feats[1][:interior], ref_short[:interior], rtol=1e-3, atol=2e-2)
    # padded frames are zeroed
    assert np.all(feats[1][n_valid:] == 0.0)
    assert np.all(np.asarray(mask[1])[n_valid:] == 0.0)


def test_dct_matrix_vs_scipy():
    import scipy.fftpack

    n_mels, n_mfcc = 16, 8
    x = np.random.default_rng(1).standard_normal(n_mels)
    ours = x @ F.dct_matrix(n_mfcc, n_mels)
    ref = scipy.fftpack.dct(x, type=2, norm="ortho")[:n_mfcc]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_mel_filterbank_shape_and_coverage():
    fb = F.mel_filterbank(40, 400, 16000)
    assert fb.shape == (201, 40)
    assert np.all(fb >= 0)
    # every filter has some mass; interior frequencies covered
    assert np.all(fb.sum(axis=0) > 0)


def test_mfcc_mode_dims_and_mask():
    cfg = FeatureConfig(kind="mfcc", n_fft=128, win_length=128, hop_length=64,
                        n_mfcc=13, add_deltas=True)
    rng = np.random.default_rng(2)
    batch = rng.standard_normal((2, 640)).astype(np.float32)
    lens = np.array([640, 320])
    feats, mask, flens = F.extract_features(batch, lens, cfg)
    assert feats.shape[-1] == 39  # n_mfcc * 3
    assert int(flens[0]) == 640 // 64 + 1
    assert cfg.feature_dim == 39


def test_deltas_constant_signal_zero():
    import jax.numpy as jnp

    x = jnp.ones((1, 10, 4))
    d = F._deltas(x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_deltas_linear_ramp():
    import jax.numpy as jnp

    # d/dt of a unit-slope ramp is 1 in the interior
    t = jnp.arange(12, dtype=jnp.float32)
    x = t[None, :, None] * jnp.ones((1, 12, 3))
    d = np.asarray(F._deltas(x, n=2))
    np.testing.assert_allclose(d[0, 3:-3], 1.0, atol=1e-5)
