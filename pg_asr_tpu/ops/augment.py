"""On-device SpecAugment (train-time feature masking).

Beyond-reference capability (the reference has no augmentation): the
standard time/frequency masking of Park et al. 2019, computed ON DEVICE
with static shapes — masks are built from iota comparisons against sampled
(start, width) scalars, so there is no data-dependent shape anywhere and
the whole thing fuses into the feature frontend under jit.

Masked regions are filled with each utterance's valid-frame mean (not 0):
the acoustic models normalize per utterance AFTER augmentation, and a mean
fill keeps the masked cells at ~0 post-normalization without biasing the
statistics the way a raw zero fill would.

Off by default (`Config.augment.enabled`); enable via `--specaugment`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SpecAugmentConfig


def spec_augment(feats: jnp.ndarray, frame_mask: jnp.ndarray, rng,
                 cfg: SpecAugmentConfig) -> jnp.ndarray:
    """Apply SpecAugment. feats (B, T, F), frame_mask (B, T) {0,1}.

    Per utterance: `time_masks` spans of width U[0, time_width] over the
    VALID frames and `freq_masks` bands of width U[0, freq_width] over the
    channels, all filled with the utterance's valid-frame mean.
    """
    B, T, F = feats.shape
    if cfg.time_masks + cfg.freq_masks == 0:
        # waveform-only augmentation configs keep the feature masks off
        return feats
    m = frame_mask.astype(feats.dtype)[:, :, None]
    count = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * F, 1.0)
    fill = jnp.sum(feats * m, axis=(1, 2), keepdims=True) / count  # (B,1,1)
    valid = jnp.sum(frame_mask.astype(jnp.int32), axis=1)  # (B,) frames

    it = jnp.arange(T)[None, :]
    i_f = jnp.arange(F)[None, :]
    drop = jnp.zeros((B, T), bool)
    dropf = jnp.zeros((B, F), bool)

    keys = jax.random.split(rng, 2 * (cfg.time_masks + cfg.freq_masks))
    ki = 0
    for _ in range(cfg.time_masks):
        w = jax.random.randint(keys[ki], (B,), 0, cfg.time_width + 1)
        lo = jax.random.randint(keys[ki + 1], (B,), 0, jnp.iinfo(jnp.int32).max)
        lo = lo % jnp.maximum(valid - w + 1, 1)  # start within valid span
        ki += 2
        drop = drop | ((it >= lo[:, None]) & (it < (lo + w)[:, None]))
    for _ in range(cfg.freq_masks):
        w = jax.random.randint(keys[ki], (B,), 0, cfg.freq_width + 1)
        lo = jax.random.randint(keys[ki + 1], (B,), 0, jnp.iinfo(jnp.int32).max)
        lo = lo % jnp.maximum(F - w + 1, 1)
        ki += 2
        dropf = dropf | ((i_f >= lo[:, None]) & (i_f < (lo + w)[:, None]))

    dropped = drop[:, :, None] | dropf[:, None, :]
    out = jnp.where(dropped, fill.astype(feats.dtype), feats)
    return out * m  # padding stays zero


def wave_augment(wave: jnp.ndarray, num_samples: jnp.ndarray, rng,
                 cfg: SpecAugmentConfig):
    """Waveform-level train-time augmentation, on device, static shapes.

    Applied BEFORE the feature frontend (train.compute_loss). Three
    independent, per-utterance-randomized transforms:

      * speed perturbation (Kaldi-style, `speed_min/speed_max`): resample
        by factor f ~ U[min, max] via linear interpolation at positions
        i*f — a single take_along_axis gather into the SAME (B, N) buffer
        (no dynamic shapes; content that stretches past the buffer end at
        f < 1 is truncated). Transcripts are unchanged; `num_samples`
        rescales to floor((ns - 1) / f) + 1.
      * additive noise (`noise_std`): white noise scaled by each
        utterance's valid-region RMS, so the SNR is level-independent.
      * random gain (`gain_db`): per-utterance scale of U[-g, +g] dB.

    Returns (wave float32 (B, N), num_samples int32). int16 PCM input is
    converted with the frontend's exact x/32768 scaling first.
    """
    wave = jnp.asarray(wave)
    if jnp.issubdtype(wave.dtype, jnp.integer):
        wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
    wave = wave.astype(jnp.float32)
    B, N = wave.shape
    ns = num_samples.astype(jnp.int32)
    k_f, k_n, k_g = jax.random.split(rng, 3)

    if cfg.speed_max > cfg.speed_min or cfg.speed_min != 1.0:
        f = jax.random.uniform(k_f, (B, 1), jnp.float32,
                               cfg.speed_min, cfg.speed_max)
        pos = jnp.arange(N, dtype=jnp.float32)[None, :] * f  # (B, N)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
        hi = jnp.minimum(lo + 1, N - 1)
        frac = pos - lo.astype(jnp.float32)
        w_lo = jnp.take_along_axis(wave, lo, axis=1)
        w_hi = jnp.take_along_axis(wave, hi, axis=1)
        wave = w_lo * (1.0 - frac) + w_hi * frac
        ns = jnp.minimum(
            (jnp.floor((ns[:, None].astype(jnp.float32) - 1.0) / f)
             ).astype(jnp.int32)[:, 0] + 1, N)
        ns = jnp.maximum(ns, 0)

    valid = (jnp.arange(N)[None, :] < ns[:, None]).astype(jnp.float32)
    if cfg.noise_std > 0.0:
        rms = jnp.sqrt(jnp.sum(jnp.square(wave) * valid, axis=1,
                               keepdims=True)
                       / jnp.maximum(jnp.sum(valid, axis=1, keepdims=True),
                                     1.0))
        noise = jax.random.normal(k_n, wave.shape, jnp.float32)
        wave = wave + cfg.noise_std * rms * noise * valid

    if cfg.gain_db > 0.0:
        g = jax.random.uniform(k_g, (B, 1), jnp.float32,
                               -cfg.gain_db, cfg.gain_db)
        wave = wave * jnp.power(10.0, g / 20.0)

    return wave * valid, ns
