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
