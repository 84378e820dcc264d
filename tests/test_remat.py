"""--remat (jax.checkpoint over encoder blocks): loss and gradients must be
IDENTICAL to the non-remat forward/backward — remat changes memory, not
math."""

import jax
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, ConformerConfig, FeatureConfig,
                               ModelConfig, TrainConfig, TransformerConfig)
from pg_asr_tpu.train import compute_loss, init_model_params


def _cfg(family: str, remat: bool) -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family=family, vocab_size=8, input_dim=16,
                          dropout=0.0, remat=remat),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        conformer=ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                                  ffn_dim=64, conv_kernel=7, dropout=0.0,
                                  subsample=2),
        train=TrainConfig(batch_size=4, warmup_steps=0),
    )


@pytest.mark.parametrize("family", ["transformer", "conformer"])
def test_remat_matches_exactly(family):
    base = _cfg(family, remat=False)
    rmt = _cfg(family, remat=True)
    params = init_model_params(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    B, n = 4, 1600
    wave = (rng.standard_normal((B, n)) * 0.1).astype(np.float32)
    ns = np.full((B,), n, np.int32)
    labels = rng.integers(1, 8, (B, 5)).astype(np.int32)
    lens = np.full((B,), 5, np.int32)

    def lg(cfg):
        return jax.value_and_grad(lambda p: compute_loss(
            p, wave, ns, labels, lens, cfg, train=True))(params)

    l0, g0 = lg(base)
    l1, g1 = lg(rmt)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-7)
