"""SpecAugment: mask structure, mean fill, padding preservation, config
gating through compute_loss and the CLI flag."""

import jax
import jax.numpy as jnp
import numpy as np

from pg_asr_tpu.config import Config, SpecAugmentConfig
from pg_asr_tpu.ops.augment import spec_augment


def _feats(B=3, T=30, F=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, F)) + 2.0, jnp.float32)
    lens = jnp.asarray([T, 18, 7][:B], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
    return feats * mask[:, :, None], mask, lens


def test_masks_applied_and_mean_filled():
    feats, mask, lens = _feats()
    cfg = SpecAugmentConfig(enabled=True, time_masks=2, time_width=8,
                            freq_masks=1, freq_width=4)
    out = jax.jit(lambda f, m, k: spec_augment(f, m, k, cfg))(
        feats, mask, jax.random.PRNGKey(0))
    f_np, o_np, m_np = map(np.asarray, (feats, out, mask))
    assert o_np.shape == f_np.shape
    changed = (o_np != f_np) & (m_np[:, :, None] > 0)
    assert changed.any(), "no cells masked"
    # masked cells hold the utterance's valid-frame mean
    for b in range(3):
        mm = m_np[b][:, None]
        mean = (f_np[b] * mm).sum() / (mm.sum() * f_np.shape[-1])
        vals = o_np[b][changed[b]]
        np.testing.assert_allclose(vals, mean, rtol=1e-5, atol=1e-5)
    # padding stays exactly zero
    assert np.all(o_np[m_np == 0] == 0.0)


def test_time_masks_inside_valid_span():
    feats, mask, lens = _feats()
    cfg = SpecAugmentConfig(enabled=True, time_masks=3, time_width=10,
                            freq_masks=0)
    for seed in range(5):
        out = spec_augment(feats, mask, jax.random.PRNGKey(seed), cfg)
        changed = (np.asarray(out) != np.asarray(feats))
        for b, L in enumerate([30, 18, 7]):
            assert not changed[b, L:].any(), (seed, b)


def test_compute_loss_gating():
    """Disabled -> loss identical with/without the augment config;
    enabled -> differs (masks applied)."""
    from pg_asr_tpu.config import FeatureConfig, ModelConfig, TrainConfig
    from pg_asr_tpu.train import compute_loss, init_model_params

    base = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(batch_size=2, warmup_steps=0),
    )
    on = base.replace(augment=SpecAugmentConfig(enabled=True))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((2, 3200)) * 0.1, jnp.float32)
    ns = jnp.full((2,), 3200, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 8, (2, 4)), jnp.int32)
    ll = jnp.full((2,), 4, jnp.int32)
    params = init_model_params(jax.random.PRNGKey(0), base)
    key = jax.random.PRNGKey(7)

    l_off = float(compute_loss(params, wave, ns, labels, ll, base,
                               train=True, dropout_rng=key))
    l_off2 = float(compute_loss(params, wave, ns, labels, ll, base,
                                train=True, dropout_rng=key))
    l_on = float(compute_loss(params, wave, ns, labels, ll, on,
                              train=True, dropout_rng=key))
    assert l_off == l_off2
    assert l_on != l_off
    assert np.isfinite(l_on)


def test_cli_flag_threads_config():
    from pg_asr_tpu.cli import build_parser, _config

    args = build_parser().parse_args(
        ["--mode", "train", "--corpus_path", "/x", "--model_path", "/y",
         "--specaugment"])
    assert _config(args).augment.enabled
    args = build_parser().parse_args(
        ["--mode", "train", "--corpus_path", "/x", "--model_path", "/y"])
    assert not _config(args).augment.enabled
