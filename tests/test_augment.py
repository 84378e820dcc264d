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


# ---- waveform-level augmentation (ops/augment.wave_augment) ----

from pg_asr_tpu.ops.augment import wave_augment


def _wave(B=3, N=1600, seed=1):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((B, N)) * 0.1).astype(np.float32)
    ns = np.asarray([N, 900, 400][:B], np.int32)
    for b in range(B):
        w[b, ns[b]:] = 0.0
    return jnp.asarray(w), jnp.asarray(ns)


def test_wave_augment_identity_when_off():
    w, ns = _wave()
    cfg = SpecAugmentConfig(enabled=True)  # all wave knobs at defaults
    out, ons = wave_augment(w, ns, jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(ons), np.asarray(ns))


def test_speed_perturb_matches_interp_oracle():
    """Fixed factor (min == max != 1): output equals np.interp resampling
    and num_samples rescales to floor((ns-1)/f)+1."""
    w, ns = _wave()
    f = 1.25
    cfg = SpecAugmentConfig(enabled=True, speed_min=f, speed_max=f)
    out, ons = wave_augment(w, ns, jax.random.PRNGKey(0), cfg)
    out, ons, w_np, ns_np = (np.asarray(out), np.asarray(ons),
                             np.asarray(w), np.asarray(ns))
    N = w_np.shape[1]
    for b in range(w_np.shape[0]):
        want_len = min(int((ns_np[b] - 1) // f) + 1, N)
        assert ons[b] == want_len
        pos = np.arange(want_len) * f
        want = np.interp(pos, np.arange(N), w_np[b])
        np.testing.assert_allclose(out[b, :want_len], want, atol=1e-5)
        np.testing.assert_array_equal(out[b, ons[b]:], 0.0)


def test_speed_perturb_slowdown_lengthens():
    w, ns = _wave()
    cfg = SpecAugmentConfig(enabled=True, speed_min=0.8, speed_max=0.8)
    _, ons = wave_augment(w, ns, jax.random.PRNGKey(0), cfg)
    ons, ns_np = np.asarray(ons), np.asarray(ns)
    N = int(w.shape[1])
    assert all(ons[b] == min(int((ns_np[b] - 1) / 0.8) + 1, N)
               for b in range(len(ons)))


def test_noise_and_gain_stats():
    w, ns = _wave(seed=2)
    cfg = SpecAugmentConfig(enabled=True, noise_std=0.5, gain_db=6.0)
    out, ons = wave_augment(w, ns, jax.random.PRNGKey(3), cfg)
    out, w_np, ns_np = np.asarray(out), np.asarray(w), np.asarray(ns)
    np.testing.assert_array_equal(np.asarray(ons), ns_np)
    for b in range(w_np.shape[0]):
        assert not np.allclose(out[b, :ns_np[b]], w_np[b, :ns_np[b]])
        np.testing.assert_array_equal(out[b, ns_np[b]:], 0.0)  # padding clean


def test_wave_augment_int16_input():
    w, ns = _wave()
    w16 = jnp.asarray(np.asarray(w * 32768.0), jnp.int16)
    cfg = SpecAugmentConfig(enabled=True, gain_db=0.0)
    out, _ = wave_augment(w16, ns, jax.random.PRNGKey(0), cfg)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(w16, np.float32) / 32768.0,
                               atol=1e-7)


def test_compute_loss_runs_with_wave_augment():
    from pg_asr_tpu.config import FeatureConfig, ModelConfig
    from pg_asr_tpu.train import compute_loss, init_model_params

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        augment=SpecAugmentConfig(enabled=True, time_masks=0, freq_masks=0,
                                  speed_min=0.9, speed_max=1.1,
                                  noise_std=0.1, gain_db=3.0),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
    )
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    wave = jnp.asarray(rng.standard_normal((2, 3200)) * 0.1, jnp.float32)
    ns = jnp.asarray([3200, 2000], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 8, (2, 5)), jnp.int32)
    ll = jnp.asarray([5, 5], jnp.int32)
    loss_aug = compute_loss(params, wave, ns, labels, ll, cfg, train=True,
                            dropout_rng=jax.random.PRNGKey(1))
    loss_plain = compute_loss(params, wave, ns, labels, ll, cfg, train=False)
    assert np.isfinite(float(loss_aug)) and np.isfinite(float(loss_plain))
    assert abs(float(loss_aug) - float(loss_plain)) > 1e-6  # actually applied


def test_cli_wave_augment_flags():
    from pg_asr_tpu import cli

    captured = {}

    def fake_train(corpus, model, config=None, **kwargs):
        captured["cfg"] = config
        return {}

    import pg_asr_tpu.train as train_mod
    real = train_mod.train
    train_mod.train = fake_train
    try:
        rc = cli.main(["--mode", "train", "--corpus_path", "/c",
                       "--model_path", "/m", "--speed_perturb", "0.9,1.1",
                       "--wave_noise", "0.2", "--wave_gain_db", "3"])
    finally:
        train_mod.train = real
    assert rc == 0
    aug = captured["cfg"].augment
    assert aug.enabled and aug.speed_min == 0.9 and aug.speed_max == 1.1
    assert aug.noise_std == 0.2 and aug.gain_db == 3.0
    assert aug.time_masks == 0 and aug.freq_masks == 0  # no --specaugment
