"""Flash-attention config (ops/flash_attn.py): CPU-side contracts.

The Pallas TPU kernel itself can only execute on a real chip (its A/B and
numerics parity vs the dense path are measured on hardware —
benchmarks/attn_breakdown.py and docs/PERF.md). What MUST hold everywhere,
and what these tests pin down, is the wrapper contract:

  * flash_attention=True off-TPU falls back to the dense einsum path and
    still runs (CPU tests, 8-virtual-device dryruns);
  * the config pads T' up to the kernel's 128-frame block, and that pad is
    semantics-free: log-probs on valid frames and out_lens are identical
    to the unpadded dense run (the same batch-padding invariance the dense
    path guarantees, models/transformer_ctc.py frontend docstring);
  * gradients agree between the two configs on valid content.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (ConformerConfig, FeatureConfig, ModelConfig,
                               TransformerConfig)
from pg_asr_tpu.models import conformer_ctc, transformer_ctc
from pg_asr_tpu.ops import flash_attn
from pg_asr_tpu.ops.features import extract_features

pytestmark = pytest.mark.quick

FAMS = [("transformer", transformer_ctc, TransformerConfig),
        ("conformer", conformer_ctc, ConformerConfig)]


def _workload():
    rng = np.random.default_rng(3)
    B, n = 2, 24000
    wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
    ns = jnp.asarray([n, n // 2], jnp.int32)
    fc = FeatureConfig(kind="logmel", n_mels=80)
    return extract_features(wave, ns, fc)


@pytest.mark.parametrize("fam,mod,cfgcls", FAMS, ids=[f[0] for f in FAMS])
def test_flash_config_pads_but_preserves_semantics(fam, mod, cfgcls):
    feats, fmask, flens = _workload()
    mcfg = ModelConfig(family=fam, vocab_size=16, input_dim=80,
                       dtype="float32")
    dense = cfgcls(num_layers=2, d_model=64, num_heads=2, ffn_dim=128,
                   dropout=0.0)
    flash = cfgcls(num_layers=2, d_model=64, num_heads=2, ffn_dim=128,
                   dropout=0.0, flash_attention=True)
    params = mod.init_params(jax.random.PRNGKey(0), mcfg, dense)

    lp0, m0, l0 = mod.apply(params, feats, fmask, flens, mcfg, dense)
    lp1, m1, l1 = mod.apply(params, feats, fmask, flens, mcfg, flash)

    assert lp1.shape[1] % flash_attn.pad_multiple() == 0
    assert lp1.shape[1] >= lp0.shape[1]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    T0 = lp0.shape[1]
    np.testing.assert_allclose(np.asarray(lp1)[:, :T0], np.asarray(lp0),
                               atol=2e-5, rtol=0)
    # padded region is masked to zero like any padding
    assert not np.asarray(m1)[:, T0:].any()


@pytest.mark.parametrize("fam,mod,cfgcls", FAMS, ids=[f[0] for f in FAMS])
def test_flash_config_grad_parity(fam, mod, cfgcls):
    feats, fmask, flens = _workload()
    mcfg = ModelConfig(family=fam, vocab_size=16, input_dim=80,
                       dtype="float32")
    cfgs = [cfgcls(num_layers=2, d_model=64, num_heads=2, ffn_dim=128,
                   dropout=0.0, flash_attention=f) for f in (False, True)]
    params = mod.init_params(jax.random.PRNGKey(1), mcfg, cfgs[0])

    def loss(p, cfg):
        lp, m, _ = mod.apply(p, feats, fmask, flens, mcfg, cfg)
        return jnp.sum(lp * m[..., None])

    g0, g1 = (jax.grad(loss)(params, c) for c in cfgs)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_available_gates_on_alignment_and_backend():
    # off-TPU (tests force CPU) the kernel is never available
    assert not flash_attn.available(256) or jax.default_backend() == "tpu"
    # misaligned T is never available anywhere
    assert not flash_attn.available(250)
