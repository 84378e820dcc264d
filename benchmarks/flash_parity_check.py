import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
from pg_asr_tpu.config import ModelConfig, FeatureConfig, TransformerConfig, ConformerConfig
from pg_asr_tpu.models import transformer_ctc, conformer_ctc
from pg_asr_tpu.ops.features import extract_features
print("backend", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
B, n = 4, 16000*4
wave = jnp.asarray(rng.standard_normal((B, n)) * 0.1, jnp.float32)
ns = jnp.asarray(rng.integers(n//2, n, (B,)), jnp.int32)

for fam, mod, cfgcls in [("transformer", transformer_ctc, TransformerConfig),
                         ("conformer", conformer_ctc, ConformerConfig)]:
    mcfg = ModelConfig(family=fam, vocab_size=32, input_dim=80, dtype="bfloat16")
    c0 = cfgcls(num_layers=2, d_model=256, num_heads=4, ffn_dim=512, dropout=0.0)
    c1 = cfgcls(num_layers=2, d_model=256, num_heads=4, ffn_dim=512, dropout=0.0, flash_attention=True)
    fc = FeatureConfig(kind="logmel", n_mels=80)
    feats, fmask, flens = extract_features(wave, ns, fc)
    params = mod.init_params(jax.random.PRNGKey(0), mcfg, c0)
    lp0, m0, l0 = mod.apply(params, feats, fmask, flens, mcfg, c0)
    lp1, m1, l1 = mod.apply(params, feats, fmask, flens, mcfg, c1)
    T0 = lp0.shape[1]
    v = np.asarray(m0, bool)
    d = np.max(np.abs((np.asarray(lp1)[:, :T0] - np.asarray(lp0)) * v[..., None]))
    print(fam, lp0.shape, lp1.shape, "valid maxdiff", d, flush=True)
    def loss(p, cfg):
        lp, m, l = mod.apply(p, feats, fmask, flens, mcfg, cfg)
        return jnp.sum(lp.astype(jnp.float32) * m[..., None])
    g0 = jax.grad(loss)(params, c0); g1 = jax.grad(loss)(params, c1)
    gd = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))) for a,b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)))
    gm = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))) for a in jax.tree_util.tree_leaves(g0))
    print(fam, "grad maxdiff", gd, "grad maxabs", gm, flush=True)
print("OK", flush=True)
