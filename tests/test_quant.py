"""Weight-only int8 quantization (ops/quant.py) + quantized export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pg_asr_tpu.ops.quant import (dequantize_tree, is_quantized_leaf,
                                  quantize_array, quantize_tree, tree_bytes)


def test_quantize_error_bound():
    """Per-channel symmetric int8: |w - deq(q(w))| <= scale/2 elementwise."""
    rng = np.random.default_rng(0)
    # uneven per-channel magnitudes — the case per-tensor scaling botches
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w *= np.geomspace(0.01, 10.0, 32)[None, :]
    leaf = quantize_array(jnp.asarray(w))
    deq = np.asarray(dequantize_tree(leaf))
    scale = np.asarray(leaf["s"])  # (1, 32)
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-7)
    # relative matmul error stays small on real magnitudes
    x = rng.standard_normal((8, 64)).astype(np.float32)
    err = np.linalg.norm(x @ deq - x @ w) / np.linalg.norm(x @ w)
    assert err < 0.01


def test_quantize_tree_selectivity():
    """2D+ float leaves >= min_size quantize; biases/norms/ints stay."""
    params = {
        "w": jnp.ones((64, 64), jnp.float32),
        "b": jnp.ones((64,), jnp.float32),
        "tiny": jnp.ones((2, 2), jnp.float32),
        "ids": jnp.ones((64, 64), jnp.int32),
        "nested": [{"u": jnp.ones((64, 64), jnp.bfloat16)}],
    }
    q = quantize_tree(params, min_size=1024)
    assert is_quantized_leaf(q["w"])
    assert not is_quantized_leaf(q["b"]) and q["b"].dtype == jnp.float32
    assert not is_quantized_leaf(q["tiny"])
    assert q["ids"].dtype == jnp.int32
    assert is_quantized_leaf(q["nested"][0]["u"])
    d = dequantize_tree(q)
    assert d["w"].dtype == jnp.float32
    assert d["nested"][0]["u"].dtype == jnp.bfloat16
    assert tree_bytes(q) < tree_bytes(params)  # int 'ids' unquantized in both
    w_bytes = q["w"]["q8"].size + q["w"]["s"].size * 4
    assert w_bytes < tree_bytes({"w": params["w"]}) / 3.5  # ~4x on f32


def test_quantized_export_roundtrip(tmp_path):
    """int8 export: artifact ≡ live quantized fn bitwise, artifact is
    smaller than the f32 one, and the quantized decode stays close to the
    float decode (identical greedy ids on a real trained-scale model is
    not guaranteed for random weights, so compare against the QUANTIZED
    live fn for exactness and only check the float artifact size)."""
    from tests.test_export import _make_model_dir, _waves
    from pg_asr_tpu.exporting import (EXPORT_DIR, ExportedModel,
                                      export_model, make_serving_fn)

    corpus, model_dir, cfg, params, alphabet = _make_model_dir(tmp_path, "ctc")
    m_f32 = export_model(model_dir, corpus_path=corpus, batch_size=2,
                         max_seconds=0.5)
    size_f32 = m_f32["bytes"]
    m_q = export_model(model_dir, corpus_path=corpus, batch_size=2,
                       max_seconds=0.5, quantize="int8")
    assert m_q["quantize"] == "int8"
    # at toy scale the StableHLO text overhead dominates, so only strict
    # shrinkage is asserted here; the ~4x weight reduction is covered by
    # test_quantize_tree_selectivity and the real-scale export (docs/PERF.md)
    assert m_q["bytes"] < size_f32

    exported = ExportedModel(os.path.join(model_dir, EXPORT_DIR))
    wave, ns = _waves(2, dur=0.4)
    ids, lens = exported(wave, ns)

    live = make_serving_fn(params, cfg, quantize="int8")
    buf = np.zeros((2, m_q["max_samples"]), np.float32)
    buf[:, :wave.shape[1]] = wave
    want_ids, want_lens = live(buf, ns)
    np.testing.assert_array_equal(ids, np.asarray(want_ids))
    np.testing.assert_array_equal(lens, np.asarray(want_lens))


def test_quantized_forward_close_to_float():
    """Log-probs of a quantized bilstm forward stay close to float."""
    from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig
    from pg_asr_tpu.models import bilstm_ctc

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=16),
        model=ModelConfig(family="ctc", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=2,
                          dropout=0.0),
    )
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    deq = dequantize_tree(quantize_tree(params, min_size=16))
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 20, 16)), jnp.float32)
    mask = jnp.ones((2, 20), jnp.float32)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    lp_q = bilstm_ctc.apply(deq, feats, mask, cfg.model, train=False)
    assert np.max(np.abs(np.asarray(lp) - np.asarray(lp_q))) < 0.05


def test_unknown_quantize_mode_rejected():
    from pg_asr_tpu.config import Config
    from pg_asr_tpu.exporting import make_serving_fn

    with pytest.raises(ValueError, match="unknown quantize"):
        make_serving_fn({}, Config(), quantize="int4")
