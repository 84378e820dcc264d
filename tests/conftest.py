"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
tests exercise real meshes without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax initializes its backend (conftest imports first).
# NB: this image pins jax_platforms to "axon,cpu", which overrides
# JAX_PLATFORMS — JAX_PLATFORM_NAME still wins, so set both.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This JAX build defaults matmuls to bf16-class precision even on CPU; parity
# tests compare against float64 oracles, so force full f32 accumulation.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A pytest entry-point plugin may have imported jax before this conftest ran,
# in which case the env vars above were read too late — force the config
# directly (safe while the backend is uninitialized).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
except Exception:
    pass

# Persistent XLA compilation cache: the multi-device parity tests are
# compile-bound (each shard_map variant costs ~30-60 s to build on one CPU
# core), so warm re-runs pull the executables from disk instead. Keyed on
# program + flags, so code changes recompile exactly what they touch.
_CACHE_DIR = os.environ.get(
    "PG_ASR_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    # threshold 0: cache EVERY compile — a one-core box pays hundreds of
    # sub-0.5 s compiles per cold run, and they add up to minutes that a
    # warm run should not repeat (r5 tier re-budget, VERDICT r4 #8)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r2: keep the suite drivable on one CPU core).
#   pytest -m quick        -> the fast core-correctness tier
#   pytest -m 'not heavy'  -> everything except the compile-bound
#                             multi-device / end-to-end-driver modules
# Measured budgets on this one-core box (r5, after the _HEAVY_TESTS
# re-tier below): not-heavy WARM (persistent .jax_cache populated)
# 301 tests in 7 m 29 s; not-heavy COLD (fresh cache dir) ~30 m —
# compile-bound, paid once per checkout; heavy tier 76 tests in ~52 m
# (green log: docs/ci/heavy_r05.txt).
# ---------------------------------------------------------------------------
_QUICK_MODULES = {
    "test_metrics.py", "test_edit_distance.py", "test_text.py",
    "test_greedy.py", "test_host_beam.py", "test_ctc_loss.py",
    "test_features.py", "test_lstm.py", "test_rank_topk.py",
    "test_wer_onchip.py", "test_bpe.py", "test_augment.py",
    "test_native_io.py", "test_dataset.py", "test_checkpoint.py",
}
_HEAVY_MODULES = {
    "test_parallel.py", "test_pipeline.py", "test_sequence_parallel.py",
    "test_mesh_driver.py", "test_moe.py", "test_pg_families.py",
    "test_seq2seq_driver.py", "test_train_options.py", "test_multihost.py",
    "test_preempt.py", "test_selftrain.py",
}
# Individual compile-bound tests inside otherwise-fast modules (r5 tier
# re-budget, VERDICT r4 #8: a cold `-m 'not heavy'` run had crept past 30
# minutes on this one-core box). Criteria for this list: >25 s WARM (so
# multi-minute cold), and either (a) a shard_map/multi-device build — the
# heavy tier's existing definition — or (b) an end-to-end driver run whose
# operator coverage is duplicated by a faster sibling in the same module.
# Correctness/parity tests stay in the default tier regardless of cost.
_HEAVY_TESTS = {
    ("test_transducer.py", "test_hybrid_shard_map_matches_single_device"),
    ("test_mwer.py", "test_mwer_shard_parity"),
    ("test_transformer.py", "test_transformer_train_predict_pg"),
    ("test_conformer.py", "test_conformer_train_predict_pg"),
    ("test_torch_import.py", "test_cli_train_warm_start"),
    ("test_bpe.py", "test_cli_bpe_end_to_end"),
    ("test_bpe.py", "test_train_resume_keeps_checkpoint_units"),
    ("test_overfit_cer.py", "test_overfit_reaches_low_train_cer"),
    ("test_train_smoke.py", "test_interrupted_training_resumes"),
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        name = os.path.basename(str(item.fspath))
        if name in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if (name in _HEAVY_MODULES
                or (name, item.name.split("[")[0]) in _HEAVY_TESTS):
            item.add_marker(pytest.mark.heavy)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def import_reference(module_name: str):
    """Import a module from the read-only reference checkout to use as a
    golden oracle in parity tests (sanctioned by SURVEY.md §4)."""
    import importlib.util

    path = os.path.join(REFERENCE_DIR, f"{module_name}.py")
    spec = importlib.util.spec_from_file_location(f"reference_{module_name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
