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
