"""Persistent XLA compilation cache for the drivers.

Under the axon TPU tunnel a single train-step compile takes tens of
seconds SERVER-side (measured 76 s for the flagship step; a first epoch
with 3 bucket shapes spends ~8 min compiling). The persistent cache keys
on the HLO hash, so repeat invocations — and config changes that don't
alter the traced math (log_every, num_epochs, ...) — skip every compile.

Enabled by the CLI and bench.py. Opt out with PGASR_NO_COMPILE_CACHE=1;
relocate with PGASR_JAX_CACHE=<dir> (default ~/.cache/pgasr_xla).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compilation_cache() -> str | None:
    """Idempotent; returns the cache dir (None when disabled/unsupported)."""
    global _enabled
    if os.environ.get("PGASR_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = os.environ.get(
        "PGASR_JAX_CACHE", os.path.expanduser("~/.cache/pgasr_xla"))
    if _enabled:
        return cache_dir
    try:
        import jax

        # CPU-only runs skip the cache unless forced: CPU compiles are fast,
        # and reloading CPU AOT results across host-feature drift spews
        # "could lead to SIGILL" warnings (the win is the TPU tunnel's
        # minutes-long server-side compiles). Read the CONFIGURED platform
        # list — jax.default_backend() would initialize the backend, which
        # must not happen before jax.distributed.initialize in the CLI.
        env_cpu = "cpu" in (os.environ.get("JAX_PLATFORMS", "").lower(),
                            os.environ.get("JAX_PLATFORM_NAME", "").lower())
        cfg_first = (jax.config.jax_platforms or "").split(",")[0].strip()
        if ((env_cpu or cfg_first.lower() == "cpu")
                and os.environ.get("PGASR_CACHE_CPU") != "1"):
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
        return cache_dir
    except Exception:
        return None  # older jax: the cache is an optimization, not required
