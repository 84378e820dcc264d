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

# XLA-TPU caps "scoped" (stack) VMEM — the window fusions and custom
# kernels may allocate at one schedule point — at 16 MiB by default,
# far under the v5e's 128 MiB physical VMEM. The Pallas LSTM backward's
# double-buffered working set at (B=64, chunk=8, H=256) is ~16.8 MiB once
# the scheduler overlaps it with a neighboring kernel, which killed the
# 10k-utterance stress run's compile (benchmarks/stress_scale.py) with
# "Ran out of memory in memory space vmem while allocating on stack".
#
# BUT the bigger budget is NOT free: it changes XLA-TPU's fusion and
# scheduling choices on models that never needed it. Raising it globally
# in r4 regressed the d=256 transformer train step 8.09 -> 9.73 ms/step
# (+20%, benchmarks/vmem_ab.py — the whole BENCH_r03->r04 "transformer
# regression"). So the bump is now requested per-process by the callers
# that own Pallas-LSTM backward paths (cli.py gates on model family)
# instead of being applied to every process that enables the cache.
#
# Delivered via LIBTPU_INIT_ARGS, NOT XLA_FLAGS: the flag exists only in
# libtpu's registry, and the CPU backend's strict parse_flags_from_env
# aborts the whole process on flags it doesn't know. An explicit
# PGASR_SCOPED_VMEM_KIB always wins (0 = leave libtpu's default).
_ENV_SCOPED_VMEM_KIB = os.environ.get("PGASR_SCOPED_VMEM_KIB")


def _set_scoped_vmem(kib: int) -> None:
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args and kib > 0:
        os.environ["LIBTPU_INIT_ARGS"] = (
            args + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()


def request_scoped_vmem(kib: int = 32768) -> None:
    """Ask libtpu for a larger scoped-VMEM stack budget. Must run before
    the TPU backend initializes (libtpu reads LIBTPU_INIT_ARGS once).
    A user's PGASR_SCOPED_VMEM_KIB (applied at import) takes precedence."""
    if _ENV_SCOPED_VMEM_KIB is None:
        _set_scoped_vmem(kib)


def _raise_scoped_vmem_limit() -> None:
    if _ENV_SCOPED_VMEM_KIB is not None:
        _set_scoped_vmem(int(_ENV_SCOPED_VMEM_KIB))


def enable_persistent_compilation_cache() -> str | None:
    """Idempotent; returns the cache dir (None when disabled/unsupported)."""
    global _enabled
    _raise_scoped_vmem_limit()
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
