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
# 32 MiB gives every kernel in this repo headroom while leaving 96 MiB
# for XLA's streamed buffers. Respect an explicit user setting.
#
# Delivered via LIBTPU_INIT_ARGS, NOT XLA_FLAGS: the flag exists only in
# libtpu's registry, and the CPU backend's strict parse_flags_from_env
# aborts the whole process on flags it doesn't know.
_SCOPED_VMEM_KIB = int(os.environ.get("PGASR_SCOPED_VMEM_KIB", "32768"))


def _raise_scoped_vmem_limit() -> None:
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (
            args + f" --xla_tpu_scoped_vmem_limit_kib={_SCOPED_VMEM_KIB}"
        ).strip()


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
