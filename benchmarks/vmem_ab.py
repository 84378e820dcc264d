"""A/B the r4 scoped-VMEM bump against the transformer bench regression
(VERDICT r4 weak #1: transformer_step_ms 7.99 -> 9.72 between BENCH_r03
and BENCH_r04 with no code change on the dense path).

The one global change r4 made to EVERY bench row was
`--xla_tpu_scoped_vmem_limit_kib` 16 MiB -> 32 MiB (utils/cache.py, needed
by the Pallas LSTM backward under the stress runs). A bigger scoped-VMEM
budget changes XLA-TPU's fusion/scheduling choices, which can regress
latency-sensitive small-shape models while leaving others within noise.

This harness times a family train chain (identical to bench.py's row)
in TWO fresh subprocesses — PGASR_SCOPED_VMEM_KIB=16384 and 32768 — with
repeat-min timing, and prints both. Each child compiles under its own
flag value (the compile cache keys on the flag set, so the A and B
executables are genuinely different).

r5 verdicts (v5e, RTT-raw step_ms):
  transformer  16 MiB 8.09 vs 32 MiB 9.73  -> 16 MiB (the r4 regression)
  transducer   see docs/PERF.md (run with `transducer` arg)

Run (TPU): python benchmarks/vmem_ab.py [family]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %r)
from pg_asr_tpu.utils.cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import jax, numpy as np
sys.path.insert(0, %r)
from bench import _bench_family_chain, _workload, BATCH
rng = np.random.default_rng(0)
import jax.numpy as jnp
wave, ns, labels, llens = _workload(rng)
arrays = tuple(jnp.asarray(a) for a in (wave, ns, labels, llens))
r = _bench_family_chain(%r, arrays)
print(json.dumps({"step_ms": r["step_ms"], "utts_per_sec": r["utts_per_sec"]}
                 if r else {}))
"""


def run_one(vmem_kib: int, family: str) -> dict | None:
    env = dict(os.environ, PGASR_SCOPED_VMEM_KIB=str(vmem_kib))
    env.pop("LIBTPU_INIT_ARGS", None)  # let cache.py set it fresh
    proc = subprocess.run([sys.executable, "-c",
                           CHILD % (REPO, REPO, family)],
                          capture_output=True, text=True, timeout=1800,
                          env=env)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    print(f"[vmem_ab] child vmem={vmem_kib} failed rc={proc.returncode}:\n"
          + "\n".join((proc.stdout + proc.stderr).splitlines()[-5:]),
          file=sys.stderr)
    return None


def main() -> int:
    family = sys.argv[1] if len(sys.argv) > 1 else "transformer"
    out = {"family": family}
    for kib in (16384, 32768):
        r = run_one(kib, family)
        if r:
            out[f"vmem_{kib // 1024}mib_step_ms"] = round(r["step_ms"], 3)
        print(f"scoped_vmem={kib // 1024} MiB -> "
              f"{r['step_ms']:.3f} ms/step" if r else
              f"scoped_vmem={kib // 1024} MiB -> FAILED")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
