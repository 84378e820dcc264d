"""Tracing / profiling helpers (SURVEY.md §5: the reference has none).

Wraps jax.profiler for on-demand device traces plus simple wall-clock step
timing. Usage:

    with trace("/tmp/tb"):            # open in TensorBoard / xprof
        train_step(...)

    prof = StepProfiler(warmup=2)
    for batch in it:
        with prof.step(batch_size):
            train_step(...)
    print(prof.summary())
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self.utts: list[int] = []
        self._n = 0

    @contextlib.contextmanager
    def step(self, batch_size: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
            self.utts.append(batch_size)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        total = sum(self.times)
        return {
            "steps": len(self.times),
            "mean_step_ms": 1000.0 * total / len(self.times),
            "p50_step_ms": 1000.0 * sorted(self.times)[len(self.times) // 2],
            "utts_per_sec": sum(self.utts) / total,
        }


def memory_stats() -> dict:
    """Per-device live memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
        except Exception:
            out[str(d)] = None
    return out
