"""Structured step logging + throughput counters.

The reference logs via bare prints and .npy dumps (reference
model.py:236,242). Here: stdout lines plus an append-only JSONL metrics file
(<model_dir>/metrics.jsonl) that observability tooling can tail.
"""

from __future__ import annotations

import json
import os
import time


class StepLogger:
    def __init__(self, model_dir: str | None = None, echo: bool = True):
        self.echo = echo
        self.path = None
        if model_dir:
            os.makedirs(model_dir, exist_ok=True)
            self.path = os.path.join(model_dir, "metrics.jsonl")

    def log(self, **fields) -> None:
        fields.setdefault("ts", time.time())
        if self.path:
            with open(self.path, "a") as fo:
                fo.write(json.dumps(fields) + "\n")
        if self.echo:
            msg = " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items() if k != "ts"
            )
            print(f"[step] {msg}", flush=True)


class Timer:
    """Wall-clock timer with utterances/sec accounting (the BASELINE metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.utts = 0

    def add(self, n: int):
        self.utts += n

    @property
    def elapsed(self) -> float:
        return time.time() - self.t0

    @property
    def utts_per_sec(self) -> float:
        return self.utts / max(self.elapsed, 1e-9)
