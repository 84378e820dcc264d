"""Checkpointing: best/last with params + optimizer state + step/epoch.

The reference saves model weights only, with a save-before-train bug and no
resume (reference model.py:270-274, SURVEY.md §3.6g). Here checkpoints are a
single msgpack file holding {params, opt_state, step, epoch, best_val_loss}
written atomically; `model_best.*`/`model_last.*` naming parity is kept.
"""

from __future__ import annotations

import json
import os
import queue
import tempfile
import threading
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

BEST_NAME = "model_best.ckpt"
LAST_NAME = "model_last.ckpt"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, state: dict) -> None:
    """Atomic write of a pytree state dict to `path`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_host(state))
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fo:
            fo.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, template: dict) -> dict:
    """Load into the structure of `template` (same pytree shape as saved)."""
    with open(path, "rb") as fo:
        data = fo.read()
    return serialization.from_bytes(template, data)


def average_checkpoints(paths: list[str], template: dict) -> dict:
    """Uniform average of `template`-shaped float leaves across checkpoints
    — the classic ASR eval smoother (the average of the last k epochs sits
    in a flatter region than any single one). Non-float leaves keep the
    LAST checkpoint's value. Accumulates in float64, casts back."""
    if not paths:
        raise ValueError("average_checkpoints needs at least one path")
    acc = None
    last = None
    for p in paths:
        state = load_checkpoint(p, template)
        leaves = jax.tree_util.tree_leaves(state)
        arrs = [np.asarray(x) for x in leaves]
        if acc is None:
            acc = [a.astype(np.float64)
                   if np.issubdtype(a.dtype, np.floating) else a
                   for a in arrs]
        else:
            for i, a in enumerate(arrs):
                if np.issubdtype(a.dtype, np.floating):
                    acc[i] = acc[i] + a
                else:
                    acc[i] = a
        last = arrs
    n = float(len(paths))
    out = [(acc[i] / n).astype(last[i].dtype)
           if np.issubdtype(last[i].dtype, np.floating) else acc[i]
           for i in range(len(acc))]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointManager:
    """Best/last checkpoint policy on validation loss (reference semantics:
    best updated when val improves, last every epoch — minus the reference's
    stale-snapshot bug)."""

    def __init__(self, model_dir: str, cleanup_tmp: bool = True):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        # crash debris: an ungraceful death (OOM kill, --fault_step) can
        # leave a half-written mkstemp file behind; the atomic-rename
        # discipline means any STALE *.tmp here is garbage. Only the
        # WRITING manager (train entry, process 0 — callers pass
        # cleanup_tmp=False for read-only/eval and non-zero hosts) may
        # clean, and only files old enough that they cannot be another
        # live writer's in-flight mkstemp (a predict job against a live
        # training dir, or an elastically relaunched sibling host, must
        # not unlink host 0's background save mid-write).
        if cleanup_tmp:
            now = time.time()
            for name in os.listdir(model_dir):
                if name.startswith("tmp") and name.endswith(".tmp"):
                    path = os.path.join(model_dir, name)
                    try:
                        if now - os.path.getmtime(path) > 300.0:
                            os.unlink(path)
                    except OSError:
                        pass
        self.best_val = float("inf")
        self._q: queue.Queue | None = None
        self._worker: threading.Thread | None = None
        self._err: Exception | None = None

    @property
    def best_path(self) -> str:
        return os.path.join(self.model_dir, BEST_NAME)

    @property
    def last_path(self) -> str:
        return os.path.join(self.model_dir, LAST_NAME)

    def save_config(self, config_json: str) -> None:
        with open(os.path.join(self.model_dir, "config.json"), "w") as fo:
            fo.write(config_json)

    def save(self, state: dict, val_loss: float | None = None,
             background: bool = False) -> bool:
        """Save `last`; promote to `best` if val improved. Returns is_best.

        background=True (mid-epoch preemption-safety saves) snapshots the
        device arrays with a cheap on-device copy and hands the D2H
        transfer + serialization + atomic write to a single worker thread,
        so save_every_steps=1 doesn't tax step time. The on-device copy is
        what makes this safe against the train step DONATING the original
        buffers on the very next call. Saves are written in submission
        order; flush() joins the queue (and synchronous saves flush first,
        so best/last ordering is preserved)."""
        is_best = val_loss is not None and val_loss < self.best_val
        if is_best:
            self.best_val = float(val_loss)
            state = dict(state, best_val_loss=self.best_val)
        if not background:
            self.flush()  # keep on-disk ordering with pending async saves
            save_checkpoint(self.last_path, state)
            if is_best:
                save_checkpoint(self.best_path, state)
            return is_best

        def snap(x):
            if isinstance(x, jax.Array):
                return jnp.array(x, copy=True)
            return x

        snapshot = jax.tree_util.tree_map(snap, state)
        self._ensure_worker()
        self._q.put((snapshot, is_best))
        return is_best

    def _ensure_worker(self) -> None:
        if self._worker is not None:
            return
        self._q = queue.Queue()

        def loop():
            while True:
                job = self._q.get()
                if job is None:
                    self._q.task_done()
                    return
                snapshot, is_best = job
                try:
                    save_checkpoint(self.last_path, snapshot)
                    if is_best:
                        save_checkpoint(self.best_path, snapshot)
                except Exception as e:  # surfaced by flush()
                    self._err = e
                finally:
                    self._q.task_done()

        self._worker = threading.Thread(target=loop, daemon=True,
                                        name="ckpt-writer")
        self._worker.start()

    def flush(self) -> None:
        """Wait for all queued background saves; re-raise any write error."""
        if self._q is not None:
            self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def save_rolling(self, state: dict, epoch: int, keep: int) -> str:
        """Write a per-epoch snapshot (model_epochNNNN.ckpt) and prune to
        the newest `keep` — the retention side of checkpoint averaging."""
        import glob

        self.flush()  # ordering vs pending background saves
        path = os.path.join(self.model_dir, f"model_epoch{epoch:04d}.ckpt")
        save_checkpoint(path, state)
        snaps = sorted(glob.glob(
            os.path.join(self.model_dir, "model_epoch*.ckpt")))
        for p in snaps[:-keep]:
            os.unlink(p)
        return path

    def epoch_snapshots(self) -> list[str]:
        import glob

        return sorted(glob.glob(
            os.path.join(self.model_dir, "model_epoch*.ckpt")))

    def try_restore(self, template: dict, prefer: str = "last") -> dict | None:
        path = self.last_path if prefer == "last" else self.best_path
        if not os.path.exists(path):
            path = self.best_path if prefer == "last" else self.last_path
        if not os.path.exists(path):
            return None
        state = load_checkpoint(path, template)
        self.best_val = float(state.get("best_val_loss", float("inf")))
        return state
