"""Elastic recovery: supervise a training process, relaunch it on crash.

The reference has no failure handling of any kind — a crash loses the
epoch and a restart re-trains from scratch (SURVEY §5: "failure
detection / elastic recovery / fault injection: none"; reference
model.py:219 always starts at epoch 1). This framework already survives
*graceful* preemption — SIGTERM triggers a mid-epoch `model_last` save
(utils/preempt.py) and the default `resume=True` continues bit-exactly.
This module supplies the missing half of elastic recovery: DETECTING an
ungraceful death (segfault, OOM kill, injected fault) and relaunching
the same command, which picks the run back up from `model_last`.

Drivable two ways:
  * CLI: `--mode train --max_restarts 3 ...` — cli.main re-execs itself
    as the supervised child (env PGASR_ELASTIC_CHILD marks the child so
    it does not recurse).
  * library: `run_elastic([sys.executable, driver, ...], max_restarts=3)`.

Fault injection for testing the path end-to-end: `--fault_step N`
(train.py `fault_step=`) kills the process with `os._exit(FAULT_EXIT)` at
global step N — no signal handler, no checkpoint flush, exactly like an
OOM kill. One-shot per model_path (a `.fault_injected` marker): the last
pre-crash checkpoint necessarily sits BEFORE step N, so the relaunch
replays through N and a bare step check would crash-loop forever.

Scope: single-host supervision. On a multi-host pod each host runs its
own supervisor; the per-step SIGTERM allgather in train() keeps graceful
stops agreed, and a crashed host's relaunch re-joins via
jax.distributed.initialize with the same process_id.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

# marks the supervised child so cli.main doesn't recurse into another layer
CHILD_ENV = "PGASR_ELASTIC_CHILD"
# fault injection's exit code — distinct from Python's 1 and shells' 126+
FAULT_EXIT = 17


def run_elastic(cmd: list[str], max_restarts: int = 3,
                backoff_s: float = 1.0, env: dict | None = None,
                on_restart=None) -> int:
    """Run `cmd` under crash supervision; returns the final exit code.

    * exit 0: done, return.
    * supervisor receives SIGTERM/SIGINT: forwarded to the child so its
      preemption handler saves `model_last`; the child's exit then ends
      supervision WITHOUT a restart (the platform asked us to stop).
    * any other nonzero exit: relaunch (the training drivers resume from
      `model_last` by default) up to `max_restarts` times, with linear
      backoff between attempts.

    on_restart(attempt, rc) is called before each relaunch (tests count
    restarts through it).
    """
    env = dict(env if env is not None else os.environ)
    env[CHILD_ENV] = "1"
    # the child re-execs `-m pg_asr_tpu.cli`, which needs the package
    # importable from its cwd/env; when the parent was launched as
    # `python /path/to/main.py` from outside the repo (package not
    # installed), only the PARENT got the script-dir sys.path entry —
    # propagate the package location so every relaunch can import it
    pkg_parent = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    pp = env.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        env["PYTHONPATH"] = (pkg_parent + (os.pathsep + pp if pp else ""))
    restarts = 0
    state = {"stopping": False, "child": None}

    def fwd(signum, frame):
        state["stopping"] = True
        child = state["child"]
        if child is not None and child.poll() is None:
            child.send_signal(signum)

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, fwd)
        except ValueError:  # not the main thread: supervise without fwd
            pass

    try:
        while True:
            child = subprocess.Popen(cmd, env=env)
            state["child"] = child
            rc = child.wait()
            if rc == 0 or state["stopping"]:
                return rc
            if restarts >= max_restarts:
                print(f"[elastic] child exited rc={rc}; restart budget "
                      f"({max_restarts}) exhausted", file=sys.stderr)
                return rc
            restarts += 1
            if on_restart is not None:
                on_restart(restarts, rc)
            print(f"[elastic] child exited rc={rc}; restart "
                  f"{restarts}/{max_restarts} in {backoff_s * restarts:.1f}s"
                  " (the relaunch resumes from model_last)",
                  file=sys.stderr)
            time.sleep(backoff_s * restarts)
    finally:
        for sig, handler in prev.items():
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass
