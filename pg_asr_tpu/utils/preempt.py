"""Preemption-safe training: SIGTERM (the standard cloud-preemption signal)
requests a final mid-epoch checkpoint instead of killing the step mid-flight.

The reference loses the whole epoch on any interruption (no resume path,
reference model.py:219). Here the train loop polls the event once per step;
on preemption it writes model_last with the exact batch position and
returns, and the default `resume=True` picks the run back up at the NEXT
batch of the same shuffled order, bit-exactly (the machinery
tests/test_train_options.py::test_mid_epoch_checkpoint_resume_is_exact
proves).
"""

from __future__ import annotations

import os
import signal
import threading


def install_preemption_handler():
    """Install a SIGTERM handler that sets an event instead of terminating.

    Returns (event, restore):
      event: threading.Event set when SIGTERM arrives (poll it per step);
      restore(): reinstate the previous handler — call on every exit path.

    A SECOND SIGTERM after the first terminates immediately (restores the
    previous/default disposition and re-raises), so a stuck save can't make
    the process unkillable. No-op (event never set, restore does nothing)
    when not on the main thread — Python only allows signal handlers there.
    """
    event = threading.Event()
    if threading.current_thread() is not threading.main_thread():
        return event, lambda: None

    prev = signal.getsignal(signal.SIGTERM)

    def on_sigterm(signum, frame):
        if event.is_set():  # second SIGTERM: give up and terminate
            signal.signal(signal.SIGTERM, prev or signal.SIG_DFL)
            os.kill(os.getpid(), signal.SIGTERM)
            return
        event.set()

    try:
        signal.signal(signal.SIGTERM, on_sigterm)
    except ValueError:  # non-main interpreter thread raced us
        return event, lambda: None

    def restore():
        try:
            if signal.getsignal(signal.SIGTERM) is on_sigterm:
                signal.signal(signal.SIGTERM, prev)
        except ValueError:
            pass

    return event, restore
