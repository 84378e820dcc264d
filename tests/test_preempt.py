"""Preemption safety: a real SIGTERM mid-training must flush a mid-epoch
model_last and exit cleanly, and the default resume must reproduce the
uninterrupted run bit-exactly (utils/preempt.py + train.py)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# same tiny config as the in-process runs below; log_every=1 so the parent
# can see step lines on stdout and time the SIGTERM mid-run
_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.train import train

corpus, model_dir = sys.argv[1], sys.argv[2]
cfg = Config(
    features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                           win_length=128, hop_length=64),
    model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                      hidden_size=16, num_layers=1, dropout=0.0),
    train=TrainConfig(num_epochs=10, batch_size=4, learning_rate=1e-3,
                      warmup_steps=0, log_every=1, prefetch_depth=0,
                      loader_threads=0),
)
out = train(corpus, model_dir, config=cfg, resume=False)
# a preempted run returns EARLY with a clean summary; report how far it got
print(f"DRIVER_STEPS={out['steps']}", flush=True)
"""


def _tiny_cfg(num_epochs):
    from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                                   TrainConfig)

    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                          hidden_size=16, num_layers=1, dropout=0.0),
        train=TrainConfig(num_epochs=num_epochs, batch_size=4,
                          learning_rate=1e-3, warmup_steps=0, log_every=1,
                          prefetch_depth=0, loader_threads=0),
    )


def test_sigterm_saves_and_resume_is_bit_exact(tmp_path):
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.train import train

    corpus = str(tmp_path / "corpus")
    # 48 train utts / batch 4 = 12 steps/epoch x 10 epochs: plenty of
    # runway for the SIGTERM to land mid-run after the 3rd observed step
    make_synthetic_corpus(corpus, n_utts=50, seed=40, min_dur=0.2,
                          max_dur=0.4)

    # --- uninterrupted reference (10 epochs, in process) ---------------------
    model_a = str(tmp_path / "a")
    out_a = train(corpus, model_a, config=_tiny_cfg(10), resume=False)

    # --- subprocess run killed mid-training ----------------------------------
    model_b = str(tmp_path / "b")
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(_DRIVER)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.Popen([sys.executable, "-u", driver, corpus, model_b],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    # wait for a few real steps, then preempt
    steps_seen = 0
    deadline = time.time() + 300
    for line in p.stdout:
        if line.startswith("[step]"):
            steps_seen += 1
            if steps_seen >= 3:
                break
        if "DRIVER_STEPS" in line or time.time() > deadline:
            break
    assert steps_seen >= 3, "driver never reached 3 steps"
    p.send_signal(signal.SIGTERM)
    rest = p.stdout.read()
    p.wait(timeout=120)
    assert p.returncode == 0, rest
    assert "SIGTERM: saved model_last" in rest
    # actually interrupted mid-run: the clean early return reports fewer
    # than the full run's 10 epochs x 10 steps (38 train utts / batch 4)
    done = int(rest.split("DRIVER_STEPS=")[1].split()[0])
    assert done < 100, rest
    assert os.path.exists(os.path.join(model_b, "model_last.ckpt"))

    # --- resume (in process) must land exactly on the reference run ----------
    import jax

    out_b = train(corpus, model_b, config=_tiny_cfg(10))  # resume=True
    np.testing.assert_allclose(out_a["val_losses"][-1],
                               out_b["val_losses"][-1], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_a["params"]),
                    jax.tree_util.tree_leaves(out_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_second_sigterm_terminates(tmp_path):
    """A second SIGTERM while the first is being honored must terminate
    (no unkillable process)."""
    script = str(tmp_path / "probe.py")
    with open(script, "w") as f:
        f.write(
            "import os, signal, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "from pg_asr_tpu.utils.preempt import install_preemption_handler\n"
            "event, restore = install_preemption_handler()\n"
            "os.kill(os.getpid(), signal.SIGTERM)\n"
            "assert event.is_set()\n"
            "print('FIRST_OK', flush=True)\n"
            "os.kill(os.getpid(), signal.SIGTERM)\n"
            "time.sleep(30)\n"
            "print('NOT_KILLED', flush=True)\n" % ROOT)
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=60)
    assert "FIRST_OK" in r.stdout
    assert "NOT_KILLED" not in r.stdout
    assert r.returncode != 0  # killed by the re-raised SIGTERM


def test_handler_restore():
    """restore() reinstates the previous disposition."""
    from pg_asr_tpu.utils.preempt import install_preemption_handler

    prev = signal.getsignal(signal.SIGTERM)
    event, restore = install_preemption_handler()
    assert signal.getsignal(signal.SIGTERM) is not prev
    restore()
    assert signal.getsignal(signal.SIGTERM) is prev
    assert not event.is_set()
