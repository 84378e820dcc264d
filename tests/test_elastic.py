"""Elastic recovery (utils/elastic.py): an UNGRACEFUL death mid-training
(fault injection = os._exit, like an OOM kill — no handler, no flush) must
be detected by the supervisor, which relaunches the command; the relaunch
resumes from model_last and the run completes. Complements
tests/test_preempt.py (the graceful-SIGTERM half of the story)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 48 train utts / batch 4 = 12 steps/epoch; fault at global step 7 —
# one-shot per model dir (.fault_injected marker), because the relaunch
# resumes from a checkpoint BEFORE step 7 and replays through it;
# save_every_steps=2 so a mid-epoch model_last predates the crash
_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.train import train

corpus, model_dir, fault = sys.argv[1], sys.argv[2], int(sys.argv[3])
cfg = Config(
    features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                           win_length=128, hop_length=64),
    model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                      hidden_size=16, num_layers=1, dropout=0.0),
    train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=1e-3,
                      warmup_steps=0, log_every=100, prefetch_depth=0,
                      loader_threads=0, save_every_steps=2),
)
out = train(corpus, model_dir, config=cfg,
            fault_step=fault if fault > 0 else None)
print(f"DRIVER_STEPS={out['steps']}", flush=True)
"""


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.heavy
def test_crash_is_detected_and_relaunch_completes(tmp_path):
    from pg_asr_tpu.data.dataset import make_synthetic_corpus
    from pg_asr_tpu.utils.elastic import FAULT_EXIT, run_elastic

    corpus = str(tmp_path / "corpus")
    make_synthetic_corpus(corpus, n_utts=50, seed=41, min_dur=0.2,
                          max_dur=0.4)
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(_DRIVER)

    model = str(tmp_path / "m")
    cmd = [sys.executable, driver, corpus, model, "7"]

    # the bare child really dies ungracefully with the fault exit code
    rc = subprocess.run(cmd, env=_env(), capture_output=True).returncode
    assert rc == FAULT_EXIT
    assert os.path.exists(os.path.join(model, "model_last.ckpt"))  # mid-save hit

    # the supervisor detects the crash, relaunches once, and the resumed
    # run completes both epochs (never re-firing the fault)
    restarts = []
    rc = run_elastic(cmd, max_restarts=2, backoff_s=0.0, env=_env(),
                     on_restart=lambda n, code: restarts.append(code))
    assert rc == 0
    assert restarts == []  # this call's FIRST child already resumed past 7

    # fresh dir: one supervised call takes the crash AND the recovery
    model2 = str(tmp_path / "m2")
    restarts = []
    rc = run_elastic([sys.executable, driver, corpus, model2, "7"],
                     max_restarts=2, backoff_s=0.0, env=_env(),
                     on_restart=lambda n, code: restarts.append(code))
    assert rc == 0
    assert restarts == [FAULT_EXIT]  # exactly one crash, one relaunch
    losses = np.load(os.path.join(model2, "train_loss.npy"))
    assert len(losses) == 2  # both epochs' curves landed
    assert os.path.exists(os.path.join(model2, "model_best.ckpt"))


def test_restart_budget_exhausts(tmp_path):
    from pg_asr_tpu.utils.elastic import run_elastic

    crash = str(tmp_path / "crash.py")
    with open(crash, "w") as f:
        f.write("import sys; sys.exit(9)\n")
    seen = []
    rc = run_elastic([sys.executable, crash], max_restarts=2, backoff_s=0.0,
                     env=_env(), on_restart=lambda n, code: seen.append(n))
    assert rc == 9
    assert seen == [1, 2]


def test_clean_exit_never_restarts(tmp_path):
    from pg_asr_tpu.utils.elastic import run_elastic

    ok = str(tmp_path / "ok.py")
    with open(ok, "w") as f:
        f.write("print('fine')\n")
    seen = []
    rc = run_elastic([sys.executable, ok], max_restarts=5, backoff_s=0.0,
                     env=_env(), on_restart=lambda n, code: seen.append(n))
    assert rc == 0
    assert seen == []
