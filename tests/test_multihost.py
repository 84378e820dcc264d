"""Multi-host (jax.distributed) integration: TWO coordinated CPU processes
drive the real train() driver end-to-end and must reproduce the
single-process loss curve exactly; a misconfigured cluster must FAIL, not
silently fall back to single-process training (parallel/mesh.py
init_distributed).

Each subprocess gets ONE local CPU device (xla_force_host_platform_device
_count=1), so the 2-process run forms a genuine 2-device global mesh over
the gloo cross-process collectives backend — the same
make_array_from_process_local_data / psum path a TPU pod takes over DCN.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver: force the CPU platform (the image pins an experimental TPU
# plugin that would otherwise grab the backend), initialize the process
# group from the PGASR_* env contract (same as cli.main), then run the real
# train() driver on a tiny config. Model hyperparameters mirror
# test_pg_finetune.tiny_config; argparse adds nothing to the multihost
# surface under test.
_DRIVER = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from pg_asr_tpu.parallel.mesh import init_distributed

if os.environ.get("PGASR_DISTRIBUTED") == "1":
    init_distributed(
        coordinator_address=os.environ.get("PGASR_COORDINATOR"),
        num_processes=(int(os.environ["PGASR_NUM_PROCESSES"])
                       if "PGASR_NUM_PROCESSES" in os.environ else None),
        process_id=(int(os.environ["PGASR_PROCESS_ID"])
                    if "PGASR_PROCESS_ID" in os.environ else None))

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.train import train

corpus, model_dir = sys.argv[1], sys.argv[2]
cfg = Config(
    features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                           win_length=128, hop_length=64),
    model=ModelConfig(vocab_size=8, input_dim=16, input_proj_dim=32,
                      hidden_size=16, num_layers=1, dropout=0.0),
    train=TrainConfig(num_epochs=2, batch_size=8, learning_rate=1e-3,
                      warmup_steps=0, log_every=1000),
)
train(corpus, model_dir, config=cfg, resume=False)
print("DRIVER_OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(one_device=True):
    env = dict(os.environ)
    # one LOCAL device per process; drop the 8-virtual-device conftest flag
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                        if one_device else "")
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    for k in ("PGASR_DISTRIBUTED", "PGASR_COORDINATOR",
              "PGASR_NUM_PROCESSES", "PGASR_PROCESS_ID"):
        env.pop(k, None)
    return env


def _write_driver(tmp_path) -> str:
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(_DRIVER)
    return driver


def _make_corpus(tmp_path) -> str:
    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    # equal-length utterances -> ONE length bucket -> exactly one batch of
    # 8 per epoch (10 utts = 8 train + 1 dev + 1 test), so the global batch
    # composition is identical whether 8 rows come from one process or
    # 2 x 4 interleaved shard rows — the loss curves must then be equal
    make_synthetic_corpus(corpus, n_utts=10, seed=5, min_dur=0.25,
                          max_dur=0.25)
    return corpus


def test_two_process_train_matches_single_process(tmp_path):
    driver = _write_driver(tmp_path)
    corpus = _make_corpus(tmp_path)

    # --- single-process run -------------------------------------------------
    single_dir = str(tmp_path / "model_single")
    r = subprocess.run([sys.executable, driver, corpus, single_dir],
                       env=_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DRIVER_OK" in r.stdout

    # --- 2-process coordinated run -------------------------------------------
    multi_dir = str(tmp_path / "model_multi")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = _env()
        env.update(PGASR_DISTRIBUTED="1",
                   PGASR_COORDINATOR=f"127.0.0.1:{port}",
                   PGASR_NUM_PROCESSES="2", PGASR_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, driver, corpus, multi_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert all("DRIVER_OK" in out for out in outs)
    # the group actually formed (no silent single-process fallback)
    assert any("process 0/2" in out for out in outs), outs[0]

    # --- the loss curves must match -----------------------------------------
    loss_single = np.load(os.path.join(single_dir, "train_loss.npy"))
    loss_multi = np.load(os.path.join(multi_dir, "train_loss.npy"))
    assert loss_single.shape == loss_multi.shape == (2,)
    np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-4)


def test_misconfigured_cluster_fails_loudly(tmp_path):
    """An explicitly configured cluster whose initialize fails must raise,
    not print-and-continue into single-process training."""
    probe = str(tmp_path / "probe.py")
    with open(probe, "w") as f:
        f.write(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from pg_asr_tpu.parallel.mesh import init_distributed\n"
            # coordinator given but process_id missing: initialize raises
            # immediately (no network wait) and the wrapper must re-raise
            "init_distributed(coordinator_address='127.0.0.1:1',\n"
            "                 num_processes=2, process_id=None)\n")
    r = subprocess.run([sys.executable, probe], env=_env(),
                       capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "jax.distributed.initialize failed" in (r.stdout + r.stderr)
