"""Benchmark: supervised CTC training throughput (utterances/sec) on the
default device (TPU under the driver; CPU in dev), compared against a
PyTorch-CPU reference model of the same architecture — the BASELINE.md
comparison floor ("≥10x utterances/sec over the PyTorch CPU reference").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utts/sec", "vs_baseline": ratio, ...}

The torch-CPU baseline is measured once and cached in BASELINE_MEASURED.json
(committed) so repeat runs don't pay the torch cost; pass --remeasure to
refresh it. Extra fields beyond the required four are informational.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

# Benchmark workload: LibriSpeech-ish supervised CTC training step.
BATCH = 64
AUDIO_SECONDS = 5.0
SAMPLE_RATE = 16000
LABEL_LEN = 64
VOCAB = 32
WARMUP_STEPS = 3
# Chain enough steps that the fixed per-call dispatch+readback latency of the
# TPU tunnel (~30 ms, measured with an empty lax.scan chain) amortizes below
# the per-step noise: at 8 steps it inflated step_ms by ~3.5 ms (12.6 vs the
# true ~9.1 ms device time); 64 steps bring the bias under 0.5 ms while the
# ~0.6 s total run stays well below the shared chip's preemption horizon.
TIMED_STEPS = 64


def _workload(rng):
    n = int(AUDIO_SECONDS * SAMPLE_RATE)
    wave = (rng.standard_normal((BATCH, n)) * 0.1).astype(np.float32)
    ns = np.full((BATCH,), n, np.int32)
    labels = rng.integers(1, VOCAB, (BATCH, LABEL_LEN)).astype(np.int32)
    label_lens = np.full((BATCH,), LABEL_LEN, np.int32)
    return wave, ns, labels, label_lens


def bench_ours() -> dict:
    import jax

    from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
    from pg_asr_tpu.models import bilstm_ctc
    from pg_asr_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays
    from pg_asr_tpu.train import make_optimizer, make_train_step

    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=80),
        model=ModelConfig(vocab_size=VOCAB, input_dim=80, input_proj_dim=512,
                          hidden_size=256, num_layers=3, dropout=0.1,
                          dtype="bfloat16"),
        train=TrainConfig(batch_size=BATCH, warmup_steps=0),
    )
    rng_np = np.random.default_rng(0)
    wave, ns, labels, label_lens = _workload(rng_np)

    import jax.numpy as jnp
    import optax
    from pg_asr_tpu.ops.ctc import ctc_loss_mean
    from pg_asr_tpu.ops.features import extract_features

    mesh = make_mesh()
    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    arrays = shard_batch_arrays((wave, ns, labels, label_lens), mesh)

    # Time TIMED_STEPS full optimizer steps chained inside ONE executable
    # (lax.scan over the step), synced by a scalar D2H read. This measures
    # raw device throughput; per-call host/tunnel latency (tens of ms under
    # the axon tunnel, where even block_until_ready returns early) is paid
    # once instead of per step.
    def one_step(carry, _):
        params, opt_state, rng = carry
        rng, drop = jax.random.split(rng)

        def loss_fn(p):
            feats, mask, flens = extract_features(arrays[0], arrays[1],
                                                  cfg.features)
            lp = bilstm_ctc.apply(p, feats, mask, cfg.model, train=True,
                                  dropout_rng=drop)
            return ctc_loss_mean(lp, flens, arrays[2], arrays[3])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), loss

    @jax.jit
    def run_chain(params, opt_state, rng):
        (params, opt_state, rng), losses = jax.lax.scan(
            one_step, (params, opt_state, rng), None, length=TIMED_STEPS)
        return params, opt_state, losses

    from pg_asr_tpu.utils.rand import training_rng

    rng = training_rng(0)
    t_compile0 = time.time()
    params, opt_state, losses = run_chain(params, opt_state, rng)
    _ = float(losses[-1])
    compile_s = time.time() - t_compile0

    t0 = time.time()
    params, opt_state, losses = run_chain(params, opt_state, rng)
    loss_val = float(losses[-1])
    dt = time.time() - t0
    utts_per_sec = BATCH * TIMED_STEPS / dt

    # informational: eval/serving throughput (featurize + forward + greedy
    # decode) on the same model/batch; failures must not break the primary
    # training metric
    eval_ups = None
    try:
        from pg_asr_tpu.decoding.greedy import greedy_decode

        def eval_one(w):
            feats, mask, _ = extract_features(w, arrays[1], cfg.features)
            lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
            ids, lens = greedy_decode(lp, mask)
            return jnp.sum(lens).astype(jnp.float32)

        @jax.jit
        def eval_chain(w):
            def body(w, _):
                out = eval_one(w)
                return w + 1e-9 * out, out
            w, outs = jax.lax.scan(body, w, None, length=TIMED_STEPS)
            return outs[-1]

        _ = float(eval_chain(arrays[0]))  # compile
        t0 = time.time()
        _ = float(eval_chain(arrays[0]))
        eval_ups = BATCH * TIMED_STEPS / (time.time() - t0)
    except Exception:
        pass

    # informational: the non-recurrent transformer-CTC family at the same
    # workload (models/transformer_ctc.py; docs/PERF.md) — guarded so a
    # failure can't break the primary metric
    tr_ups = None
    try:
        from pg_asr_tpu.config import TransformerConfig
        from pg_asr_tpu.train import compute_loss, init_model_params

        cfg_tr = Config(
            features=FeatureConfig(kind="logmel", n_mels=80),
            model=ModelConfig(family="transformer", vocab_size=VOCAB,
                              input_dim=80, dtype="bfloat16"),
            transformer=TransformerConfig(),
            train=TrainConfig(batch_size=BATCH, warmup_steps=0),
        )
        params_tr = init_model_params(jax.random.PRNGKey(0), cfg_tr)
        opt_tr = make_optimizer(cfg_tr)
        opt_state_tr = opt_tr.init(params_tr)

        def tr_step(carry, _):
            p, o, r = carry
            r, drop = jax.random.split(r)
            loss, grads = jax.value_and_grad(
                lambda q: compute_loss(q, arrays[0], arrays[1], arrays[2],
                                       arrays[3], cfg_tr, train=True,
                                       dropout_rng=drop))(p)
            updates, o = opt_tr.update(grads, o, p)
            return (optax.apply_updates(p, updates), o, r), loss

        @jax.jit
        def tr_chain(p, o, r):
            (p, o, r), losses = jax.lax.scan(tr_step, (p, o, r), None,
                                             length=TIMED_STEPS)
            return p, o, losses

        p, o, losses = tr_chain(params_tr, opt_state_tr, rng)
        _ = float(losses[-1])
        t0 = time.time()
        p, o, losses = tr_chain(params_tr, opt_state_tr, rng)
        _ = float(losses[-1])
        tr_ups = BATCH * TIMED_STEPS / (time.time() - t0)
    except Exception:
        pass

    return {
        "utts_per_sec": utts_per_sec,
        "step_ms": 1000.0 * dt / TIMED_STEPS,
        "compile_s": compile_s,
        "loss": loss_val,
        "eval_greedy_utts_per_sec": eval_ups,
        "transformer_train_utts_per_sec": tr_ups,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def bench_torch_cpu(timed_steps: int = 2) -> dict:
    """Equivalent-architecture PyTorch model on CPU: log-mel frontend proxy
    (precomputed features — generous to torch), 3x BiLSTM(256) + CTC."""
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    T = int(AUDIO_SECONDS * SAMPLE_RATE) // 200 + 1  # hop 200 -> frames
    F = 80

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Linear(F, 512)
            self.lstm = torch.nn.LSTM(512, 256, num_layers=3, batch_first=True,
                                      bidirectional=True, dropout=0.1)
            self.head = torch.nn.Linear(512, VOCAB)

        def forward(self, x):
            x = torch.nn.functional.leaky_relu(self.proj(x))
            x, _ = self.lstm(x)
            return torch.nn.functional.log_softmax(self.head(x), dim=-1)

    model = Model()
    optim = torch.optim.AdamW(model.parameters(), lr=5e-4)
    rng = np.random.default_rng(0)
    feats = torch.tensor(rng.standard_normal((BATCH, T, F)).astype(np.float32))
    labels = torch.tensor(rng.integers(1, VOCAB, (BATCH, LABEL_LEN)).astype(np.int64))
    in_lens = torch.full((BATCH,), T, dtype=torch.long)
    lab_lens = torch.full((BATCH,), LABEL_LEN, dtype=torch.long)

    def one_step():
        optim.zero_grad()
        lp = model(feats).permute(1, 0, 2)
        loss = torch.nn.functional.ctc_loss(lp, labels, in_lens, lab_lens, blank=0)
        loss.backward()
        optim.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.time()
    for _ in range(timed_steps):
        one_step()
    dt = time.time() - t0
    return {
        "utts_per_sec": BATCH * timed_steps / dt,
        "step_ms": 1000.0 * dt / timed_steps,
        "threads": torch.get_num_threads(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--remeasure", action="store_true",
                    help="re-run the torch CPU baseline")
    args = ap.parse_args()

    baseline = None
    if not args.remeasure and os.path.exists(CACHE):
        with open(CACHE) as fo:
            baseline = json.load(fo)
    if baseline is None:
        baseline = bench_torch_cpu()
        baseline["workload"] = {
            "batch": BATCH, "audio_s": AUDIO_SECONDS, "label_len": LABEL_LEN,
            "vocab": VOCAB, "arch": "3xBiLSTM256+CTC",
        }
        with open(CACHE, "w") as fo:
            json.dump(baseline, fo, indent=2)

    ours = bench_ours()
    result = {
        "metric": "train_throughput_bilstm_ctc",
        "value": round(ours["utts_per_sec"], 3),
        "unit": "utts/sec",
        "vs_baseline": round(ours["utts_per_sec"] / baseline["utts_per_sec"], 3),
        "step_ms": round(ours["step_ms"], 2),
        "baseline_utts_per_sec": round(baseline["utts_per_sec"], 3),
        "backend": ours["backend"],
    }
    if ours.get("eval_greedy_utts_per_sec"):
        result["eval_greedy_utts_per_sec"] = round(
            ours["eval_greedy_utts_per_sec"], 1)
    if ours.get("transformer_train_utts_per_sec"):
        result["transformer_train_utts_per_sec"] = round(
            ours["transformer_train_utts_per_sec"], 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
