"""Bug-fixed reference trainer (PyTorch, CPU) for the BASELINE.md
accuracy head-to-head.

The reference as committed cannot run (SURVEY.md §3.6: NameErrors, a
decoder that returns None, a stale best-checkpoint snapshot, a falsy
ignore_index). This is a fresh implementation of the reference's INTENDED
training/eval semantics so the "equal WER" leg of the north star can be
measured against something real:

  * encoder  — reference model.py:34-56: instance norm over features ->
    Linear(F->512) -> LeakyReLU -> Dropout(0.3) -> 3x BiLSTM(256/dir,
    packed sequences).
  * decoder  — the dead-but-complete v1 block (reference model.py:123-173):
    Embedding(A,128) -> LSTM(128->512) teacher-forced, softmax dot
    attention over encoder states, Linear(2*512->A), log_softmax.
    Fixed: shift-right teacher forcing (BOS = pad 0) instead of feeding
    the target at its own position.
  * loss     — reference loss.py:5-17 with the `if self.ignore_index:`
    falsy-zero bug fixed: summed per-step NLL ignoring pad index 0.
  * training — reference model.py:186-274 with the commented-out optimizer
    restored (Adam lr 5e-4, model.py:207), per-epoch validation, best
    checkpoint by val loss taken AFTER training (fixing §3.6g).
  * eval     — reference model.py:314-326 semantics: per-step posteriors
    from the decoder (free-running, since test targets must not leak),
    CTC prefix beam (width 5, blank 0) + adjacent-repeat collapse, then
    CER/WER. Uses the framework's host decoder (decoding/host_beam.py),
    which is bit-parity-tested against the reference's CTCdecoder.py.

Features come from the framework's MFCC+delta+delta-delta parity frontend
(ops/features.py, 120-dim — the reference's torchaudio pipeline,
data.py:44-79; torchaudio is not installed here) and are precomputed once
per utterance — generous to torch, whose reference re-extracted features
every epoch.

This file is measurement tooling, not part of the framework; run
benchmarks/head_to_head.py for the full comparison table.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_all_features(corpus: str, split: str, feature_cfg=None):
    """Utterance list -> (list[np.ndarray (T,F)], list[str texts]) via the
    framework's (jax, CPU) parity frontend."""
    import jax.numpy as jnp

    from pg_asr_tpu.config import FeatureConfig
    from pg_asr_tpu.data.dataset import load_manifest
    from pg_asr_tpu.ops.features import extract_features

    fcfg = feature_cfg or FeatureConfig(kind="mfcc")
    utts = load_manifest(os.path.join(corpus, split),
                         os.path.join(corpus, "clips"))
    feats, texts = [], []
    from pg_asr_tpu.data.audio import load_audio

    for u in utts:
        wave, sr = load_audio(u.audio_path)
        f, mask, lens = extract_features(
            jnp.asarray(wave, jnp.float32)[None, :],
            jnp.asarray([len(wave)], jnp.int32), fcfg)
        feats.append(np.asarray(f[0, : int(lens[0])]))
        texts.append(u.text)
    return feats, texts


def build_model(vocab: int, feat_dim: int = 120):
    import torch

    class FixedReferenceModel(torch.nn.Module):
        """Encoder + intended v1 decoder (see module docstring)."""

        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Linear(feat_dim, 512)
            self.drop = torch.nn.Dropout(0.3)
            self.enc_lstm = torch.nn.LSTM(512, 256, num_layers=3,
                                          batch_first=True,
                                          bidirectional=True, dropout=0.3)
            self.embed = torch.nn.Embedding(vocab, 128)
            self.dec_lstm = torch.nn.LSTM(128, 512, batch_first=True)
            self.out = torch.nn.Linear(512 + 512, vocab)

        def encode(self, feats, feat_lens):
            # per-utterance instance norm over time, per channel
            # (reference InstanceNorm2d(120), model.py:48 — unmasked, as
            # the reference ran it on padded batches)
            x = torch.nn.functional.instance_norm(feats.transpose(1, 2))
            x = x.transpose(1, 2)
            x = self.drop(torch.nn.functional.leaky_relu(self.proj(x)))
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                x, feat_lens, batch_first=True, enforce_sorted=False)
            out, _ = self.enc_lstm(packed)
            enc, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=feats.shape[1])
            return enc  # (B, Te, 512)

        def attend(self, dec_h, enc, enc_mask):
            # softmax dot attention (reference dead v1, model.py:127-140)
            scores = torch.einsum("bdh,beh->bde", dec_h, enc)
            scores = scores.masked_fill(~enc_mask[:, None, :], -1e30)
            attn = torch.softmax(scores, dim=-1)
            return torch.einsum("bde,beh->bdh", attn, enc)

        def forward(self, feats, feat_lens, targets):
            """Teacher-forced: (B,T,F), (B,), (B,U) -> (B,U,A) log-probs."""
            enc = self.encode(feats, feat_lens)
            enc_mask = (torch.arange(enc.shape[1])[None, :]
                        < feat_lens[:, None])
            bos = torch.zeros_like(targets[:, :1])
            dec_in = torch.cat([bos, targets[:, :-1]], dim=1)
            dec_h, _ = self.dec_lstm(self.embed(dec_in))
            ctx = self.attend(dec_h, enc, enc_mask)
            logits = self.out(torch.cat([dec_h, ctx], dim=-1))
            return torch.log_softmax(logits, dim=-1)

        @torch.no_grad()
        def generate(self, feats, feat_lens, max_steps: int):
            """Free-running greedy: returns (B, max_steps, A) log-probs
            (the posteriors the reference's predict fed to its CTC beam)."""
            enc = self.encode(feats, feat_lens)
            enc_mask = (torch.arange(enc.shape[1])[None, :]
                        < feat_lens[:, None])
            B = feats.shape[0]
            tok = torch.zeros((B, 1), dtype=torch.long)
            state = None
            outs = []
            for _ in range(max_steps):
                dec_h, state = self.dec_lstm(self.embed(tok), state)
                ctx = self.attend(dec_h, enc, enc_mask)
                lp = torch.log_softmax(
                    self.out(torch.cat([dec_h, ctx], dim=-1)), dim=-1)
                outs.append(lp[:, 0])
                tok = lp.argmax(dim=-1)
            return torch.stack(outs, dim=1)

    return FixedReferenceModel()


def summed_nll(log_probs, targets) -> "torch.Tensor":
    """reference loss.py:5-17 with the falsy ignore_index=0 bug fixed:
    sum over decoder steps of NLLLoss(ignore_index=0)."""
    import torch

    U = targets.shape[1]
    total = 0.0
    for t in range(U):
        total = total + torch.nn.functional.nll_loss(
            log_probs[:, t], targets[:, t], ignore_index=0)
    return total


def summed_nll_eos(log_probs, targets) -> "torch.Tensor":
    """EOS-fix variant: additionally supervise the FIRST pad slot of each
    row (teaching pad 0 as end-of-sequence — the fix pg_asr_tpu's seq2seq
    loss applies), so free-running decode can stop instead of babbling to
    max length."""
    import torch

    B, U = targets.shape
    lens = (targets != 0).sum(dim=1)  # first pad position per row
    pos = torch.arange(U)[None, :]
    w = ((targets != 0) | (pos == lens[:, None])).float()
    lp = torch.gather(log_probs, 2, targets[:, :, None]).squeeze(2)
    # per-step masked mean, summed over steps (parallel to summed_nll)
    step_n = w.sum(dim=0).clamp(min=1.0)
    return -((lp * w).sum(dim=0) / step_n).sum()


def _batches(feats, texts, char2ind, batch_size, rng=None,
             extra_pad: int = 0):
    order = np.arange(len(feats))
    if rng is not None:
        rng.shuffle(order)
    import torch

    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        fs = [feats[j] for j in idx]
        ys = [[char2ind[c] for c in texts[j]] for j in idx]
        T = max(f.shape[0] for f in fs)
        U = max(len(y) for y in ys) + extra_pad
        fb = torch.zeros((len(idx), T, fs[0].shape[1]))
        yb = torch.zeros((len(idx), U), dtype=torch.long)
        fl = torch.zeros((len(idx),), dtype=torch.long)
        for k, (f, y) in enumerate(zip(fs, ys)):
            fb[k, : f.shape[0]] = torch.from_numpy(f)
            yb[k, : len(y)] = torch.tensor(y)
            fl[k] = f.shape[0]
        yield fb, fl, yb


def train_and_eval(corpus: str, epochs: int = 40, batch_size: int = 8,
                   seed: int = 0, beam_size: int = 5,
                   max_decode_steps: int = 64,
                   eos_fix: bool = False) -> dict:
    """Full train + reference-semantics eval. Returns a metrics dict.

    eos_fix=True trains the first pad slot as EOS (summed_nll_eos) and
    evaluates by cutting the free-running hypothesis at the first 0 —
    the minimal extra fix that lets the intended architecture stop
    generating; isolates architecture quality from the missing-EOS flaw."""
    import torch

    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.decoding.host_beam import (HostCTCBeamDecoder,
                                               collapse_repeats)
    from pg_asr_tpu.metrics import evaluate_corpus

    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 1)  # honest multi-thread CPU
    alphabet = Alphabet.load(os.path.join(corpus, "alphabet.txt"))
    char2ind = {s: i for i, s in enumerate(alphabet.symbols)}

    t_feat0 = time.time()
    tr_f, tr_t = extract_all_features(corpus, "train.tsv")
    dv_f, dv_t = extract_all_features(corpus, "dev.tsv")
    te_f, te_t = extract_all_features(corpus, "test.tsv")
    feat_s = time.time() - t_feat0

    model = build_model(alphabet.size, tr_f[0].shape[1])
    optim = torch.optim.Adam(model.parameters(), lr=5e-4)  # model.py:207
    rng = np.random.default_rng(seed)

    loss_fn = summed_nll_eos if eos_fix else summed_nll
    pad = 1 if eos_fix else 0
    best_val, best_state = float("inf"), None
    t0 = time.time()
    n_train = 0
    for epoch in range(1, epochs + 1):
        model.train()
        ep_loss, nb = 0.0, 0
        for fb, fl, yb in _batches(tr_f, tr_t, char2ind, batch_size, rng,
                                   extra_pad=pad):
            optim.zero_grad()
            lp = model(fb, fl, yb)
            loss = loss_fn(lp, yb)
            loss.backward()
            optim.step()
            ep_loss += float(loss)
            nb += 1
            n_train += fb.shape[0]
        model.eval()
        with torch.no_grad():
            val, nv = 0.0, 0
            for fb, fl, yb in _batches(dv_f, dv_t, char2ind, batch_size,
                                       extra_pad=pad):
                val += float(loss_fn(model(fb, fl, yb), yb))
                nv += 1
        val /= max(nv, 1)
        if val < best_val:  # fixed §3.6g: snapshot AFTER the epoch
            best_val = val
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
    train_s = time.time() - t0

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()

    # reference predict semantics: free-run posteriors -> CTC prefix beam
    # (width 5) -> repeat collapse (model.py:324-326)
    dec = HostCTCBeamDecoder()
    targets, hyps = [], []
    t_dec0 = time.time()
    for fb, fl, yb in _batches(te_f, te_t, char2ind, batch_size):
        lps = model.generate(fb, fl, max_decode_steps)
        if eos_fix:
            toks = lps.argmax(dim=-1).numpy()  # free-run greedy, cut at EOS
            for row in toks:
                out = []
                for j in row:
                    if j == 0:
                        break
                    out.append(alphabet.symbols[int(j)])
                hyps.append("".join(out))
            continue
        probs = torch.exp(lps).numpy()
        for i in range(fb.shape[0]):
            prefix, _ = dec.decode(probs[i], beam_size=beam_size, blank=0)
            text = "".join(alphabet.symbols[j] for j in prefix)
            hyps.append(collapse_repeats(text))
    targets = list(te_t)
    decode_s = time.time() - t_dec0
    stats = evaluate_corpus(targets, hyps)
    return {
        "cer": stats["cer"], "wer": stats["wer"],
        "num_test_utts": stats["num_utts"],
        "epochs": epochs, "batch_size": batch_size,
        "train_wall_s": train_s,
        "train_utts_per_sec": n_train / train_s,
        "feature_precompute_s": feat_s,
        "decode_wall_s": decode_s,
        "best_val_loss": best_val,
        "eos_fix": eos_fix,
        "threads": __import__("torch").get_num_threads(),
    }


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()
    print(json.dumps(train_and_eval(args.corpus, args.epochs,
                                    args.batch_size)))
