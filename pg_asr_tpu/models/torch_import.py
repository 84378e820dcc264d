"""Import reference PyTorch checkpoints (`model_best.pth` / `model_last.pth`)
into pg_asr_tpu parameter trees — the migration path for users of the
reference repo (reference model.py:270-274 saves, model.py:288 loads).

The reference model is `Seq2Seq(encoder=Encoder(), decoder=Decoder(A, 512))`
(reference model.py:174-183) whose trainable tensors are:

  encoder.input_layer.{weight,bias}          Linear(120 -> 512)
  encoder.blstm.weight_ih_l{k}[_reverse]     (4H, in)  k = 0..2, H = 256
  encoder.blstm.weight_hh_l{k}[_reverse]     (4H, H)
  encoder.blstm.bias_ih_l{k}[_reverse]       (4H,)
  encoder.blstm.bias_hh_l{k}[_reverse]       (4H,)
  decoder.embed_layer.weight                 Embedding(A, 128)
  decoder.lstm.{weight_ih,weight_hh,bias_ih,bias_hh}_l0   LSTM(128 -> 512)

(`encoder.inst_norm` has no parameters — InstanceNorm2d defaults to
affine=False — and the reference Attention module is parameter-free,
reference model.py:37,58-60.)

Mapping to our trees is exact because the layouts line up:

  * torch packs LSTM gates in [i, f, g, o] row blocks; ops/lstm.py uses the
    SAME [i, f, g, o] column order, so `W = weight_ih.T`, `U = weight_hh.T`,
    and `b = bias_ih + bias_hh` (we keep one bias; the cell adds it once).
  * torch's bidirectional output is [forward | backward] concatenated on the
    feature axis — ops/lstm.py:bilstm_layer concatenates the same way, and
    stacked layers consume the 2H concat identically.
  * `input_layer.weight` is (out, in); our linear stores (in, out) -> `.T`.

Checkpoints saved from the reference's `nn.DataParallel`-wrapped model
(reference model.py:201) carry a `module.` key prefix; it is stripped.
The reference's active decoder has no output projection (it returns None,
reference model.py:117), so our seq2seq `output` head — and the CTC head
the reference never built — stay at their fresh initialization; the import
report says so explicitly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str,
                          allow_pickle: bool = False) -> dict[str, np.ndarray]:
    """Read a reference checkpoint into {name: float32 ndarray}.

    Accepts either a raw state_dict (what the reference's fixed-up train
    saves) or — only with allow_pickle=True — a pickled nn.Module (what
    `torch.save(model, ...)` produces); strips the DataParallel `module.`
    prefix.

    Security: loads with weights_only=True by default, which rejects
    arbitrary pickled objects. Full unpickling executes arbitrary code
    embedded in the file, so a third-party .pth must only be loaded with
    allow_pickle=True if its source is trusted (CLI: --trust_torch_pickle).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path!r} is not a plain-tensor checkpoint "
                "(weights_only load failed). If it is a pickled nn.Module "
                "from a TRUSTED source, re-run with allow_pickle=True "
                "(CLI: --trust_torch_pickle); unpickling an untrusted file "
                f"executes arbitrary code. Original error: {e}") from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict") and callable(obj.state_dict):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(
            f"{path!r} does not contain a state dict or module "
            f"(got {type(obj).__name__})")
    out: dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue  # non-tensor entries (e.g. num_batches_tracked ints)
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy().astype(np.float32)
    return out


def _take(sd: dict, key: str, want_shape: tuple, used: set) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"torch checkpoint is missing {key!r}")
    v = sd[key]
    if tuple(v.shape) != tuple(want_shape):
        hint = ""
        if key.endswith("input_layer.weight"):
            hint = (" — the reference consumes 120-dim MFCC+deltas features"
                    " (reference data.py:44-79); train with"
                    " --features mfcc so input_dim matches")
        raise ValueError(
            f"shape mismatch for {key!r}: checkpoint {tuple(v.shape)} vs "
            f"model {tuple(want_shape)}{hint}")
    used.add(key)
    return v


def _cast_like(old: jnp.ndarray, new: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(new, dtype=old.dtype)


def _import_lstm_dir(sd: dict, prefix: str, layer: int, reverse: bool,
                     dst: dict, used: set) -> dict:
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    w_ih = _take(sd, f"{prefix}weight_ih{sfx}", dst["W"].shape[::-1], used)
    w_hh = _take(sd, f"{prefix}weight_hh{sfx}", dst["U"].shape[::-1], used)
    b_ih = _take(sd, f"{prefix}bias_ih{sfx}", dst["b"].shape, used)
    b_hh = _take(sd, f"{prefix}bias_hh{sfx}", dst["b"].shape, used)
    return {
        "W": _cast_like(dst["W"], w_ih.T),
        "U": _cast_like(dst["U"], w_hh.T),
        "b": _cast_like(dst["b"], b_ih + b_hh),
    }


def import_encoder(sd: dict, enc_params: dict, used: set,
                   prefix: str = "encoder.") -> dict:
    """Map the reference Encoder (reference model.py:34-56) into a
    bilstm_ctc-style encoder tree ({input_proj, lstm: [{fwd, bwd}, ...]})."""
    out = dict(enc_params)
    ip = enc_params["input_proj"]
    out["input_proj"] = {
        "w": _cast_like(ip["w"], _take(sd, f"{prefix}input_layer.weight",
                                       ip["w"].shape[::-1], used).T),
        "b": _cast_like(ip["b"], _take(sd, f"{prefix}input_layer.bias",
                                       ip["b"].shape, used)),
    }
    layers = []
    for k, layer in enumerate(enc_params["lstm"]):
        layers.append({
            "fwd": _import_lstm_dir(sd, f"{prefix}blstm.", k, False,
                                    layer["fwd"], used),
            "bwd": _import_lstm_dir(sd, f"{prefix}blstm.", k, True,
                                    layer["bwd"], used),
        })
    out["lstm"] = layers
    return out


def init_from_torch_checkpoint(path: str, params: dict, cfg: Any,
                               allow_pickle: bool = False
                               ) -> tuple[dict, str]:
    """Warm-start `params` (a fresh init for cfg.model.family) from a
    reference torch checkpoint. Returns (new_params, report string).

    Families:
      * "ctc" — imports the encoder; the CTC head stays fresh (the
        reference has no CTC head).
      * "transducer" (bilstm backbone) — imports the encoder; prediction
        network + joint stay fresh.
      * "seq2seq" — imports encoder + decoder embedding + decoder LSTM;
        the output projection stays fresh (the reference's active decoder
        never built one, reference model.py:117).
    Attention-family encoders (transformer/conformer) have no torch
    counterpart in the reference and are refused.
    """
    family = cfg.model.family
    sd = load_torch_state_dict(path, allow_pickle=allow_pickle)
    used: set[str] = set()
    new = dict(params)
    fresh: list[str] = []
    if family == "ctc":
        enc = {k: params[k] for k in ("input_proj", "lstm")}
        new.update(import_encoder(sd, enc, used))
        fresh.append("ctc_head")
    elif family == "transducer":
        if not isinstance(params.get("encoder", {}).get("lstm"), list):
            raise ValueError(
                "--init_from_torch supports the transducer family only "
                "with the bilstm encoder backbone")
        new["encoder"] = import_encoder(sd, params["encoder"], used)
        fresh += [k for k in params if k != "encoder"]
    elif family == "seq2seq":
        new["encoder"] = import_encoder(sd, params["encoder"], used)
        emb = _take(sd, "decoder.embed_layer.weight",
                    params["embed"].shape, used)
        new["embed"] = _cast_like(params["embed"], emb)
        new["dec_lstm"] = _import_lstm_dir(sd, "decoder.lstm.", 0, False,
                                           params["dec_lstm"], used)
        fresh.append("output")
    else:
        raise ValueError(
            f"--init_from_torch: no reference torch counterpart for model "
            f"family {family!r} (supported: ctc, transducer, seq2seq)")
    unused = sorted(set(sd) - used)
    report = (f"imported {len(used)} tensors from {path}"
              + (f"; fresh (no torch source): {', '.join(fresh)}" if fresh
                 else "")
              + (f"; unused torch keys: {', '.join(unused)}" if unused
                 else ""))
    return new, report
