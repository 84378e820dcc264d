"""Ahead-of-time model export for deployment (`--mode export`).

Serializes the FULL serving computation of a trained model dir — raw
waveform -> on-device features -> encoder forward -> on-device decode ->
token ids — into one self-contained StableHLO artifact via `jax.export`:
the trained weights are baked in as constants, so the file runs under any
PJRT runtime (`jax.export.deserialize(blob).call(wave, num_samples)`)
with NO pg_asr_tpu dependency. This is the deployment story the reference
cannot offer: its predict path ships full posteriors to the host and
beam-decodes in Python per utterance (reference model.py:314-326).

Artifacts written to `<model_path>/export/`:
  * `serving.jaxexport` — the serialized function (weights included)
  * `manifest.json`     — input/output contract: shapes, dtypes, family,
    decoder, sample rate, and the id->piece alphabet so any consumer can
    map token ids to text

Shapes are static (TPU-friendly): the caller picks `--export_batch` and
`--export_seconds`; shorter utterances zero-pad and pass their true
`num_samples`. Multi-platform lowering (`--export_platforms cpu,tpu`)
emits one artifact that runs on either backend.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config

EXPORT_DIR = "export"
ARTIFACT = "serving.jaxexport"
MANIFEST = "manifest.json"


def make_serving_fn(params, cfg: Config, decoder: str = "greedy",
                    beam_size: int = 0, quantize: str = ""):
    """(wave (B, N) float32, num_samples (B,) int32) -> (ids (B, L) int32
    0-padded, lens (B,) int32), with `params` closed over (baked into the
    export as constants). Dispatches exactly like predict does.

    quantize="int8": weight-only per-channel int8 (ops/quant.py) — the
    baked-in constants are int8, ~4x smaller artifact vs f32; latency on
    current XLA/TPU is a wash (measured — see ops/quant.py docstring)."""
    if quantize == "int8":
        from .ops.quant import dequantize_tree, quantize_tree

        qparams = quantize_tree(params)
        inner = make_serving_fn_from(lambda: dequantize_tree(qparams),
                                     cfg, decoder, beam_size)
        return inner
    if quantize:
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(supported: 'int8')")
    return make_serving_fn_from(lambda: params, cfg, decoder, beam_size)


def make_serving_fn_from(get_params, cfg: Config, decoder: str = "greedy",
                         beam_size: int = 0):
    """Serving fn where the parameter tree is produced by `get_params()`
    inside the trace (identity for float params; dequantization for
    quantized trees)."""
    family = cfg.model.family
    if family == "seq2seq":
        from .predict import _forward_seq2seq, _forward_seq2seq_beam

        if decoder == "beam" and beam_size > 1:
            def fn(wave, num_samples):
                return _forward_seq2seq_beam(get_params(), wave, num_samples,
                                             cfg, beam_size=beam_size)
        else:
            def fn(wave, num_samples):
                tokens, _ = _forward_seq2seq(get_params(), wave, num_samples,
                                             cfg)
                # cut at the first EOS (= pad id 0), on device
                S = tokens.shape[1]
                is_eos = tokens == 0
                lens = jnp.where(is_eos.any(axis=1),
                                 jnp.argmax(is_eos, axis=1), S).astype(jnp.int32)
                keep = jnp.arange(S)[None, :] < lens[:, None]
                return jnp.where(keep, tokens, 0), lens
        return fn
    if family == "transducer":
        from .predict import _forward_transducer

        def fn(wave, num_samples):
            return _forward_transducer(get_params(), wave, num_samples, cfg,
                                       beam_size=beam_size if decoder == "beam" else 0)
        return fn

    # CTC families (ctc / transformer / conformer / moe-transformer)
    from .decoding.greedy import greedy_decode
    from .ops.features import extract_features
    from .models import acoustic_forward

    def fn(wave, num_samples):
        feats, mask, frame_lens = extract_features(wave, num_samples,
                                                   cfg.features)
        log_probs, out_mask, out_lens = acoustic_forward(
            get_params(), feats, mask, frame_lens, cfg, train=False)
        if decoder == "beam" and beam_size > 1:
            from .decoding.beam import beam_decode

            ids, lens, _ = beam_decode(log_probs, out_lens,
                                       beam_size=beam_size,
                                       max_label_len=cfg.decode.max_label_len)
            return ids, lens
        return greedy_decode(log_probs, out_mask)
    return fn


def export_model(model_path: str, corpus_path: str | None = None,
                 batch_size: int = 8, max_seconds: float = 20.0,
                 decoder: str = "greedy", beam_size: int = 0,
                 which: str = "best", platforms: tuple[str, ...] = (),
                 quantize: str = "") -> dict:
    """Export a trained model dir for deployment. Returns the manifest."""
    from jax import export as jax_export

    from .data.bpe import load_tokenizer
    from .predict import load_model

    cfg_path = os.path.join(model_path, "config.json")
    cfg = Config.from_json(open(cfg_path).read()) if os.path.exists(cfg_path) else Config()
    tok_root = corpus_path or model_path
    try:
        alphabet = load_tokenizer(tok_root, cfg.text.units)
    except FileNotFoundError as e:
        if not corpus_path:
            raise FileNotFoundError(
                f"{e} — tokenizer artifacts (alphabet.txt / bpe.vocab) live "
                "in the CORPUS dir, not the model dir; pass --corpus_path")
        raise
    params, cfg = load_model(model_path, alphabet, config=cfg, which=which)
    if decoder == "beam" and beam_size <= 1:
        # match predict's fallback (predict.py) so --decoder beam without
        # --beam_size exports an actual beam artifact, not a silent greedy
        beam_size = cfg.decode.beam_size

    fn = make_serving_fn(params, cfg, decoder=decoder, beam_size=beam_size,
                         quantize=quantize)
    n = int(max_seconds * cfg.features.sample_rate)
    wave_t = jax.ShapeDtypeStruct((batch_size, n), jnp.float32)
    ns_t = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    kw = {"platforms": platforms} if platforms else {}
    exp = jax_export.export(jax.jit(fn), **kw)(wave_t, ns_t)
    blob = exp.serialize()

    out_dir = os.path.join(model_path, EXPORT_DIR)
    os.makedirs(out_dir, exist_ok=True)
    art = os.path.join(out_dir, ARTIFACT)
    with open(art + ".tmp", "wb") as fo:
        fo.write(bytes(blob))
    os.replace(art + ".tmp", art)

    manifest = {
        "artifact": ARTIFACT,
        "family": cfg.model.family,
        "decoder": decoder,
        "beam_size": beam_size,
        "checkpoint": which,
        "sample_rate": cfg.features.sample_rate,
        "batch_size": batch_size,
        "max_samples": n,
        "inputs": {"wave": ["float32", [batch_size, n]],
                   "num_samples": ["int32", [batch_size]]},
        "outputs": {"ids": "int32 (B, L) 0-padded", "lens": "int32 (B,)"},
        "platforms": list(exp.platforms),
        "quantize": quantize or "none",
        "blank_id": 0,
        "units": cfg.text.units,
        "alphabet": [alphabet.piece(i) for i in range(alphabet.size)],
        "bytes": len(blob),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as fo:
        json.dump(manifest, fo, indent=2)
    print(f"[export] wrote {art} ({len(blob)/1e6:.1f} MB, "
          f"platforms={list(exp.platforms)}) + {MANIFEST}")
    return manifest


class ExportedModel:
    """Load and run an exported artifact — no model/config code needed."""

    def __init__(self, export_dir: str):
        from jax import export as jax_export

        with open(os.path.join(export_dir, MANIFEST)) as fo:
            self.manifest = json.load(fo)
        with open(os.path.join(export_dir, self.manifest["artifact"]), "rb") as fo:
            self._exp = jax_export.deserialize(bytearray(fo.read()))

    def __call__(self, wave: np.ndarray, num_samples: np.ndarray):
        """Pads/crops wave rows to the exported static shape and decodes.
        Returns (ids (B, L) int32, lens (B,) int32)."""
        B, N = self.manifest["batch_size"], self.manifest["max_samples"]
        if wave.shape[0] > B:
            raise ValueError(f"batch {wave.shape[0]} > exported batch {B}")
        buf = np.zeros((B, N), np.float32)
        m = min(N, wave.shape[1])
        buf[:wave.shape[0], :m] = wave[:, :m]
        ns = np.zeros((B,), np.int32)
        ns[:wave.shape[0]] = np.minimum(num_samples, m)
        ids, lens = self._exp.call(buf, ns)
        return np.asarray(ids)[:wave.shape[0]], np.asarray(lens)[:wave.shape[0]]

    def decode_text(self, ids: np.ndarray, lens: np.ndarray) -> list[str]:
        pieces = self.manifest["alphabet"]
        return ["".join(pieces[t] for t in row[:n] if t != 0)
                for row, n in zip(ids, lens)]
