"""Host-side audio IO.

The reference shells out to torchaudio.load per file per epoch (reference
data.py:55). Here the host only *reads bytes and pads batches* — all DSP is
on-device (ops/features.py). Built-in WAV (PCM8/16/32, float32) reader with
no external deps; soundfile used for FLAC/OGG when importable.
"""

from __future__ import annotations

import os
import struct
import wave as _wave

import numpy as np

try:  # optional — not in the base image
    import soundfile as _sf
except Exception:  # pragma: no cover
    _sf = None


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file to mono float32 in [-1, 1]. Returns (samples, rate)."""
    with _wave.open(path, "rb") as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        sr = w.getframerate()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1,1] samples as PCM16 WAV (for test fixtures)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with _wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Dispatch by extension; WAV natively, everything else via soundfile."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path)
    if _sf is not None:
        data, sr = _sf.read(path, dtype="float32", always_2d=False)
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data.astype(np.float32), int(sr)
    raise RuntimeError(
        f"cannot decode {path!r}: only WAV is supported natively and "
        f"soundfile is not installed"
    )


def synth_utterance(rng: np.random.Generator, duration_s: float,
                    sample_rate: int = 16000) -> np.ndarray:
    """Deterministic synthetic speech-like waveform: a few gliding tones over
    pink-ish noise (used by the synthetic corpus and benchmarks)."""
    n = int(duration_s * sample_rate)
    t = np.arange(n, dtype=np.float32) / sample_rate
    x = np.zeros(n, dtype=np.float32)
    for _ in range(3):
        f0 = rng.uniform(80.0, 350.0)
        glide = rng.uniform(-30.0, 30.0)
        x += rng.uniform(0.1, 0.3) * np.sin(
            2 * np.pi * (f0 * t + 0.5 * glide * t * t)
        ).astype(np.float32)
    noise = rng.standard_normal(n).astype(np.float32)
    # crude 1/f shaping: cumulative sum high-pass mix
    pink = np.cumsum(noise) / np.sqrt(np.arange(1, n + 1, dtype=np.float32))
    x += 0.05 * (pink - pink.mean()).astype(np.float32)
    peak = np.max(np.abs(x)) or 1.0
    return (0.7 * x / peak).astype(np.float32)
