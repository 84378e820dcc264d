"""ctypes bindings for the native C++ IO library (native/pgasr_io.cpp).

Builds libpgasr_io.so on first use (g++, cached next to the source) and
exposes:
  * read_wav(path)                 -> (float32 samples, sample_rate)
  * load_batch(paths, stride, ...) -> zero-copy fill of a padded (N, stride)
                                      numpy batch with a C++ thread pool
Falls back gracefully (native_available() == False) when no compiler/so is
present; callers then use the pure-Python reader (data/audio.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpgasr_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "pgasr_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-Wall",
             "-o", _SO_PATH, src, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    """A .so older than its source must be rebuilt — a stale (or
    foreign-platform) binary would silently serve outdated semantics."""
    src = os.path.join(_NATIVE_DIR, "pgasr_io.cpp")
    return (os.path.exists(src) and os.path.exists(_SO_PATH)
            and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_SO_PATH) or _stale()) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.pgasr_read_wav.restype = ctypes.c_long
        lib.pgasr_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int)]
        lib.pgasr_wav_info.restype = ctypes.c_int
        lib.pgasr_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long)]
        lib.pgasr_load_batch.restype = ctypes.c_int
        lib.pgasr_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long, ctypes.c_int]
        try:
            lib.pgasr_load_batch_rs.restype = ctypes.c_int
            lib.pgasr_load_batch_rs.argtypes = \
                lib.pgasr_load_batch.argtypes + [ctypes.c_int]
            lib.pgasr_resample_linear.restype = None
            lib.pgasr_resample_linear.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        except AttributeError:  # stale .so without the resample ABI
            pass
        try:
            lib.pgasr_load_batch_i16.restype = ctypes.c_int
            lib.pgasr_load_batch_i16.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_long, ctypes.c_int, ctypes.c_int]
        except AttributeError:  # stale .so without the int16 ABI
            pass
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def wav_info(path: str) -> tuple[int, int]:
    """(sample_rate, n_samples) without decoding (header-only read)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    sr = ctypes.c_int(0)
    n = ctypes.c_long(0)
    rc = lib.pgasr_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"pgasr_wav_info({path!r}) failed with {rc}")
    return sr.value, n.value


def read_wav(path: str, max_samples: int = 0) -> tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    if max_samples <= 0:
        _, max_samples = wav_info(path)
        max_samples = max(max_samples, 1)
    out = np.zeros(max_samples, np.float32)
    sr = ctypes.c_int(0)
    n = lib.pgasr_read_wav(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           max_samples, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"pgasr_read_wav({path!r}) failed with {n}")
    return out[:n], sr.value


def resample(x: np.ndarray, n_out: int) -> np.ndarray:
    """Native linear resample to n_out samples (np.interp semantics)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pgasr_resample_linear"):
        raise RuntimeError("native resample unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(n_out, np.float32)
    lib.pgasr_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out


def load_batch(paths: list[str], stride: int, max_samples: int = 0,
               n_threads: int | None = None, target_rate: int = 0):
    """Decode `paths` into a fresh zero-padded (N, stride) float32 buffer,
    optionally resampling rate-mismatched files to target_rate in the C++
    worker threads. Returns (batch, lens (N,), sample_rates (N,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO unavailable")
    n = len(paths)
    out = np.zeros((n, stride), np.float32)
    lens = np.zeros(n, np.int32)
    srs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = n_threads or min(8, os.cpu_count() or 1)
    if target_rate and hasattr(lib, "pgasr_load_batch_rs"):
        rc = lib.pgasr_load_batch_rs(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            stride, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            stride, threads, target_rate)
    else:
        rc = lib.pgasr_load_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            stride, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            stride, threads)
    if rc < 0:
        bad = [paths[i] for i in range(n) if lens[i] == 0]
        raise IOError(f"native batch load: {-rc} file(s) failed, e.g. {bad[:3]}")
    return out, lens, srs


def load_batch_i16(paths: list[str], stride: int, n_threads: int | None = None,
                   target_rate: int = 0):
    """Decode `paths` into a fresh zero-padded (N, stride) int16 buffer —
    mono 16-bit PCM at the target rate is ONE fread per row (no float
    conversion); other formats/rates decode+resample in float and quantize.
    The model converts back with x/32768 on-device
    (ops/features.extract_features), halving host decode work and
    host->device transfer bytes. Returns (batch, lens, sample_rates)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pgasr_load_batch_i16"):
        raise RuntimeError("native int16 IO unavailable")
    n = len(paths)
    out = np.zeros((n, stride), np.int16)
    lens = np.zeros(n, np.int32)
    srs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = n_threads or min(8, os.cpu_count() or 1)
    rc = lib.pgasr_load_batch_i16(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        stride, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        stride, threads, target_rate)
    if rc < 0:
        bad = [paths[i] for i in range(n) if lens[i] == 0]
        raise IOError(f"native batch load: {-rc} file(s) failed, e.g. {bad[:3]}")
    return out, lens, srs
