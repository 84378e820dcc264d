"""ctypes bindings for the native BPE segmenter (native/pgasr_bpe.cpp).

Same build/fallback discipline as data/native_io.py: compiles
libpgasr_bpe.so on first use and exposes `encode_batch`; callers fall back
to the pure-Python tokenizer when no compiler/so is available. Exact-parity
with BpeAlphabet.encode is tested (tests/test_bpe.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpgasr_bpe.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "pgasr_bpe.cpp")
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
    foreign-platform) binary would silently drift from the Python
    tokenizer's segmentation semantics."""
    src = os.path.join(_NATIVE_DIR, "pgasr_bpe.cpp")
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
        cpp = ctypes.POINTER(ctypes.c_char_p)
        lib.pgasr_bpe_create.restype = ctypes.c_void_p
        lib.pgasr_bpe_create.argtypes = [cpp, ctypes.c_int, cpp, cpp,
                                         ctypes.c_int]
        lib.pgasr_bpe_free.argtypes = [ctypes.c_void_p]
        lib.pgasr_bpe_encode_batch.restype = ctypes.c_int
        lib.pgasr_bpe_encode_batch.argtypes = [
            ctypes.c_void_p, cpp, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBpe:
    """One compiled BPE model handle (built from a BpeAlphabet's tables)."""

    def __init__(self, symbols, merges):
        lib = _load()
        if lib is None:
            raise RuntimeError("native BPE unavailable")
        self._lib = lib
        toks = [s.encode() for s in symbols]
        arr = (ctypes.c_char_p * len(toks))(*toks)
        left = (ctypes.c_char_p * max(len(merges), 1))(
            *[a.encode() for a, _ in merges] or [b""])
        right = (ctypes.c_char_p * max(len(merges), 1))(
            *[b.encode() for _, b in merges] or [b""])
        self._h = lib.pgasr_bpe_create(arr, len(toks), left, right,
                                       len(merges))

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_h", None)
        if lib is not None and h:
            lib.pgasr_bpe_free(h)

    def encode_batch(self, texts,
                     n_threads: int | None = None) -> list[list[int]]:
        n = len(texts)
        if n == 0:
            return []
        # pre-split on the HOST so word boundaries follow Python's
        # unicode-aware str.split() (the C++ side splits ASCII whitespace
        # only — NBSP etc. would silently fuse words and change labels)
        norm = [" ".join(t.split()) for t in texts]
        sents = (ctypes.c_char_p * n)(*[t.encode() for t in norm])
        # exact upper bound on ids/sentence: one per code point plus one
        # marker per word — no silent truncation possible
        max_len = max(max((2 * len(t) + 2 for t in norm), default=2), 8)
        out = np.zeros((n, max_len), np.int32)
        lens = np.zeros((n,), np.int32)
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 8)
        rc = self._lib.pgasr_bpe_encode_batch(
            self._h, sents, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
        if rc != 0:
            raise RuntimeError(f"pgasr_bpe_encode_batch failed ({rc})")
        return [out[i, : lens[i]].tolist() for i in range(n)]
