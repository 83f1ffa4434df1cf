"""ctypes bindings for the native batched WAV loader (native/wavio.cpp).

Builds the shared library on first use if a toolchain is present (``make`` in
``native/``), and falls back to the scipy path in kaldi_io transparently —
the loader is a host-throughput optimization, never a correctness
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.wavio_load_batch.restype = ctypes.c_int
        lib.wavio_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.wavio_num_samples.restype = ctypes.c_int64
        lib.wavio_num_samples.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(
    paths: Sequence[str],
    out_len: int,
    expect_rate: int = 16000,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode wavs into a (n, out_len) float32 batch (zero-padded /
    truncated) + (n,) valid-length vector. Raises on unreadable files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    n = len(paths)
    out = np.zeros((n, out_len), dtype=np.float32)
    lens = np.zeros((n,), dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.wavio_load_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_len,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        expect_rate,
        n_threads,
    )
    if failures:
        bad = [paths[i] for i in range(n) if lens[i] < 0]
        raise IOError(f"native wav decode failed for {failures} files: {bad[:3]}")
    return out, lens.astype(np.int32)


def num_samples(path: str) -> Tuple[int, int]:
    """(num_samples, sample_rate) from the header only (no data read)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    rate = ctypes.c_int32(0)
    n = lib.wavio_num_samples(path.encode(), ctypes.byref(rate))
    if n < 0:
        raise IOError(f"cannot parse wav header: {path}")
    return int(n), int(rate.value)
