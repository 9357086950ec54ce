"""ctypes binding for the native wav decode library (native/wavio.cc).

At >2500 utt/s/chip inference the host must decode thousands of wavs per
second; Python's ``wave`` module serializes on the interpreter. The C++
library parses RIFF headers and PCM-decodes a whole batch in a persistent
thread pool, writing float32 [-1, 1] rows straight into the numpy batch
buffer. Falls back transparently to the pure-Python reader when the
library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libasrwav.so"),
    "libasrwav.so",
]

_lib = None
_load_failed = False


def _load(auto_build: bool = True):
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if auto_build and not any(os.path.exists(p) for p in _LIB_PATHS):
        # the .so is not in version control (built artifact); compile it
        # on first use when a toolchain is around, else Python fallback
        _try_auto_build()
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.asrwav_probe.restype = ctypes.c_int64
        lib.asrwav_probe.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int32)]
        lib.asrwav_decode_batch.restype = ctypes.c_int32
        lib.asrwav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib
    _load_failed = True
    return None


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Tuple[int, int]:
    """Header-only (num_samples, sample_rate); raises on failure."""
    lib = _load()
    if lib is None:
        import wave
        with wave.open(path, "rb") as w:
            return w.getnframes(), w.getframerate()
    sr = ctypes.c_int32(0)
    n = lib.asrwav_probe(path.encode(), ctypes.byref(sr))
    if n < 0:
        raise IOError(f"cannot parse wav: {path}")
    return int(n), int(sr.value)


def decode_batch(paths: List[str], max_samples: int,
                 out: Optional[np.ndarray] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode ``paths`` into a [B, max_samples] float32 array (+ lengths).

    Rows of failed files come back zero with length -1 — callers treat
    them with the loader's drop-row semantics.
    """
    b = len(paths)
    if out is None:
        out = np.empty((b, max_samples), np.float32)
    assert out.shape == (b, max_samples) and out.dtype == np.float32
    lib = _load()
    lengths = np.empty((b,), np.int64)
    if lib is None:
        from asr_dfcnn_transformer_tpu.audio.wav import read_wav
        for i, p in enumerate(paths):
            try:
                sig, _ = read_wav(p)
                n = min(len(sig), max_samples)
                out[i, :n] = sig[:n]
                out[i, n:] = 0
                lengths[i] = n
            except Exception:
                out[i] = 0
                lengths[i] = -1
        return out, lengths
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.asrwav_decode_batch(
        arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out, lengths


def _try_auto_build() -> None:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # no toolchain / no source tree — pure-Python fallback


def build_native(repo_root: Optional[str] = None) -> bool:
    """Best-effort `make -C native`; returns availability."""
    global _load_failed, _lib
    root = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=True)
    except Exception:
        return False
    _load_failed = False
    _lib = None
    return available()
