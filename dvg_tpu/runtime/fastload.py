"""ctypes binding for the native frame decoder (runtime/native/fastload.cpp).

Builds the shared library on first use if a toolchain is present (the image
ships g++ + libpng/libjpeg); falls back cleanly — callers check
`is_available()` and use the PIL path otherwise."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libdvgload.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        cpp = os.path.join(_DIR, "fastload.cpp")
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(cpp)
                     and os.path.getmtime(cpp) > os.path.getmtime(_SO)))
        if stale:
            try:
                subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                if not os.path.exists(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.dvg_decode_batch.restype = ctypes.c_int
            lib.dvg_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            if lib.dvg_version() != 1:
                return None
            _lib = lib
        except (OSError, AttributeError):
            # AttributeError: a stale/foreign libdvgload.so that loads but
            # lacks the expected symbols — fall back to PIL, don't crash
            # the availability probe
            return None
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], height: int, width: int,
                 channels: int, out: Optional[np.ndarray] = None,
                 n_threads: int = 0) -> np.ndarray:
    """Decode `paths` into a (N, H, W, C) float32 array in [0, 1].

    `out` may be any float32 C-contiguous array with N*H*W*C elements (e.g.
    a (T, B, H, W, C) batch buffer laid out so path k fills slot k)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastload library unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, channels), np.float32)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    assert out.size == n * height * width * channels
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.dvg_decode_batch(
        arr, n, height, width, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        raise IOError(f"fastload failed on {paths[-rc - 1]!r}")
    return out
