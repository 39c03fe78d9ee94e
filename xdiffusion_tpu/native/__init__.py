"""Native (C++) host-runtime components with pure-numpy fallbacks.

The reference's host data path rides torch's native DataLoader machinery;
here the per-step batch assembly (index-gather + uint8->float32 normalize)
is a small C++ library compiled on first use with the system g++ and bound
through ctypes. Everything degrades to numpy if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "build", "libbatchgen.so")
_SRC = os.path.join(_HERE, "batchgen.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("XDIFFUSION_NO_NATIVE", "0") == "1":
            return None
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-o", _LIB_PATH, _SRC, "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_normalize_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_float, ctypes.c_void_p,
                ctypes.c_int,
            ]
            lib.gather_i32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_normalize(
    arena: np.ndarray, idx: np.ndarray, scale: float = 1.0 / 255.0
) -> np.ndarray:
    """float32 batch = arena[idx] * scale, fused in C++ when available.

    arena: uint8 (N, ...) C-contiguous; idx: integer (B,)."""
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or arena.dtype != np.uint8 or not arena.flags.c_contiguous:
        return arena[idx].astype(np.float32) * np.float32(scale)
    b = int(idx.shape[0])
    item = int(np.prod(arena.shape[1:]))
    out = np.empty((b,) + arena.shape[1:], dtype=np.float32)
    lib.gather_normalize_u8(
        arena.ctypes.data, idx.ctypes.data, b, item,
        ctypes.c_float(scale), out.ctypes.data, os.cpu_count() or 1,
    )
    return out
