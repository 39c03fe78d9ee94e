"""Native (C++) host-runtime components with pure-numpy fallbacks.

The reference's host data path rides torch's native DataLoader machinery;
here the per-step batch assembly (index-gather + uint8->float32 normalize)
is a small C++ library compiled on first use with the system g++ and bound
through ctypes. Everything degrades to numpy if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batchgen.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _lib_path() -> str:
    # Binaries are never checked in; the build artifact is keyed on a
    # source hash (git doesn't preserve mtimes, so mtime comparisons
    # against a fresh checkout are meaningless).
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, "build", f"libbatchgen-{digest}.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("XDIFFUSION_NO_NATIVE", "0") == "1":
            return None
        try:
            lib_path = _lib_path()
            if not os.path.exists(lib_path):
                os.makedirs(os.path.dirname(lib_path), exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-o", lib_path, _SRC, "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(lib_path)
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
    if idx.size and (idx.min() < 0 or idx.max() >= arena.shape[0]):
        # Match the numpy fallback's failure mode instead of an
        # out-of-bounds read in the native path.
        raise IndexError(
            f"gather_normalize index out of range [0, {arena.shape[0]})"
        )
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
