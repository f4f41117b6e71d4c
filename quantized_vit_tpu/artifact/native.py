"""ctypes bindings for the C++ artifact packer, with numpy fallback.

Builds `_native/pack.cc` into `_native/libqvtpack.so` on first use (g++,
-O3 -fopenmp); if the toolchain is unavailable the numpy fallback keeps the
pipeline working — same layout, just slower on big checkpoints.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "pack.cc")
_SO = os.path.join(_DIR, "libqvtpack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # temp-name + rename: concurrent processes must never CDLL a
    # half-written .so (atomic on POSIX)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    for cmd in (
        ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", tmp],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
    ):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
            return True
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.qvt_pack_int4.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64,
                                      i8p]
        lib.qvt_unpack_int4.argtypes = [i8p, ctypes.c_int64, ctypes.c_int64,
                                        i8p]
        lib.qvt_quantize_levels.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, i8p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def pack_int4_host(levels: np.ndarray) -> np.ndarray:
    """[K, N] int8 levels in [-8, 7] -> [K/2, N] packed (axis 0), matching
    quant.packing.pack_int4."""
    levels = np.ascontiguousarray(levels, np.int8)
    k, n = levels.shape
    if k % 2:
        raise ValueError(f"K={k} must be even")
    lib = _load()
    if lib is None:
        lo = levels[: k // 2]
        hi = levels[k // 2:]
        return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8)
    out = np.empty((k // 2, n), np.int8)
    lib.qvt_pack_int4(levels, k, n, out)
    return out


def unpack_int4_host(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_int4_host`."""
    packed = np.ascontiguousarray(packed, np.int8)
    kh, n = packed.shape
    lib = _load()
    if lib is None:
        lo = ((packed.astype(np.int8) << 4).astype(np.int8) >> 4)
        hi = packed.astype(np.int8) >> 4
        return np.concatenate([lo, hi], axis=0).astype(np.int8)
    out = np.empty((2 * kh, n), np.int8)
    lib.qvt_unpack_int4(packed, kh, n, out)
    return out


def quantize_levels_host(w: np.ndarray, scale: np.ndarray,
                         lo: int, hi: int) -> np.ndarray:
    """clip(round(w / scale[col]), lo, hi) as int8 — the export hot loop."""
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    scale = np.ascontiguousarray(np.broadcast_to(scale, (n,)), np.float32)
    lib = _load()
    if lib is None:
        q = np.rint(w / scale[None, :])
        return np.clip(q, lo, hi).astype(np.int8)
    out = np.empty((k, n), np.int8)
    lib.qvt_quantize_levels(w, scale, k, n, int(lo), int(hi), out)
    return out
