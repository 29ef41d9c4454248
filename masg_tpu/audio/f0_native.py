"""ctypes binding for the native C++ DIO+StoneMask extension.

Builds masg_tpu/native/f0.cpp into a shared library on first use (g++ -O3;
cached beside the source). Falls back to the numpy implementation in f0.py if
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "f0.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libmasgf0.so"))

_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        for name in ("dio_stonemask", "dio_only"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
            ]
        _lib = lib
        return lib


def dio_stonemask_native(
    x: np.ndarray, fs: int, frame_period_ms: float = 256 / 22050 * 1000
) -> np.ndarray:
    """DIO + two StoneMask passes via the C++ extension."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n_frames = int(len(x) / fs * 1000.0 / frame_period_ms) + 1
    out = np.zeros(n_frames, np.float64)
    written = lib.dio_stonemask(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x), fs, frame_period_ms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_frames,
    )
    if written < 0:
        raise RuntimeError("native dio_stonemask failed")
    return out[:written]


def dio_native(
    x: np.ndarray, fs: int, frame_period_ms: float = 256 / 22050 * 1000
) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n_frames = int(len(x) / fs * 1000.0 / frame_period_ms) + 1
    out = np.zeros(n_frames, np.float64)
    written = lib.dio_only(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x), fs, frame_period_ms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_frames,
    )
    if written < 0:
        raise RuntimeError("native dio failed")
    return out[:written]
