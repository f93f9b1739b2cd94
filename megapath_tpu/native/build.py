"""Build + ctypes bindings for the native components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(HERE, "_saais.so")
_SRC = os.path.join(HERE, "saais.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build() -> bool:
    """Compile the shared library; returns success."""
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def load_saais() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the SA-IS library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.saais_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.saais_u8.restype = ctypes.c_int
            _lib = lib
            return _lib
        except OSError:
            return None


def suffix_array_native(codes: np.ndarray) -> Optional[np.ndarray]:
    """SA via native SA-IS; None if the library is unavailable."""
    lib = load_saais()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes)
    sa = np.empty(n, dtype=np.int64)
    rc = lib.saais_u8(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return sa


if __name__ == "__main__":
    ok = build()
    print("built" if ok else "build FAILED")
