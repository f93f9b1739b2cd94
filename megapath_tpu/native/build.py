"""Build + ctypes bindings for the native components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(HERE, "_saais.so")
_SRC = os.path.join(HERE, "saais.cpp")
_FQ_SO = os.path.join(HERE, "_fastq.so")
_FQ_SRC = os.path.join(HERE, "fastq.cpp")
_BB_SO = os.path.join(HERE, "_bbduk.so")
_BB_SRC = os.path.join(HERE, "bbduk.cpp")
_SP_SO = os.path.join(HERE, "_spike.so")
_SP_SRC = os.path.join(HERE, "spike.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_fq_lib: Optional[ctypes.CDLL] = None
_fq_tried = False
_bb_lib: Optional[ctypes.CDLL] = None
_bb_tried = False
_sp_lib: Optional[ctypes.CDLL] = None
_sp_tried = False


def _compile(src: str, so: str, extra: Tuple[str, ...] = ()) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", so]
            + list(extra),
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def build() -> bool:
    """Compile the shared library; returns success."""
    return _compile(_SRC, _SO)


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


def load_fastq_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native FASTQ parser; None if the
    toolchain or zlib headers are unavailable (callers fall back to the
    Python parser)."""
    global _fq_lib, _fq_tried
    with _lock:
        if _fq_lib is not None:
            return _fq_lib
        if _fq_tried:
            return None
        _fq_tried = True
        if not os.path.exists(_FQ_SO) or os.path.getmtime(_FQ_SO) < os.path.getmtime(_FQ_SRC):
            if not _compile(_FQ_SRC, _FQ_SO, ("-lz",)):
                return None
        try:
            lib = ctypes.CDLL(_FQ_SO)
            lib.fq_open.argtypes = [ctypes.c_char_p]
            lib.fq_open.restype = ctypes.c_void_p
            lib.fq_close.argtypes = [ctypes.c_void_p]
            lib.fq_close.restype = None
            lib.fq_next_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_longlong,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.fq_next_batch.restype = ctypes.c_longlong
            _fq_lib = lib
            return _fq_lib
        except OSError:
            return None


def load_bbduk_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the bbduk scan kernels; None on
    failure (callers fall back to the numpy scans)."""
    global _bb_lib, _bb_tried
    with _lock:
        if _bb_lib is not None:
            return _bb_lib
        if _bb_tried:
            return None
        _bb_tried = True
        if not os.path.exists(_BB_SO) or os.path.getmtime(_BB_SO) < os.path.getmtime(_BB_SRC):
            if not _compile(_BB_SRC, _BB_SO, ("-pthread",)):
                return None
        try:
            lib = ctypes.CDLL(_BB_SO)
            lib.bbduk_entropy.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.bbduk_entropy.restype = None
            lib.bbduk_qtrim.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.bbduk_qtrim.restype = None
            _bb_lib = lib
            return _bb_lib
        except OSError:
            return None


def load_spike_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the SPIKE moments fold; None on
    failure (callers fall back to the Python loop)."""
    global _sp_lib, _sp_tried
    with _lock:
        if _sp_lib is not None:
            return _sp_lib
        if _sp_tried:
            return None
        _sp_tried = True
        if not os.path.exists(_SP_SO) or os.path.getmtime(_SP_SO) < os.path.getmtime(_SP_SRC):
            if not _compile(_SP_SRC, _SP_SO):
                return None
        try:
            lib = ctypes.CDLL(_SP_SO)
            lib.spike_moments.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.spike_moments.restype = None
            _sp_lib = lib
            return _sp_lib
        except OSError:
            return None


class NativeFastqReader:
    """Streaming gz-FASTQ reader producing packed code batches.

    The aio_thread.cpp equivalent: C++ parses + packs off the GIL, so a
    Python reader thread overlaps parsing with device compute.
    """

    NAME_CAP = 96

    def __init__(self, path: str, max_len: int = 512):
        lib = load_fastq_lib()
        if lib is None:
            raise RuntimeError("native fastq parser unavailable")
        self._lib = lib
        self._h = lib.fq_open(os.fspath(path).encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.max_len = max_len

    def next_batch(self, cap: int):
        """Returns (codes [n, max_len] u8, lens [n] i32, quals [n,
        max_len] u8 ascii, seqs [n, max_len] u8 raw ascii, names
        list[str]); n == 0 at EOF."""
        L = self.max_len
        codes = np.zeros((cap, L), dtype=np.uint8)
        lens = np.zeros(cap, dtype=np.int32)
        quals = np.zeros((cap, L), dtype=np.uint8)
        seqs = np.zeros((cap, L), dtype=np.uint8)
        names = ctypes.create_string_buffer(cap * self.NAME_CAP)
        n = self._lib.fq_next_batch(
            self._h,
            ctypes.c_longlong(cap),
            ctypes.c_int(L),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            quals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            names,
            ctypes.c_int(self.NAME_CAP),
        )
        if n < 0:
            raise ValueError("malformed FASTQ stream")
        n = int(n)
        raw = names.raw
        out_names = [
            raw[i * self.NAME_CAP : (i + 1) * self.NAME_CAP].split(b"\0", 1)[0].decode()
            for i in range(n)
        ]
        return codes[:n], lens[:n], quals[:n], seqs[:n], out_names

    def close(self) -> None:
        if self._h:
            self._lib.fq_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


if __name__ == "__main__":
    ok = build()
    ok2 = _compile(_FQ_SRC, _FQ_SO, ("-lz",))
    print("saais:", "built" if ok else "FAILED", "| fastq:", "built" if ok2 else "FAILED")
