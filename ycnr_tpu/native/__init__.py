"""ctypes loader for the native ingest library (reference C6/C7 analog).

Builds lazily with g++ on first use (cached as libycnr_ingest.so next to
this file); every entry point has a pure-NumPy fallback, so the framework
works without a toolchain — just slower on host-side ingestion.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ingest.cc")
_LIB = os.path.join(_DIR, "libycnr_ingest.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ycnr_count_rows.restype = ctypes.c_longlong
        lib.ycnr_count_rows.argtypes = [ctypes.c_char_p]
        lib.ycnr_parse_ratings.restype = ctypes.c_longlong
        lib.ycnr_parse_ratings.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float)]
        lib.ycnr_pack_chunks.restype = ctypes.c_int
        lib.ycnr_pack_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        lib.ycnr_pack_rows.restype = ctypes.c_int
        lib.ycnr_pack_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def parse_ratings_native(path: str, sep: str):
    """Fast MovieLens parse. Returns (u, i, r) int64/int64/float32 raw ids,
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.ycnr_count_rows(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    u = np.empty(n, np.int32)
    i = np.empty(n, np.int32)
    r = np.empty(n, np.float32)
    sep_mode = 1 if sep == "::" else 0
    got = lib.ycnr_parse_ratings(path.encode(), sep.encode(), sep_mode, n,
                                 _ptr(u, ctypes.c_int32),
                                 _ptr(i, ctypes.c_int32),
                                 _ptr(r, ctypes.c_float))
    if got < 0:
        raise FileNotFoundError(path)
    return (u[:got].astype(np.int64), i[:got].astype(np.int64), r[:got])


def pack_rows_native(src_start, src_cnt, o_sorted, r_sorted, out_oi,
                     out_r) -> bool:
    """Row-major bucket fill in C++ (bucketed layout). False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n, R = out_oi.shape[0], out_oi.shape[1]
    assert len(src_start) == len(src_cnt) and len(src_start) <= n
    lib.ycnr_pack_rows(
        _ptr(np.ascontiguousarray(src_start, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(src_cnt, np.int64), ctypes.c_int64),
        len(src_start), _ptr(o_sorted, ctypes.c_int32),
        _ptr(r_sorted, ctypes.c_float), R,
        _ptr(out_oi.reshape(-1), ctypes.c_int32),
        _ptr(out_r.reshape(-1), ctypes.c_float))
    return True


def pack_chunks_native(starts, block_of, slot_of, chunk_base, o_sorted,
                       r_sorted, C_B: int, L: int, out_oi, out_r,
                       out_seg) -> bool:
    """Fill chunk arrays in C++. Returns False if unavailable (caller must
    fall back). All arrays must be C-contiguous with the documented dtypes."""
    lib = get_lib()
    if lib is None:
        return False
    lib.ycnr_pack_chunks(
        _ptr(starts, ctypes.c_int64), _ptr(block_of, ctypes.c_int32),
        _ptr(slot_of, ctypes.c_int32), _ptr(chunk_base, ctypes.c_int32),
        len(block_of), _ptr(o_sorted, ctypes.c_int32),
        _ptr(r_sorted, ctypes.c_float), C_B, L,
        _ptr(out_oi.reshape(-1), ctypes.c_int32),
        _ptr(out_r.reshape(-1), ctypes.c_float),
        _ptr(out_seg.reshape(-1), ctypes.c_int32))
    return True
