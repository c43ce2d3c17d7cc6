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
_lock = threading.Lock()
_libs: dict = {}  # stem -> CDLL | None (None = build/load failed, cached)


def _build(src: str, lib_path: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
           "-o", lib_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(lib_path + ".tmp", lib_path)
        return True
    except Exception:
        return False


def _load(stem: str) -> Optional[ctypes.CDLL]:
    """Load (building with g++ if stale/missing) libycnr_<stem>.so, or None.
    Failures are cached so a missing toolchain costs one attempt."""
    src = os.path.join(_DIR, f"{stem}.cc")
    lib_path = os.path.join(_DIR, f"libycnr_{stem}.so")
    with _lock:
        if stem in _libs:
            return _libs[stem]
        _libs[stem] = None
        # a shipped .so without its .cc source is fine — just load it;
        # only rebuild when the source exists and is newer
        if os.path.exists(src):
            if not os.path.exists(lib_path) or (
                    os.path.getmtime(lib_path) < os.path.getmtime(src)):
                if not _build(src, lib_path):
                    return None
        elif not os.path.exists(lib_path):
            return None
        try:
            _libs[stem] = ctypes.CDLL(lib_path)
        except OSError:
            return None
        return _libs[stem]


def get_lib() -> Optional[ctypes.CDLL]:
    """The ingest library (parser/packers), with signatures set, or None."""
    lib = _load("ingest")
    if lib is None or hasattr(lib, "_ycnr_typed"):
        return lib
    lib._ycnr_typed = True
    lib.ycnr_count_rows.restype = ctypes.c_longlong
    lib.ycnr_count_rows.argtypes = [ctypes.c_char_p]
    lib.ycnr_parse_ratings.restype = ctypes.c_longlong
    lib.ycnr_parse_ratings.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    if hasattr(lib, "ycnr_parse_ratings_ts"):
        # a shipped pre-ts .so (no .cc to rebuild from) lacks the symbol;
        # keep the older entry points usable and let the ts path fall back
        lib.ycnr_parse_ratings_ts.restype = ctypes.c_longlong
        lib.ycnr_parse_ratings_ts.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
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
    if hasattr(lib, "ycnr_pack_bits"):  # absent in pre-round-2 shipped .so
        lib.ycnr_pack_bits.restype = ctypes.c_int
        lib.ycnr_pack_bits.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32)]
    return lib


def get_shm_lib() -> Optional[ctypes.CDLL]:
    """The shared-memory factor-store library (reference C6c analog), with
    signatures set, or None if unbuildable on this host."""
    lib = _load("shm_store")
    if lib is None or hasattr(lib, "_ycnr_typed"):
        return lib
    lib._ycnr_typed = True
    fp = ctypes.POINTER(ctypes.c_float)
    lib.ycnr_shm_create.restype = ctypes.c_void_p
    lib.ycnr_shm_create.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64]
    lib.ycnr_shm_attach.restype = ctypes.c_void_p
    lib.ycnr_shm_attach.argtypes = [ctypes.c_char_p]
    lib.ycnr_shm_dims.restype = ctypes.c_int
    lib.ycnr_shm_dims.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.ycnr_shm_epoch.restype = ctypes.c_int64
    lib.ycnr_shm_epoch.argtypes = [ctypes.c_void_p]
    lib.ycnr_shm_publish.restype = ctypes.c_int
    lib.ycnr_shm_publish.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_double, fp, fp, fp, fp]
    lib.ycnr_shm_read.restype = ctypes.c_int64
    lib.ycnr_shm_read.argtypes = [ctypes.c_void_p, fp, fp, fp, fp,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_int]
    lib.ycnr_shm_detach.restype = ctypes.c_int
    lib.ycnr_shm_detach.argtypes = [ctypes.c_void_p]
    lib.ycnr_shm_unlink.restype = ctypes.c_int
    lib.ycnr_shm_unlink.argtypes = [ctypes.c_char_p]
    # present since round 2; older shipped .so files may lack it
    if hasattr(lib, "ycnr_shm_busy_owner"):
        lib.ycnr_shm_busy_owner.restype = ctypes.c_uint32
        lib.ycnr_shm_busy_owner.argtypes = []
    return lib


def get_cache_lib() -> Optional[ctypes.CDLL]:
    """The cross-process recommendation cache (reference C8/Redis role),
    with signatures set, or None if unbuildable on this host."""
    lib = _load("shm_cache")
    if lib is None or hasattr(lib, "_ycnr_typed"):
        return lib
    lib._ycnr_typed = True
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.ycnr_cache_create.restype = ctypes.c_void_p
    lib.ycnr_cache_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_uint32]
    lib.ycnr_cache_attach.restype = ctypes.c_void_p
    lib.ycnr_cache_attach.argtypes = [ctypes.c_char_p]
    lib.ycnr_cache_put.restype = ctypes.c_int
    lib.ycnr_cache_put.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_int64, ip, ctypes.c_uint32]
    lib.ycnr_cache_get.restype = ctypes.c_int
    lib.ycnr_cache_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_int64, ip]
    lib.ycnr_cache_stats.restype = ctypes.c_int
    lib.ycnr_cache_stats.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.ycnr_cache_detach.restype = ctypes.c_int
    lib.ycnr_cache_detach.argtypes = [ctypes.c_void_p]
    lib.ycnr_cache_unlink.restype = ctypes.c_int
    lib.ycnr_cache_unlink.argtypes = [ctypes.c_char_p]
    return lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def parse_ratings_native(path: str, sep: str):
    """Fast MovieLens parse. Returns (u, i, r) int32/int32/float32 raw ids
    (MovieLens id spaces fit int32; widening to int64 here would cost two
    full-array copies at 20M rows), or None if the library is unavailable."""
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
    if got == -1:
        raise FileNotFoundError(path)
    if got == -2:
        return None  # nothing parseable: defer to the tolerant Python parser
    return (u[:got], i[:got], r[:got])


def parse_ratings_ts_native(path: str, sep: str):
    """4-column variant of parse_ratings_native: also returns the
    timestamp column as int64 (0 where the file has no 4th field)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ycnr_parse_ratings_ts"):
        return None  # no toolchain, or a pre-ts shipped .so
    n = lib.ycnr_count_rows(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    u = np.empty(n, np.int32)
    i = np.empty(n, np.int32)
    r = np.empty(n, np.float32)
    t = np.empty(n, np.int64)
    sep_mode = 1 if sep == "::" else 0
    got = lib.ycnr_parse_ratings_ts(path.encode(), sep.encode(), sep_mode, n,
                                    _ptr(u, ctypes.c_int32),
                                    _ptr(i, ctypes.c_int32),
                                    _ptr(r, ctypes.c_float),
                                    _ptr(t, ctypes.c_int64))
    if got == -1:
        raise FileNotFoundError(path)
    if got == -2:
        return None
    return (u[:got], i[:got], r[:got], t[:got])


def pack_rows_native(src_start, src_cnt, o_sorted, r_sorted, out_oi,
                     out_r) -> bool:
    """Row-major bucket fill in C++ (bucketed layout). False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n, R = out_oi.shape[0], out_oi.shape[1]
    assert len(src_start) == len(src_cnt) and len(src_start) <= n
    if len(src_cnt):
        # bound-check BEFORE the native memcpy: a miscomputed rung would
        # otherwise corrupt the heap instead of raising here
        assert int(np.max(src_cnt)) <= R, (int(np.max(src_cnt)), R)
        assert int(np.max(np.asarray(src_start) + np.asarray(src_cnt))) \
            <= len(o_sorted)
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
    starts = np.asarray(starts)
    if len(block_of):
        spans = starts[1:] - starts[:-1]
        nb_cb = out_seg.size  # NB * C_B chunk slots total
        assert int(spans.max(initial=0)) <= C_B * L
        assert int(starts[-1]) <= len(o_sorted)
        assert int(np.max(block_of)) * C_B * L < out_oi.size
        assert nb_cb * L == out_oi.size
    lib.ycnr_pack_chunks(
        _ptr(starts, ctypes.c_int64), _ptr(block_of, ctypes.c_int32),
        _ptr(slot_of, ctypes.c_int32), _ptr(chunk_base, ctypes.c_int32),
        len(block_of), _ptr(o_sorted, ctypes.c_int32),
        _ptr(r_sorted, ctypes.c_float), C_B, L,
        _ptr(out_oi.reshape(-1), ctypes.c_int32),
        _ptr(out_r.reshape(-1), ctypes.c_float),
        _ptr(out_seg.reshape(-1), ctypes.c_int32))
    return True


def pack_bits_native(u, i, n_users: int, n_items: int):
    """Packed rated-set bitfield [(n_users+1), ceil(n_items/32)] uint32 via
    the C++ loop, or None to fall back to np.bitwise_or.at (~10x slower at
    20M rows). u/i must already be validated in-range int32/any-int."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ycnr_pack_bits"):
        return None
    u = np.ascontiguousarray(u, np.int32)
    i = np.ascontiguousarray(i, np.int32)
    # the C loop does no bounds checks — mirror the NumPy fallback's
    # IndexError instead of silently corrupting the heap
    if len(u) and (int(u.min()) < 0 or int(u.max()) > int(n_users)
                   or int(i.min()) < 0 or int(i.max()) >= int(n_items)):
        raise IndexError(
            f"pack_bits: ids out of range (users 0..{n_users}, items "
            f"0..{int(n_items) - 1})")
    W = (int(n_items) + 31) // 32
    bits = np.zeros((int(n_users) + 1, W), np.uint32)
    lib.ycnr_pack_bits(_ptr(u, ctypes.c_int32), _ptr(i, ctypes.c_int32),
                       len(u), W,
                       bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return bits
