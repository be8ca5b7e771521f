"""ctypes bindings for the native ingest library (libkgt_ingest.so).

The native path is the production route for host-side ingest (counting,
strand merge, union, table build); every function has a NumPy fallback in
kmersgwas_tpu/ingest, and outputs are byte-identical — tests/test_native.py
cross-checks them. Build with `make -C kmersgwas_tpu/native` (auto-attempted
on first use).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libkgt_ingest.so")
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        _build()
    if not os.path.exists(_LIB_PATH):
        raise NativeUnavailable("libkgt_ingest.so not built")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kgt_count.restype = ctypes.c_longlong
    lib.kgt_count.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                              ctypes.c_uint, ctypes.c_int, ctypes.c_ulonglong,
                              ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_ulonglong]
    lib.kgt_strand_merge.restype = ctypes.c_longlong
    lib.kgt_strand_merge.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_uint, ctypes.c_char_p]
    lib.kgt_list_union.restype = ctypes.c_longlong
    lib.kgt_list_union.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                   ctypes.c_int, ctypes.c_uint,
                                   ctypes.c_ulonglong, ctypes.c_double,
                                   ctypes.c_char_p]
    lib.kgt_list_union_stats.restype = ctypes.c_longlong
    lib.kgt_list_union_stats.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                         ctypes.c_int, ctypes.c_uint,
                                         ctypes.c_ulonglong, ctypes.c_double,
                                         ctypes.c_char_p, ctypes.c_int]
    lib.kgt_build_table.restype = ctypes.c_longlong
    lib.kgt_build_table.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_uint]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def count(paths, k: int, canonize: bool, min_count: int, out_path,
          tmpdir: str = "/tmp", max_mem_kmers: int = 1 << 27) -> int:
    lib = load()
    n = lib.kgt_count(_paths_array(paths), len(paths), k, int(canonize),
                      min_count, str(out_path).encode(), tmpdir.encode(),
                      max_mem_kmers)
    if n < 0:
        raise RuntimeError(f"kgt_count failed ({n})")
    return n


def strand_merge(canon_path, non_canon_path, k: int, out_path) -> int:
    lib = load()
    n = lib.kgt_strand_merge(str(canon_path).encode(),
                             str(non_canon_path).encode(), k,
                             str(out_path).encode())
    if n == -2:
        raise ValueError("canonized k-mers without orientation evidence "
                         "(non-canonized counts must use min_count=1)")
    if n < 0:
        raise RuntimeError(f"kgt_strand_merge failed ({n})")
    return n


def list_union(paths, k: int, mac: int, min_strand_frac: float, out_path,
               write_stats: bool = False) -> int:
    lib = load()
    n = lib.kgt_list_union_stats(_paths_array(paths), len(paths), k, mac,
                                 min_strand_frac, str(out_path).encode(),
                                 1 if write_stats else 0)
    if n < 0:
        raise RuntimeError(f"kgt_list_union failed ({n})")
    return n


def build_table(list_paths, names, master_path, out_base, k: int) -> int:
    from ..core import formats
    lib = load()
    n = lib.kgt_build_table(_paths_array(list_paths), len(list_paths),
                            str(master_path).encode(),
                            (str(out_base) + ".table").encode(), k)
    if n < 0:
        raise RuntimeError(f"kgt_build_table failed ({n})")
    formats.write_names(out_base, names)
    return n


def _bind_squeeze(lib):
    import numpy as _np
    if getattr(lib, "_squeeze_bound", False):
        return
    lib.kgt_squeeze_pack.restype = ctypes.c_longlong
    lib.kgt_squeeze_pack.argtypes = [
        ctypes.POINTER(ctypes.c_ulonglong), ctypes.c_longlong, ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int, ctypes.c_int,
        ctypes.c_ulonglong, ctypes.POINTER(ctypes.c_ulonglong),
        ctypes.POINTER(ctypes.c_uint), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_ubyte)]
    lib._squeeze_bound = True


def squeeze_pack(raw, file_col, n_used: int, w32: int, min_count: int):
    """Native squeeze+pack of raw table rows.

    raw: (R, 1+wf) uint64 contiguous; file_col: (n_used,) int64.
    -> (kmers (R,), packed (R, w32) uint32, popcnt (R,) int32, keep (R,) bool)
    """
    import numpy as np
    lib = load()
    _bind_squeeze(lib)
    raw = np.ascontiguousarray(raw, dtype=np.uint64)
    file_col = np.ascontiguousarray(file_col, dtype=np.int64)
    r = raw.shape[0]
    wf = raw.shape[1] - 1
    kmers = np.empty(r, dtype=np.uint64)
    packed = np.empty((r, w32), dtype=np.uint32)
    pop = np.empty(r, dtype=np.int32)
    keep = np.empty(r, dtype=np.uint8)
    rc = lib.kgt_squeeze_pack(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_ulonglong)), r, wf,
        file_col.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n_used, w32, min_count,
        kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_ulonglong)),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint)),
        pop.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc < 0:
        raise RuntimeError("kgt_squeeze_pack failed")
    return kmers, packed, pop, keep.astype(bool)
