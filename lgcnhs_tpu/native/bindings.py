"""ctypes bindings for the native graph-builder with lazy self-compilation.

No pybind11 in this image, so the C++ library exposes a C ABI and is loaded
with ctypes. The shared object is compiled on first use (g++ -O3) and cached
next to the source; every entry point has a numpy fallback so the package
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_builder.cc")
_LIB_PATH = os.path.join(_HERE, "libgraph_builder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        _SRC, "-o", _LIB_PATH, "-pthread",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.parse_edges_csv.restype = ctypes.c_int64
            lib.parse_edges_csv.argtypes = [
                ctypes.c_char_p, ctypes.c_char, i32p, i32p, ctypes.c_int64,
            ]
            lib.parse_rating_rows.restype = ctypes.c_int64
            lib.parse_rating_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, i32p, i32p, i32p, i32p,
                ctypes.c_int64,
            ]
            lib.count_degrees.restype = None
            lib.count_degrees.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i64p]
            lib.build_csr.restype = ctypes.c_int64
            lib.build_csr.argtypes = [
                i32p, i32p, ctypes.c_int64, ctypes.c_int32, i64p, i32p,
            ]
            lib.fill_interaction.restype = None
            lib.fill_interaction.argtypes = [
                i32p, i32p, ctypes.c_int64, ctypes.c_int32, f32p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _as_i32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def parse_edges_csv(path: str, sep: str = ",") -> Tuple[np.ndarray, np.ndarray]:
    """(users, items) int32 arrays from an integer-id CSV. Falls back to
    numpy.loadtxt-free pandas-free parsing via np.genfromtxt when the native
    library is unavailable."""
    lib = _load()
    if lib is not None:
        capacity = max(1024, os.path.getsize(path) // 4)
        users = np.empty(capacity, dtype=np.int32)
        items = np.empty(capacity, dtype=np.int32)
        n = lib.parse_edges_csv(
            path.encode(),
            sep.encode(),
            users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            capacity,
        )
        if n >= 0:
            return users[:n].copy(), items[:n].copy()
    import pandas as pd

    df = pd.read_csv(path, sep=sep, usecols=[0, 1], header=0)
    return (
        df.iloc[:, 0].to_numpy(np.int32),
        df.iloc[:, 1].to_numpy(np.int32),
    )


def parse_rating_rows(path: str, sep: str) -> Optional[Tuple[np.ndarray, ...]]:
    """(users, items, ratings, timestamps) int32 arrays from an all-integer
    rating file with a possibly MULTI-character separator — covers ML-100K's
    tab-separated ``u.data`` and ML-1M's ``::``-separated ``ratings.dat``
    (the latter needs pandas' slow python engine otherwise). Returns None
    when the native library is unavailable or the file doesn't fit the
    4-integer-column shape (callers fall back to pandas)."""
    lib = _load()
    if lib is None:
        return None
    capacity = max(1024, os.path.getsize(path) // 8)
    cols = [np.empty(capacity, dtype=np.int32) for _ in range(4)]
    n = lib.parse_rating_rows(
        path.encode(),
        sep.encode(),
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for c in cols],
        capacity,
    )
    if n < 0:
        return None
    return tuple(c[:n].copy() for c in cols)


def count_degrees(idx: np.ndarray, size: int) -> np.ndarray:
    lib = _load()
    idx = _as_i32(idx)
    if lib is not None:
        out = np.zeros(size, dtype=np.int64)
        lib.count_degrees(
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idx.shape[0],
            size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    return np.bincount(idx, minlength=size).astype(np.int64)


def build_csr(
    rows: np.ndarray, cols: np.ndarray, n_rows: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicated CSR (indptr int64 (n_rows+1), indices int32) from COO."""
    rows = _as_i32(rows)
    cols = _as_i32(cols)
    lib = _load()
    if lib is not None:
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        indices = np.empty(rows.shape[0], dtype=np.int32)
        n = lib.build_csr(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows.shape[0],
            n_rows,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return indptr, indices[:n].copy()
    # numpy fallback: lexsort + unique
    order = np.lexsort((cols, rows))
    r, c = rows[order], cols[order]
    keep = np.ones(r.shape[0], dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[keep], c[keep]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr, r + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, c.astype(np.int32)


def fill_interaction(
    rows: np.ndarray, cols: np.ndarray, n_rows: int, n_cols: int
) -> np.ndarray:
    rows = _as_i32(rows)
    cols = _as_i32(cols)
    lib = _load()
    out = np.zeros((n_rows, n_cols), dtype=np.float32)
    if lib is not None:
        lib.fill_interaction(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rows.shape[0],
            n_cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    else:
        out[rows, cols] = 1.0
    return out
