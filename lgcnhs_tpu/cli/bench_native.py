"""Native graph-builder micro-benchmark at >=10M-row scale.

Measures the C++ ingestion kernels (native/graph_builder.cc, ctypes-bound)
against their numpy/pandas fallbacks on the same data:

- parse_edges_csv: raw integer-id CSV -> (users, items) arrays
  (reference counterpart: pandas read_csv in ``processing/handleData.py``)
- build_csr: COO -> deduplicated sorted CSR — the structure every
  large-graph stage consumes (``ops/scalable.user_csr``: negative-sampling
  rejection, chunked retrieval masking, CSR hit matrices)

Usage: python -m lgcnhs_tpu.cli.bench_native [--rows 10000000]
Prints one JSON line with the measured seconds and speedups.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def log(msg: str) -> None:
    print(f"[bench_native] {msg}", file=sys.stderr, flush=True)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=10_000_000)
    p.add_argument("--users", type=int, default=500_000)
    p.add_argument("--items", type=int, default=200_000)
    args = p.parse_args(argv)

    from lgcnhs_tpu.native import bindings

    if not bindings.available():
        log("native library unavailable; nothing to compare")
        print(json.dumps({"native": False}))
        return {"native": False}

    rng = np.random.default_rng(0)
    users = rng.integers(0, args.users, args.rows).astype(np.int32)
    items = rng.integers(0, args.items, args.rows).astype(np.int32)

    out = {"native": True, "rows": args.rows}

    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False
    ) as f:
        f.write("user_id,item_id\n")
        np.savetxt(f, np.stack([users, items], axis=1), fmt="%d", delimiter=",")
        csv_path = f.name
    try:
        log(f"csv: {os.path.getsize(csv_path) / 1e6:.0f} MB")
        t0 = time.perf_counter()
        nu, ni = bindings.parse_edges_csv(csv_path)
        t_native = time.perf_counter() - t0
        assert len(nu) == args.rows

        import pandas as pd

        t0 = time.perf_counter()
        df = pd.read_csv(csv_path, usecols=[0, 1])
        pu = df.iloc[:, 0].to_numpy(np.int32)
        t_pandas = time.perf_counter() - t0
        np.testing.assert_array_equal(nu, pu)
        out["parse_native_s"] = round(t_native, 3)
        out["parse_pandas_s"] = round(t_pandas, 3)
        out["parse_speedup"] = round(t_pandas / t_native, 2)
        log(f"parse: native {t_native:.2f}s vs pandas {t_pandas:.2f}s "
            f"({t_pandas / t_native:.1f}x)")
    finally:
        os.unlink(csv_path)

    # ML-1M-style ::-separated rating rows (pandas needs its slow python
    # engine for multi-char separators; the native parser is one pass)
    ratings = rng.integers(1, 6, args.rows).astype(np.int32)
    stamps = rng.integers(9e8, 1e9, args.rows).astype(np.int32)
    with tempfile.NamedTemporaryFile("w", suffix=".dat", delete=False) as f:
        np.savetxt(
            f, np.stack([users, items, ratings, stamps], axis=1),
            fmt="%d", delimiter="::",
        )
        dat_path = f.name
    try:
        log(f"ratings.dat: {os.path.getsize(dat_path) / 1e6:.0f} MB")
        t0 = time.perf_counter()
        parsed = bindings.parse_rating_rows(dat_path, "::")
        t_native = time.perf_counter() - t0
        assert parsed is not None and len(parsed[0]) == args.rows
        t0 = time.perf_counter()
        df = pd.read_csv(
            dat_path, sep="::", engine="python", header=None,
            names=["user", "item", "rating", "timestamp"],
        )
        t_pandas = time.perf_counter() - t0
        np.testing.assert_array_equal(parsed[0], df["user"].to_numpy(np.int32))
        np.testing.assert_array_equal(parsed[3], df["timestamp"].to_numpy(np.int32))
        out["ratings_native_s"] = round(t_native, 3)
        out["ratings_pandas_py_s"] = round(t_pandas, 3)
        out["ratings_speedup"] = round(t_pandas / t_native, 2)
        log(f"parse_rating_rows: native {t_native:.2f}s vs pandas(python) "
            f"{t_pandas:.2f}s ({t_pandas / t_native:.1f}x)")
    finally:
        os.unlink(dat_path)

    t0 = time.perf_counter()
    indptr_n, idx_n = bindings.build_csr(users, items, args.users)
    t_native = time.perf_counter() - t0

    # the numpy fallback, forced
    t0 = time.perf_counter()
    order = np.lexsort((items, users))
    r, c = users[order], items[order]
    keep = np.ones(r.shape[0], dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[keep], c[keep]
    indptr_f = np.zeros(args.users + 1, dtype=np.int64)
    np.add.at(indptr_f, r + 1, 1)
    np.cumsum(indptr_f, out=indptr_f)
    t_numpy = time.perf_counter() - t0

    np.testing.assert_array_equal(indptr_n, indptr_f)
    np.testing.assert_array_equal(idx_n, c.astype(np.int32))
    out["csr_native_s"] = round(t_native, 3)
    out["csr_numpy_s"] = round(t_numpy, 3)
    out["csr_speedup"] = round(t_numpy / t_native, 2)
    log(f"build_csr: native {t_native:.2f}s vs numpy {t_numpy:.2f}s "
        f"({t_numpy / t_native:.1f}x)")

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
