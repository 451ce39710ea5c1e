"""Native C++ graph builder vs numpy semantics."""
import numpy as np
import pytest

from lgcnhs_tpu.native import bindings


def test_native_library_compiles():
    assert bindings.available(), "g++ build of graph_builder.cc failed"


def test_parse_edges_csv(tmp_path):
    path = tmp_path / "edges.csv"
    path.write_text("user_id,item_id,rating,ts\n1,5,3,100\n2,7,4,200\n10,0,5,300\n")
    users, items = bindings.parse_edges_csv(str(path))
    np.testing.assert_array_equal(users, [1, 2, 10])
    np.testing.assert_array_equal(items, [5, 7, 0])


def test_parse_edges_tsv(tmp_path):
    path = tmp_path / "u.data"
    path.write_text("196\t242\t3\t881250949\n186\t302\t3\t891717742\n")
    users, items = bindings.parse_edges_csv(str(path), sep="\t")
    np.testing.assert_array_equal(users, [196, 186])
    np.testing.assert_array_equal(items, [242, 302])


def test_count_degrees_matches_bincount():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 500, 200_000).astype(np.int32)
    got = bindings.count_degrees(idx, 500)
    np.testing.assert_array_equal(got, np.bincount(idx, minlength=500))


def test_build_csr_dedup_sorted():
    rows = np.array([2, 0, 2, 1, 2, 0], dtype=np.int32)
    cols = np.array([3, 1, 3, 0, 1, 1], dtype=np.int32)
    indptr, indices = bindings.build_csr(rows, cols, 3)
    np.testing.assert_array_equal(indptr, [0, 1, 2, 4])
    np.testing.assert_array_equal(indices, [1, 0, 1, 3])


def test_build_csr_matches_numpy_fallback():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 200, 5000).astype(np.int32)
    cols = rng.integers(0, 300, 5000).astype(np.int32)
    got_ptr, got_idx = bindings.build_csr(rows, cols, 200)
    # force the numpy fallback path
    import lgcnhs_tpu.native.bindings as b

    lib, b._lib = b._lib, None
    tried, b._tried = b._tried, True
    try:
        want_ptr, want_idx = bindings.build_csr(rows, cols, 200)
    finally:
        b._lib, b._tried = lib, tried
    np.testing.assert_array_equal(got_ptr, want_ptr)
    np.testing.assert_array_equal(got_idx, want_idx)


def test_fill_interaction():
    rows = np.array([0, 1, 1], dtype=np.int32)
    cols = np.array([2, 0, 2], dtype=np.int32)
    A = bindings.fill_interaction(rows, cols, 2, 3)
    np.testing.assert_array_equal(A, [[0, 0, 1], [1, 0, 1]])


def test_parse_rating_rows_multichar_sep(tmp_path):
    """The :: parser must reproduce the pandas python-engine frame exactly
    (the ML-1M ratings.dat fast path, data/movielens1m._read_ratings_dat)."""
    import pandas as pd

    path = tmp_path / "ratings.dat"
    path.write_text(
        "1::1193::5::978300760\n"
        "1::661::3::978302109\n"
        "6040::1090::3::956715518\n"
    )
    got = bindings.parse_rating_rows(str(path), "::")
    assert got is not None
    want = pd.read_csv(
        str(path), sep="::", engine="python", header=None,
        names=["user", "item", "rating", "timestamp"],
    )
    for col, arr in zip(("user", "item", "rating", "timestamp"), got):
        np.testing.assert_array_equal(arr, want[col].to_numpy())


def test_parse_rating_rows_tab_and_header(tmp_path):
    path = tmp_path / "u.data"
    path.write_text("user\titem\trating\tts\n196\t242\t3\t881250949\n")
    got = bindings.parse_rating_rows(str(path), "\t")
    assert got is not None
    np.testing.assert_array_equal(got[0], [196])
    np.testing.assert_array_equal(got[3], [881250949])


def test_parse_rating_rows_malformed_returns_none(tmp_path):
    path = tmp_path / "bad.dat"
    path.write_text("1::2::3\n")  # only 3 fields
    assert bindings.parse_rating_rows(str(path), "::") is None


def test_ml1m_reader_native_equals_pandas(tmp_path, monkeypatch):
    from lgcnhs_tpu.data import movielens1m as m1
    from lgcnhs_tpu.native import bindings as native

    path = tmp_path / "ratings.dat"
    path.write_text("7::11::4::978300760\n8::13::1::978300761\n")
    fast = m1._read_ratings_dat(str(path))
    monkeypatch.setattr(native, "parse_rating_rows", lambda *a: None)
    slow = m1._read_ratings_dat(str(path))
    pd_testing = __import__("pandas").testing
    pd_testing.assert_frame_equal(fast, slow)
