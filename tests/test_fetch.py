"""Dataset acquisition path (VERDICT r1 item 10): checksummed ML-100K fetch
with graceful no-egress degradation, golden-file parse tests for the u.item
edge cases (handleMovielens.py:122-172 semantics), and the full pipeline
driven off a golden raw directory via --data-dir."""
import hashlib
import os
import zipfile

import numpy as np
import pytest

from lgcnhs_tpu.data.fetch import ML100K_FILES, fetch_ml100k, have_ml100k, ml100k_paths

GOLDEN_U_ITEM = (
    # id|title|release|video_release|url|19 genre flags — latin-1 accents,
    # a missing release date, and a title with commas/parentheses
    "1|Toy Story (1995)|01-Jan-1995||http://x|0|0|0|1|1|1|0|0|0|0|0|0|0|0|0|0|0|0|0\n"
    "2|L\xe9on: The Professional (1994)|01-Jan-1994||http://x|0|1|0|0|0|0|1|0|1|0|0|0|0|0|0|0|1|0|0\n"
    "3|unknown||||1|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0\n"
    "4|Things to Do in Denver, Colorado (1969)|01-Jan-1969||http://x|0|0|0|0|0|0|1|0|1|0|0|0|0|0|0|0|0|0|0\n"
)


def _write_golden_ml100k(data_dir, n_users=30, n_items=4, seed=0):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(data_dir, "u.item"), "w", encoding="iso-8859-1") as f:
        f.write(GOLDEN_U_ITEM)
    occs = ["administrator", "artist", "doctor", "educator"]
    with open(os.path.join(data_dir, "u.occupation"), "w") as f:
        f.write("\n".join(occs) + "\n")
    with open(os.path.join(data_dir, "u.user"), "w") as f:
        for u in range(1, n_users + 1):
            f.write(f"{u}|{int(rng.integers(7, 70))}|"
                    f"{'M' if u % 2 else 'F'}|{occs[u % len(occs)]}|55414\n")
    with open(os.path.join(data_dir, "u.data"), "w") as f:
        for u in range(1, n_users + 1):
            for i in range(1, n_items + 1):
                if rng.random() < 0.9:
                    f.write(f"{u}\t{i}\t{int(rng.integers(1, 6))}\t"
                            f"{874965758 + u * 31 + i}\n")
    return data_dir


def test_fetch_no_egress_degrades_to_none(tmp_path):
    out = fetch_ml100k(str(tmp_path), url="http://127.0.0.1:9/nope", timeout=2)
    assert out is None


def test_fetch_from_local_zip_with_checksum(tmp_path):
    src = _write_golden_ml100k(str(tmp_path / "src"))
    zip_path = tmp_path / "ml-100k.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for name in ML100K_FILES.values():
            z.write(os.path.join(src, name), arcname=f"ml-100k/{name}")
    md5 = hashlib.md5(zip_path.read_bytes()).hexdigest()

    dest = str(tmp_path / "dest")
    paths = fetch_ml100k(dest, url=zip_path.as_uri(), md5=md5)
    assert paths is not None
    assert have_ml100k(os.path.join(dest, "ml-100k"))
    assert paths == ml100k_paths(os.path.join(dest, "ml-100k"))
    # second call: already present, no download
    assert fetch_ml100k(dest, url="http://127.0.0.1:9/nope") == paths

    # wrong checksum refuses the archive
    assert fetch_ml100k(str(tmp_path / "d2"), url=zip_path.as_uri(), md5="0" * 32) is None


def test_u_item_golden_edge_cases(tmp_path):
    from lgcnhs_tpu.data.movielens import (
        GENRE_COLUMNS,
        N_YEAR_BUCKETS,
        movielens_item_features,
        read_movielens_raw,
    )

    data_dir = _write_golden_ml100k(str(tmp_path))
    rating, users, occupations, items = read_movielens_raw(ml100k_paths(data_dir))

    # latin-1 title decoded exactly as the reference's encoding= does
    assert items["movie_title"][1] == "L\xe9on: The Professional (1994)"
    # comma-containing title survives the pipe separator
    assert items["movie_title"][3].startswith("Things to Do in Denver")
    # genre flags land in the right named columns
    assert items.loc[0, "Animation"] == 1 and items.loc[0, "Comedy"] == 1
    assert items.loc[2, "unknown"] == 1

    iid_raw, feats = movielens_item_features(items, title_dim=5)
    n_genres = len(GENRE_COLUMNS)
    year_oh = feats[:, n_genres:n_genres + N_YEAR_BUCKETS]
    # 1995 -> bucket 6 (>=1990), 1969 -> bucket 0? no: <1970 -> bucket 1
    from lgcnhs_tpu.data.features import year_bucket

    assert year_oh[0].argmax() == year_bucket(1995) and year_oh[0].max() == 1
    assert year_oh[3].argmax() == year_bucket(1969) and year_oh[3].max() == 1
    # the 'unknown' row has NO release date: astype(str) -> 'nan' -> the
    # reference's yearMap('nan') sentinel bucket 0 (handleFeature.py:39-44)
    assert year_oh[2].argmax() == 0 and year_oh[2].max() == 1


def test_pipeline_end_to_end_on_golden_raw_dir(tmp_path, monkeypatch):
    from lgcnhs_tpu.cli.main import main

    data_dir = _write_golden_ml100k(str(tmp_path / "raw"))
    metrics = main([
        "--dataset", "movielens", "--model", "ProbS", "--env", "dev",
        "--workdir", str(tmp_path / "wd"), "--data-dir", data_dir,
        "--k", "2", "--no-cache",
    ])
    assert set(metrics) == {"P", "R", "F1", "NDCG", "H", "I"}
    assert all(np.isfinite(v) for v in metrics.values())
