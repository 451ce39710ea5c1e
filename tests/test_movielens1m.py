"""MovieLens-1M ingestion (VERDICT r2 item 1): the ``::``-separated .dat
schema, feature semantics mirroring the 100K analog, checksummed fetch, and
the full pipeline driven off a golden raw directory via --data-dir."""
import hashlib
import os
import zipfile

import numpy as np

from lgcnhs_tpu.data.fetch import ML1M_FILES, fetch_ml1m, have_ml1m, ml1m_paths
from lgcnhs_tpu.data.movielens1m import (
    GENRES_1M,
    N_OCCUPATIONS_1M,
    ml1m_item_features,
    ml1m_user_features,
    read_movielens1m_raw,
    title_year,
)

GOLDEN_MOVIES = (
    # MovieID::Title::Genres — latin-1 accents, multi-genre pipes, a title
    # with commas AND a colon, and one without a trailing year
    "1::Toy Story (1995)::Animation|Children's|Comedy\n"
    "2::L\xe9on: The Professional (1994)::Crime|Drama|Thriller\n"
    "3::Things to Do in Denver, When You're Dead (1995)::Crime|Drama|Romance\n"
    "4::Mystery Film::Mystery\n"
)

GOLDEN_USERS_HEAD = (
    # UserID::Gender::Age::Occupation::Zip — 1M age category codes
    "1::F::1::10::48067\n"
    "2::M::56::16::70072\n"
    "3::M::25::15::55117\n"
)


def _write_golden_ml1m(data_dir, n_users=30, n_items=4, seed=0):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(data_dir, "movies.dat"), "w", encoding="iso-8859-1") as f:
        f.write(GOLDEN_MOVIES)
    ages = [1, 18, 25, 35, 45, 50, 56]
    with open(os.path.join(data_dir, "users.dat"), "w") as f:
        f.write(GOLDEN_USERS_HEAD)
        for u in range(4, n_users + 1):
            f.write(f"{u}::{'M' if u % 2 else 'F'}::{ages[u % 7]}::"
                    f"{u % N_OCCUPATIONS_1M}::55414\n")
    with open(os.path.join(data_dir, "ratings.dat"), "w") as f:
        for u in range(1, n_users + 1):
            for i in range(1, n_items + 1):
                if rng.random() < 0.9:
                    f.write(f"{u}::{i}::{int(rng.integers(1, 6))}::"
                            f"{978300760 + u * 31 + i}\n")
    return data_dir


def test_read_raw_schema_edge_cases(tmp_path):
    data_dir = _write_golden_ml1m(str(tmp_path))
    rating, users, movies = read_movielens1m_raw(ml1m_paths(data_dir))

    assert list(rating.columns) == ["user", "item", "rating", "timestamp"]
    assert rating["user"].dtype.kind == "i" and rating["rating"].max() <= 5
    # latin-1 title with an internal colon survives the :: separator
    assert movies["movie_title"][1] == "L\xe9on: The Professional (1994)"
    assert movies["movie_title"][2].startswith("Things to Do in Denver,")
    assert users.loc[0, "gender"] == "F" and int(users.loc[1, "age"]) == 56


def test_item_features_semantics(tmp_path):
    data_dir = _write_golden_ml1m(str(tmp_path))
    _, _, movies = read_movielens1m_raw(ml1m_paths(data_dir))
    iid_raw, feats = ml1m_item_features(movies, title_dim=5)

    n_genres = len(GENRES_1M)
    assert feats.shape == (4, n_genres + 7 + 5)
    genre = feats[:, :n_genres]
    # Toy Story: Animation + Children's + Comedy flags, nothing else
    want = np.zeros(n_genres)
    for g in ("Animation", "Children's", "Comedy"):
        want[GENRES_1M.index(g)] = 1
    np.testing.assert_array_equal(genre[0], want)

    from lgcnhs_tpu.data.features import year_bucket

    year_oh = feats[:, n_genres:n_genres + 7]
    assert year_oh[0].argmax() == year_bucket(1995) and year_oh[0].sum() == 1
    # no trailing "(YYYY)" -> the yearMap sentinel bucket 0
    assert title_year("Mystery Film") == 0
    assert year_oh[3].argmax() == 0 and year_oh[3].sum() == 1
    # title embeddings are non-zero and deterministic
    _, feats2 = ml1m_item_features(movies, title_dim=5)
    np.testing.assert_array_equal(feats, feats2)
    assert np.abs(feats[:, -5:]).sum() > 0


def test_user_features_semantics(tmp_path):
    data_dir = _write_golden_ml1m(str(tmp_path))
    _, users, _ = read_movielens1m_raw(ml1m_paths(data_dir))
    uid_raw, feats = ml1m_user_features(users)

    assert feats.shape[1] == 1 + 7 + N_OCCUPATIONS_1M
    # user 1: F, age code 1 -> ageMap bucket 1, occupation 10
    assert feats[0, 0] == 0
    from lgcnhs_tpu.data.features import age_bucket

    assert feats[0, 1:8].argmax() == age_bucket(1) and feats[0, 1:8].sum() == 1
    assert feats[0, 8:].argmax() == 10 and feats[0, 8:].sum() == 1
    # user 2: M, age code 56 -> ageMap bucket 6
    assert feats[1, 0] == 1
    assert feats[1, 1:8].argmax() == age_bucket(56)


def test_fetch_ml1m_from_local_zip(tmp_path):
    src = _write_golden_ml1m(str(tmp_path / "src"))
    zip_path = tmp_path / "ml-1m.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for name in ML1M_FILES.values():
            z.write(os.path.join(src, name), arcname=f"ml-1m/{name}")
    md5 = hashlib.md5(zip_path.read_bytes()).hexdigest()

    dest = str(tmp_path / "dest")
    paths = fetch_ml1m(dest, url=zip_path.as_uri(), md5=md5)
    assert paths is not None
    assert have_ml1m(os.path.join(dest, "ml-1m"))
    assert paths == ml1m_paths(os.path.join(dest, "ml-1m"))
    # wrong checksum refuses the archive
    assert fetch_ml1m(str(tmp_path / "d2"), url=zip_path.as_uri(), md5="0" * 32) is None
    # no egress degrades to None
    assert fetch_ml1m(str(tmp_path / "d3"), url="http://127.0.0.1:9/nope", timeout=2) is None


def test_pipeline_end_to_end_on_golden_raw_dir(tmp_path):
    from lgcnhs_tpu.cli.main import main

    data_dir = _write_golden_ml1m(str(tmp_path / "raw"))
    metrics = main([
        "--dataset", "movielens1m", "--model", "SpreadLightGCNOpti", "--env",
        "dev", "--workdir", str(tmp_path / "wd"), "--data-dir", data_dir,
        "--k", "2", "--epochs", "3", "--no-cache",
    ])
    assert set(metrics) >= {"P", "R", "F1", "NDCG", "H", "I"}
    assert all(
        np.isfinite(v) for k, v in metrics.items()
        if k in {"P", "R", "F1", "NDCG", "H", "I"}
    )


def test_synthetic_fallback_uses_ml1m_scale():
    from lgcnhs_tpu.config import load_config

    cfg = load_config(dataset="movielens1m")
    assert cfg.synthetic_users == 6040
    assert cfg.synthetic_items == 3706
    assert cfg.synthetic_interactions == 1_000_209


def test_spread_quirks_inherited_from_movielens():
    from lgcnhs_tpu.models.spread import resolve_spread_variant

    assert resolve_spread_variant("ProbS", "movielens1m", 0.5) == \
        resolve_spread_variant("ProbS", "movielens", 0.5)
    assert resolve_spread_variant("HeatS", "movielens1m", 0.5) == \
        resolve_spread_variant("HeatS", "movielens", 0.5)
