"""Real-dataset ingestion paths, driven with format-faithful raw files."""
import dataclasses

import numpy as np
import pandas as pd
import pytest

from lgcnhs_tpu.config import load_config


def _write_ml100k(tmp_path):
    """Write tiny files in the exact ML-100K distribution format
    (processing/handleMovielens.py:122-172)."""
    rng = np.random.default_rng(0)
    n_users, n_items = 12, 20
    # u.data: tab-separated user item rating timestamp
    rows = []
    for u in range(1, n_users + 1):
        items = rng.choice(n_items, size=rng.integers(3, 10), replace=False) + 1
        for i in items:
            rows.append(f"{u}\t{i}\t{rng.integers(1,6)}\t{874000000 + u * 1000 + i}")
    (tmp_path / "u.data").write_text("\n".join(rows) + "\n")
    # u.user: user_id|age|gender|occupation|zip
    occs = ["engineer", "student", "artist"]
    (tmp_path / "u.user").write_text(
        "\n".join(
            f"{u}|{rng.integers(15,70)}|{'MF'[int(rng.integers(0,2))]}|{occs[u % 3]}|90210"
            for u in range(1, n_users + 1)
        )
        + "\n"
    )
    (tmp_path / "u.occupation").write_text("\n".join(occs) + "\n")
    # u.item: id|title|date|video_date|url|19 genre flags
    items = []
    for i in range(1, n_items + 1):
        flags = "|".join(str(int(rng.random() < 0.2)) for _ in range(19))
        items.append(f"{i}|Movie Title {i} (199{i % 10})|01-Jan-199{i % 10}|||{flags}")
    (tmp_path / "u.item").write_text("\n".join(items) + "\n", encoding="iso-8859-1")
    return {
        "rating": str(tmp_path / "u.data"),
        "users": str(tmp_path / "u.user"),
        "items": str(tmp_path / "u.item"),
        "occupation": str(tmp_path / "u.occupation"),
    }


def test_movielens_ingestion(tmp_path):
    from lgcnhs_tpu.data.movielens import prepare_movielens

    paths = _write_ml100k(tmp_path)
    cfg = load_config(env="dev", dataset="movielens", model="HybridS")
    cfg = cfg.replace(
        preprocessing=dataclasses.replace(cfg.preprocessing, dataset_paths=paths)
    )
    splits, uf, itf = prepare_movielens(cfg, save_path=str(tmp_path / "out"))
    assert splits.n_users == 12
    assert uf.shape[0] == splits.n_users
    assert itf.shape[0] == splits.n_items
    # user features: gender(1) + age one-hot(7) + occupation one-hot(3)
    assert uf.shape[1] == 1 + 7 + 3
    # item features: 19 genres + 7 year buckets (yearMap 0..6) + 5-d title
    assert itf.shape[1] == 19 + 7 + 5
    assert np.isfinite(uf).all() and np.isfinite(itf).all()
    # artifacts written
    for name in ("filter_rating", "train_data", "user_features", "item_features"):
        assert (tmp_path / "out" / f"{name}.csv").exists()


def _write_douban(tmp_path):
    rng = np.random.default_rng(1)
    users = pd.DataFrame(
        {
            "USER_MD5": [f"md5_{u:03d}" for u in range(15)],
            "USER_NICKNAME": [f"nick user {u}" for u in range(15)],
        }
    )
    movies = pd.DataFrame(
        {
            "MOVIE_ID": list(range(100, 125)),
            "NAME": [f"Film {i}" for i in range(25)],
            "GENRES": ["剧情/喜剧" if i % 2 else "动作" for i in range(25)],
            "LANGUAGES": ["汉语普通话/英语"] * 25,
            "REGIONS": ["中国大陆/美国"] * 25,
            "MINS": [0.0 if i % 7 == 0 else 80 + i for i in range(25)],
            "YEAR": [1990 + (i % 30) for i in range(25)],
            "STORYLINE": [f"story about thing {i}" for i in range(25)],
            "OFFICIAL_SITE": [""] * 25,
            "DOUBAN_SCORE": [7.0] * 25,
            "DIRECTORS": [""] * 25,
            "DOUBAN_VOTES": [10] * 25,
            "ALIAS": [""] * 25,
            "ACTORS": [""] * 25,
            "COVER": [""] * 25,
            "IMDB_ID": [""] * 25,
            "ACTOR_IDS": [""] * 25,
            "DIRECTOR_IDS": [""] * 25,
            "RELEASE_DATE": [""] * 25,
            "TAGS": [""] * 25,
            "SLUG": [""] * 25,
        }
    )
    ratings = []
    for u in users["USER_MD5"]:
        for m in rng.choice(movies["MOVIE_ID"], size=8, replace=False):
            ratings.append(
                {"USER_MD5": u, "MOVIE_ID": m, "RATING": int(rng.integers(1, 6)),
                 "RATING_TIME": "2019-01-01 00:00:00"}
            )
    # plus some ratings for unknown movies that must be dropped
    ratings.append({"USER_MD5": "md5_000", "MOVIE_ID": 999, "RATING": 5,
                    "RATING_TIME": "2019-01-01 00:00:00"})
    ratings = pd.DataFrame(ratings)
    users.to_csv(tmp_path / "users.csv", index=False)
    movies.to_csv(tmp_path / "movies.csv", index=False)
    ratings.to_csv(tmp_path / "ratings.csv", index=False)
    return {
        "users": str(tmp_path / "users.csv"),
        "items": str(tmp_path / "movies.csv"),
        "rating": str(tmp_path / "ratings.csv"),
    }


def test_douban_ingestion(tmp_path):
    from lgcnhs_tpu.data.douban import prepare_douban

    paths = _write_douban(tmp_path)
    cfg = load_config(env="dev", dataset="douban", model="HybridS")
    # widen the quantile band so the tiny dataset keeps all users
    cfg = cfg.replace(
        preprocessing=dataclasses.replace(
            cfg.preprocessing,
            dataset_paths=paths,
            quantile_start=1.0,
            quantile_end=0.0,
        )
    )
    splits, uf, itf = prepare_douban(cfg, save_path=str(tmp_path / "out"))
    assert splits.n_users == 15
    # unknown movie dropped (handleDouban.py:182-183)
    assert splits.n_items <= 25
    assert uf.shape == (splits.n_users, 3)  # nickname embedding dim 3
    # item features: name(3) + genres + langs + duration(6) + story(20) +
    # regions + year(6)
    assert itf.shape[0] == splits.n_items
    assert itf.shape[1] >= 3 + 1 + 1 + 6 + 20 + 1 + 6
    assert np.isfinite(itf).all()


def test_douban_missing_year_and_fractional_duration():
    """ADVICE round-1 regression: missing YEAR -> fillna(0) -> yearMap(0) ->
    bucket 1 (handleDouban.py:112-113), and durationMap is applied to the
    FLOAT mean-imputed duration (handleDouban.py:108-110), not a truncation."""
    from lgcnhs_tpu.data.douban import douban_item_features
    from lgcnhs_tpu.data.features import duration_bucket

    items = pd.DataFrame(
        {
            "MOVIE_ID": [1, 2, 3],
            "NAME": ["a film", "b film", "c film"],
            "GENRES": ["剧情", "喜剧", "动作"],
            "LANGUAGES": ["英语"] * 3,
            "REGIONS": ["美国"] * 3,
            # nonzero mean = 90.5: float buckets to (90,120] (index 3), an
            # int() truncation would bucket 90 into (60,90] (index 2)
            "MINS": [0.0, 90.0, 91.0],
            "YEAR": [np.nan, 1995, 2011],
            "STORYLINE": ["s"] * 3,
        }
    )
    _, feats = douban_item_features(items, title_dim=3, content_dim=20)
    # layout: name(3) + genres(3) + langs(1) + duration(6) + story(20) +
    # regions(1) + year(6; codes 1..6 at columns 0..5)
    year_oh = feats[:, -6:]
    assert year_oh[0].argmax() == 0 and year_oh[0].sum() == 1
    assert year_oh[1].argmax() == 3  # 1995 in [1990, 2000) -> code 4
    assert year_oh[2].argmax() == 5  # >= 2010 -> code 6
    dur_oh = feats[:, 3 + 3 + 1 : 3 + 3 + 1 + 6]
    assert duration_bucket(90.5) == 3
    assert dur_oh[0].argmax() == 3  # imputed float mean 90.5
    assert dur_oh[1].argmax() == 2  # true 90 stays (60,90]


def test_douban_cleaning_maps_and_code_blocks():
    """Pins the reference cleaning-map semantics (handleFeature.py:62-144)
    inside douban_item_features: genres normalized through genreCleanMap
    before multi-hot (動畫/Animation/动画 collapse to ONE column), languages
    and regions collapse to int-code blocks over {1,2,3} (汉语普通话=1 /
    英语=2 / other=3; 中国大陆=1 / 美国=2 / other=3), and empty cells produce
    the '' genre class / code-3 language+region (the split yields [''], so
    the maps' 0 sentinel is unreachable — see features.language_codes)."""
    from lgcnhs_tpu.data.douban import douban_item_features
    from lgcnhs_tpu.data.features import clean_genres, language_codes, region_codes

    assert clean_genres(["動畫", "Animation", "动画", "unknown", ""]) == [
        "动画", "动画", "动画", "unknown", ""
    ]
    assert language_codes(["汉语普通话", "英语", "法语"]) == [1, 2, 3]
    assert language_codes([""]) == [3]
    assert language_codes([]) == [0]
    assert region_codes(["中国大陆", "美国", "法国"]) == [1, 2, 3]
    assert region_codes([]) == [0]

    items = pd.DataFrame(
        {
            "MOVIE_ID": [1, 2, 3, 4],
            "NAME": ["a", "b", "c", "d"],
            "GENRES": ["動畫/Animation", "动画", "", "Comedy/喜剧"],
            "LANGUAGES": ["汉语普通话/英语", "英语", "", "法语|德语"],
            "REGIONS": ["中国大陆", "美国", "", "法国/日本"],
            "MINS": [80.0, 90.0, 100.0, 110.0],
            "YEAR": [1995, 2000, 2005, 2011],
            "STORYLINE": ["s"] * 4,
        }
    )
    _, feats = douban_item_features(items, title_dim=3, content_dim=20)
    # genre vocab after cleaning: ['', 动画, 喜剧] (sorted, '' first)
    g = feats[:, 3:6]
    np.testing.assert_array_equal(
        g, [[0, 1, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1]]
    )
    # language codes present: {1,2,3} -> 3-wide block
    l = feats[:, 6:9]
    np.testing.assert_array_equal(
        l, [[1, 1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]]
    )
    # region codes present: {1,2,3} -> 3-wide block after duration+story
    r = feats[:, 9 + 6 + 20 : 9 + 6 + 20 + 3]
    np.testing.assert_array_equal(
        r, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]]
    )
