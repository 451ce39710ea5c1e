"""MovieLens-1M ingestion + feature pipeline — the north-star dataset.

The reference ships only the ML-100K pipeline (``processing/handleMovielens.py:
122-172``); its BASELINE protocol, however, targets MovieLens-1M. This module
is the 1M analog of :mod:`lgcnhs_tpu.data.movielens`, built for the 1M
distribution's own schema (all three files are ``::``-separated ``.dat``):

- ``ratings.dat``: UserID::MovieID::Rating::Timestamp
- ``users.dat``:   UserID::Gender::Age::Occupation::Zip-code
  (Age is one of the 7 category codes {1,18,25,35,45,50,56}; Occupation is an
  integer 0..20 — unlike 100K's free-form occupation strings + u.occupation)
- ``movies.dat``:  MovieID::Title::Genres (latin-1; Genres pipe-separated from
  an 18-genre vocabulary — 100K's per-column flags without the "unknown" slot;
  release year is embedded in the title as a trailing "(YYYY)")

Features mirror the 100K analog (``handleMovielens.py:20-104``):
- user = [gender binary, one-hot(ageMap bucket), one-hot(occupation, 21)]
- item = [18 genre flags, one-hot(yearMap bucket), mean-pooled title
  embedding (dim 5)]

The ``ageMap`` buckets (``handleFeature.py:17-36``) are applied to 1M's
category codes: 1->1, 18/25->3, 35->4, 45->5, 50/56->6 (buckets 2 and 7 are
unreachable — faithful reuse of the reference mapping, kept for feature-space
compatibility with the 100K pipeline). Missing/garbled title years hit
yearMap's sentinel bucket 0 (``handleFeature.py:39-44``), same as 100K's
missing release dates.

Rating preprocessing (quantile band, LabelEncoder order, seeded 8:1:1 split,
CSV artifacts) is shared verbatim with 100K via ``data.ratings``.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.features import age_bucket, multi_hot, one_hot, text_embeddings, year_bucket
from lgcnhs_tpu.data.movielens import N_AGE_BUCKETS, N_YEAR_BUCKETS, _remap_features, save_feature_csvs
from lgcnhs_tpu.data.ratings import RatingSplits, prepare_ratings
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer

# The 1M genre vocabulary (README of the ml-1m distribution): ML-100K's 19
# per-column flags minus the "unknown" placeholder column.
GENRES_1M = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]

N_OCCUPATIONS_1M = 21  # integer codes 0..20 (users.dat README)

_YEAR_RE = re.compile(r"\((\d{4})\)\s*$")


def _read_ratings_dat(path: str) -> pd.DataFrame:
    """ratings.dat as a (user, item, rating, timestamp) int64 frame: native
    O(E) parser when available, else pandas' python engine."""
    from lgcnhs_tpu.native import bindings as native

    parsed = native.parse_rating_rows(path, "::")
    if parsed is not None:
        u, i, r, t = (c.astype(np.int64) for c in parsed)
        return pd.DataFrame(
            {"user": u, "item": i, "rating": r, "timestamp": t}
        )
    return pd.read_csv(
        path, sep="::", engine="python", header=None,
        names=["user", "item", "rating", "timestamp"],
    )


def read_movielens1m_raw(paths: Dict[str, str]):
    """Parse the three ``::``-separated .dat files.

    ``sep="::"`` requires pandas' slow python engine, so the 1M-row ratings
    file takes the native C parser fast path when the library is available
    (``native.bindings.parse_rating_rows``; identical frame, pinned by
    tests/test_native.py). movies.dat is latin-1 like 100K's u.item
    (``handleMovielens.py:140-145``). Titles contain commas, colons and
    accents but never the "::" separator.
    """
    rating = _read_ratings_dat(paths["rating"])
    users = pd.read_csv(
        paths["users"], sep="::", engine="python", header=None,
        names=["user_id", "gender", "age", "occupation", "zip_code"],
    )
    movies = pd.read_csv(
        paths["items"], sep="::", engine="python", header=None,
        encoding="iso-8859-1", names=["movie_id", "movie_title", "genres"],
    )
    return rating, users, movies


def title_year(title: str) -> int:
    """yearMap bucket for the trailing "(YYYY)" of a 1M title; the sentinel
    bucket 0 when absent (the 100K missing-release-date analog)."""
    m = _YEAR_RE.search(title)
    return year_bucket(int(m.group(1))) if m else 0


def ml1m_user_features(users: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
    """(raw user ids, feature rows): gender + one-hot(ageMap) +
    one-hot(occupation code) — the ``movielensUserFeature`` analog
    (``handleMovielens.py:20-58``) on 1M's already-coded columns."""
    gender = (users["gender"].astype(str) == "M").to_numpy(np.float32)[:, None]
    age_oh = np.stack(
        [one_hot(age_bucket(int(a)), N_AGE_BUCKETS) for a in users["age"]]
    ).astype(np.float32)
    # one_hot yields an all-zero vector for out-of-range codes
    occ_oh = np.stack(
        [one_hot(int(o), N_OCCUPATIONS_1M) for o in users["occupation"]]
    ).astype(np.float32)
    return (
        users["user_id"].to_numpy(),
        np.concatenate([gender, age_oh, occ_oh], axis=1),
    )


def ml1m_item_features(
    movies: pd.DataFrame, title_dim: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """(raw item ids, feature rows): 18 genre flags + one-hot(year bucket) +
    title embedding — the ``movielensItemFeature`` analog
    (``handleMovielens.py:62-104``) with genres parsed from the pipe list."""
    genre_lists = [str(g).split("|") for g in movies["genres"]]
    genres = multi_hot(genre_lists, GENRES_1M)
    titles = movies["movie_title"].astype(str)
    year_oh = np.stack(
        [one_hot(title_year(t), N_YEAR_BUCKETS) for t in titles]
    ).astype(np.float32)
    title_emb = text_embeddings(titles.tolist(), title_dim)
    return (
        movies["movie_id"].to_numpy(),
        np.concatenate([genres, year_oh, title_emb], axis=1),
    )


def prepare_movielens1m(
    cfg: Config, save_path: Optional[str] = None
) -> Tuple[RatingSplits, np.ndarray, np.ndarray]:
    """Full MovieLens-1M pipeline, the ``prepareMovieLens`` analog
    (``handleMovielens.py:108-204``): parse, quantile-filter + encode + split
    the ratings, build both feature tables, align to internal ids."""
    log = get_logger()
    with stage_timer("MovieLens-1M dataset processing done", log):
        rating, users, movies = read_movielens1m_raw(
            cfg.preprocessing.dataset_paths
        )
        splits = prepare_ratings(rating, cfg, save_path)
        uid_raw, user_feats = ml1m_user_features(users)
        iid_raw, item_feats = ml1m_item_features(
            movies, cfg.preprocessing.vector_size["title"]
        )
        user_features = _remap_features(
            uid_raw, user_feats, splits.uid_mapping, splits.n_users
        )
        item_features = _remap_features(
            iid_raw, item_feats, splits.iid_mapping, splits.n_items
        )
        if save_path:
            save_feature_csvs(save_path, user_features, item_features)
    return splits, user_features, item_features
