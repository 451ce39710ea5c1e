"""MovieLens-100K ingestion + feature pipeline.

Re-design of ``processing/handleMovielens.py``. Schemas match the ML-100K
distribution files exactly (``handleMovielens.py:122-172``):

- ``u.data``: user \\t item \\t rating \\t timestamp
- ``u.user``: user_id|age|gender|occupation|zip_code
- ``u.occupation``: one occupation per line
- ``u.item``: movie_id|title|release_date|video_release_date|IMDb_URL|19 genre flags

Features (``handleMovielens.py:20-104``):
- user = [gender binary, one-hot(age bucket), one-hot(occupation)]
- item = [19 genre flags, one-hot(release-year bucket), mean-pooled
  title embedding (dim 5)]

Output: dense float arrays aligned to INTERNAL ids (rows for filtered-out /
unmatched entities are zero), plus the reference's tab-separated list-valued
feature CSVs for artifact parity (``handleMovielens.py:190-195``).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.features import age_bucket, one_hot, text_embeddings, year_bucket
from lgcnhs_tpu.data.ratings import RatingSplits, prepare_ratings
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer

GENRE_COLUMNS = [
    "unknown", "Action", "Adventure", "Animation", "Children's", "Comedy",
    "Crime", "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror",
    "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]

N_AGE_BUCKETS = 7  # ageMap values 1..7 (handleFeature.py:17-36)
N_YEAR_BUCKETS = 7  # yearMap values 0..6 (handleFeature.py:39-59)


def read_movielens_raw(paths: Dict[str, str]):
    rating = pd.read_csv(
        paths["rating"], sep="\t", header=None,
        names=["user", "item", "rating", "timestamp"],
    )
    users = pd.read_csv(
        paths["users"], sep="|", header=None,
        names=["user_id", "age", "gender", "occupation", "zip_code"],
    )
    occupations = pd.read_csv(
        paths["occupation"], sep="\t", header=None, names=["occupation"]
    )
    items = pd.read_csv(
        paths["items"], sep="|", header=None, encoding="iso-8859-1",
        names=["movie_id", "movie_title", "release_date", "video_release_date",
               "IMDb_URL"] + GENRE_COLUMNS,
    )
    return rating, users, occupations, items


def movielens_user_features(
    users: pd.DataFrame, occupations: pd.DataFrame
) -> Tuple[np.ndarray, np.ndarray]:
    """(raw user ids, feature rows): gender + one-hot(age) + one-hot(occ)
    (``handleMovielens.py:20-58``)."""
    occ_map = {name: idx for idx, name in enumerate(occupations["occupation"])}
    n_occ = len(occ_map)
    rows = []
    for _, row in users.iterrows():
        feats = [1 if row["gender"] == "M" else 0]
        feats += one_hot(age_bucket(int(row["age"])), N_AGE_BUCKETS)
        feats += one_hot(occ_map.get(row["occupation"], -1), n_occ)
        rows.append(feats)
    return users["user_id"].to_numpy(), np.asarray(rows, dtype=np.float32)


def movielens_item_features(
    items: pd.DataFrame, title_dim: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """(raw item ids, feature rows): 19 genre flags + one-hot(year bucket) +
    title embedding (``handleMovielens.py:62-104``)."""
    genres = items[GENRE_COLUMNS].to_numpy(dtype=np.float32)
    # missing dates: the reference's astype(str) turns NaN into the literal
    # 'nan' (old pandas), whose yearMap hits the non-digit sentinel bucket 0
    # (handleMovielens.py:79-82, handleFeature.py:39-44); newer pandas string
    # dtype propagates NaN through .str, so coerce explicitly
    years = (
        items["release_date"].astype(str).str[-4:]
        .apply(lambda y: year_bucket(int(y))
               if isinstance(y, str) and y.isdigit() else 0)
    )
    year_oh = np.stack([one_hot(b, N_YEAR_BUCKETS) for b in years]).astype(np.float32)
    titles = text_embeddings(items["movie_title"].astype(str).tolist(), title_dim)
    return (
        items["movie_id"].to_numpy(),
        np.concatenate([genres, year_oh, titles], axis=1),
    )


def _remap_features(
    raw_ids: np.ndarray, feats: np.ndarray, mapping: Dict, n_rows: int
) -> np.ndarray:
    """Align raw-id feature rows to internal ids; unmatched -> dropped,
    missing internal rows -> zeros (``handleMovielens.py:182-187`` drops
    unmatched rows; zero-fill keeps our arrays dense)."""
    out = np.zeros((n_rows, feats.shape[1]), dtype=np.float32)
    for rid, row in zip(raw_ids, feats):
        internal = mapping.get(rid)
        if internal is not None:
            out[internal] = row
    return out


def save_feature_csvs(
    save_path: str, user_feats: np.ndarray, item_feats: np.ndarray
) -> None:
    """Reference-format tab-separated list-valued CSVs
    (``handleMovielens.py:190-195``)."""
    os.makedirs(save_path, exist_ok=True)
    pd.DataFrame(
        {"user_id": range(len(user_feats)),
         "user_features": [r.tolist() for r in user_feats]}
    ).to_csv(os.path.join(save_path, "user_features.csv"), sep="\t", index=False)
    pd.DataFrame(
        {"item_id": range(len(item_feats)),
         "item_features": [r.tolist() for r in item_feats]}
    ).to_csv(os.path.join(save_path, "item_features.csv"), sep="\t", index=False)


def prepare_movielens(
    cfg: Config, save_path: Optional[str] = None
) -> Tuple[RatingSplits, np.ndarray, np.ndarray]:
    """Full MovieLens pipeline (``prepareMovieLens``,
    ``handleMovielens.py:108-204``)."""
    log = get_logger()
    with stage_timer("MovieLens dataset processing done", log):
        rating, users, occupations, items = read_movielens_raw(
            cfg.preprocessing.dataset_paths
        )
        splits = prepare_ratings(rating, cfg, save_path)
        uid_raw, user_feats = movielens_user_features(users, occupations)
        iid_raw, item_feats = movielens_item_features(
            items, cfg.preprocessing.vector_size["title"]
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
