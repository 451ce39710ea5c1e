"""Douban movies ingestion + feature pipeline.

Re-design of ``processing/handleDouban.py``. Schema: ``users.csv``
(USER_MD5, USER_NICKNAME), ``movies.csv`` (MOVIE_ID, NAME, GENRES, LANGUAGES,
REGIONS, MINS, YEAR, STORYLINE, ...), ``ratings.csv`` (USER_MD5, MOVIE_ID,
RATING, RATING_TIME).

Pipeline (``handleDouban.py:160-215``):
- drop ratings whose movie is unknown (``:182-183``)
- rating filter/split via the shared pipeline (douban quantile band
  [0.991, 0.99] keeps a narrow band of most-active users, const.py:236-239)
- user features = 3-d text embedding of the nickname (``:29-56``)
- item features = concat [name emb(3), genres multi-hot, languages multi-hot,
  duration one-hot, storyline emb(20), regions multi-hot, year one-hot]
  (``:60-157``)
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.features import (
    clean_genres,
    duration_bucket,
    language_codes,
    multi_hot,
    one_hot,
    region_codes,
    text_embeddings,
    year_bucket,
)
from lgcnhs_tpu.data.movielens import _remap_features, save_feature_csvs
from lgcnhs_tpu.data.ratings import RatingSplits, prepare_ratings
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer

N_DURATION_BUCKETS = 6  # durationMap values 1..6 (handleFeature.py:147-164)
# yearMap emits 0..6, but the Douban path fillna(0)s missing years BEFORE the
# map so yearMap(0) -> 1 and the 0 sentinel is unreachable (handleDouban.py:
# 112-113); codes are 1..6 -> a 6-wide block, matching the reference's
# get_dummies width when (as on real Douban data) every bucket occurs.
N_YEAR_BUCKETS = 6


def _split_multi(series: pd.Series, pattern: str) -> list:
    """``series.fillna("").str.split(pattern)`` exactly (the reference's
    split idiom, ``handleDouban.py:87-106``): empty/NaN cells yield ``['']``
    — the empty token is KEPT, because the reference's downstream maps see it
    (it becomes an MLB ``''`` genre class / an 'other' language code)."""
    return [re.split(pattern, str(v) if pd.notna(v) else "") for v in series]


def douban_user_features(users: pd.DataFrame, title_dim: int = 3):
    """(raw md5 ids, nickname embeddings) (``handleDouban.py:29-56``)."""
    emb = text_embeddings(users["USER_NICKNAME"].astype(str).tolist(), title_dim)
    return users["USER_MD5"].to_numpy(), emb


def douban_item_features(
    items: pd.DataFrame, title_dim: int = 3, content_dim: int = 20
):
    """(raw movie ids, concatenated feature rows)
    (``handleDouban.py:60-157``)."""
    # Split exactly as the reference (handleDouban.py:87-106), then apply the
    # reference's cleaning maps (handleFeature.py:62-144) BEFORE multi-hot:
    # genres normalize traditional/English labels to the simplified canon;
    # languages/regions collapse to int codes {1,2,3} (+ the 0 empty
    # sentinel, unreachable via this split — see features.language_codes).
    genres = [clean_genres(row) for row in _split_multi(items["GENRES"], r"[ /]")]
    languages = [
        language_codes(row)
        for row in _split_multi(
            items["LANGUAGES"].fillna("").astype(str).str.replace(" ", ""),
            r"[/ |]",
        )
    ]
    regions = [region_codes(row) for row in _split_multi(items["REGIONS"], r"[/]")]

    # MultiLabelBinarizer fits classes as the sorted union of observed labels
    # (str-lexicographic for genres — including '' when empty cells exist —
    # and numeric for the int codes), matching handleDouban.py:121-127.
    genre_vocab = sorted({g for row in genres for g in row})
    lang_vocab = sorted({l for row in languages for l in row})
    region_vocab = sorted({r for row in regions for r in row})

    mins = pd.to_numeric(items["MINS"], errors="coerce").fillna(0.0)
    mean_mins = mins.replace(0.0, np.nan).mean()
    mins = mins.replace(0.0, mean_mins if pd.notna(mean_mins) else 90.0)
    # the reference buckets the (fractional) mean-imputed FLOAT directly
    # (handleDouban.py:108-110: durationMap(mins) on the float column)
    duration_oh = np.stack(
        [one_hot(duration_bucket(float(m)), N_DURATION_BUCKETS) for m in mins]
    ).astype(np.float32)

    years = pd.to_numeric(items["YEAR"], errors="coerce").fillna(0).astype(int)
    # missing years: the reference's Douban path does fillna(0) then
    # yearMap(0) -> bucket 1 (int(0) < 1970, handleDouban.py:112-113);
    # the yearMap("nan") -> 0 sentinel only fires on MovieLens, whose
    # astype(str) yields the literal string "nan" (handleMovielens.py).
    # Codes 1..6 shifted to columns 0..5 (see N_YEAR_BUCKETS note).
    year_oh = np.stack(
        [one_hot(year_bucket(y) - 1, N_YEAR_BUCKETS) for y in years]
    ).astype(np.float32)

    name_emb = text_embeddings(items["NAME"].astype(str).tolist(), title_dim)
    story_emb = text_embeddings(items["STORYLINE"].astype(str).tolist(), content_dim)

    feats = np.concatenate(
        [
            name_emb,
            multi_hot(genres, genre_vocab),
            multi_hot(languages, lang_vocab),
            duration_oh,
            story_emb,
            multi_hot(regions, region_vocab),
            year_oh,
        ],
        axis=1,
    )
    return items["MOVIE_ID"].to_numpy(), feats


def prepare_douban(
    cfg: Config, save_path: Optional[str] = None
) -> Tuple[RatingSplits, np.ndarray, np.ndarray]:
    """Full Douban pipeline (``prepareDouban``, ``handleDouban.py:160-215``)."""
    log = get_logger()
    paths = cfg.preprocessing.dataset_paths
    with stage_timer("Douban dataset processing done", log):
        rating = pd.read_csv(paths["rating"])
        users = pd.read_csv(paths["users"])
        items = pd.read_csv(paths["items"])

        rating = rating[rating["MOVIE_ID"].isin(items["MOVIE_ID"].unique())]
        splits = prepare_ratings(rating, cfg, save_path)

        uid_raw, user_feats = douban_user_features(
            users, cfg.preprocessing.vector_size["title"]
        )
        iid_raw, item_feats = douban_item_features(
            items,
            cfg.preprocessing.vector_size["title"],
            cfg.preprocessing.vector_size["content"],
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
