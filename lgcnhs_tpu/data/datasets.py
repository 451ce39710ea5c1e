"""Dataset dispatch with hermetic fallback.

Reference behavior: ``main.py:28-46`` loads cached preprocessing CSVs, else
reruns the dataset pipeline from absolute local paths (``const.py:200-244``).
We add a third tier the reference lacks: when raw files don't exist (this
image has no datasets and zero egress), synthesize a seeded dataset with the
same schema and statistics so everything still runs end-to-end.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.ratings import RatingSplits, prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_features, synthesize_movielens_like
from lgcnhs_tpu.runtime.logging import get_logger

# user/item feature widths used for synthetic feature tables: movielens's true
# widths are 29 (1+7+21) and 37 (19+13+5); synthetic mirrors them.
SYN_USER_FEATURE_DIM = 29
SYN_ITEM_FEATURE_DIM = 37


def load_dataset(cfg: Config) -> Tuple[RatingSplits, np.ndarray, np.ndarray]:
    """(splits, user_features, item_features) for the configured dataset."""
    log = get_logger()
    save_path = cfg.preprocess_path
    paths = cfg.preprocessing.dataset_paths
    have_raw = bool(paths) and all(os.path.exists(p) for p in paths.values())

    if cfg.dataset == "movielens" and have_raw:
        from lgcnhs_tpu.data.movielens import prepare_movielens

        return prepare_movielens(cfg, save_path)
    if cfg.dataset == "movielens1m" and have_raw:
        from lgcnhs_tpu.data.movielens1m import prepare_movielens1m

        return prepare_movielens1m(cfg, save_path)
    if cfg.dataset == "douban" and have_raw:
        from lgcnhs_tpu.data.douban import prepare_douban

        return prepare_douban(cfg, save_path)

    if cfg.dataset in ("movielens", "movielens1m", "douban"):
        log.info(
            "%s raw files not found; synthesizing a seeded stand-in dataset",
            cfg.dataset,
        )
    df = synthesize_movielens_like(
        cfg.synthetic_users,
        cfg.synthetic_items,
        cfg.synthetic_interactions,
        seed=cfg.preprocessing.seed,
        user_col=cfg.preprocessing.columns_map["user_id"],
        item_col=cfg.preprocessing.columns_map["item_id"],
    )
    # synthetic rating/timestamp column names follow the movielens map
    import dataclasses

    cfg_syn = cfg.replace(
        preprocessing=dataclasses.replace(
            cfg.preprocessing,
            columns_map={
                "user_id": cfg.preprocessing.columns_map["user_id"],
                "item_id": cfg.preprocessing.columns_map["item_id"],
                "rating": "rating",
                "rating_time": "timestamp",
            },
        )
    )
    splits = prepare_ratings(df, cfg_syn, save_path)
    user_features = synthesize_features(
        splits.n_users, SYN_USER_FEATURE_DIM, cfg.preprocessing.seed
    )
    item_features = synthesize_features(
        splits.n_items, SYN_ITEM_FEATURE_DIM, cfg.preprocessing.seed + 1
    )
    return splits, user_features, item_features
