"""Rating preprocessing pipeline.

Re-implementation of the reference's shared cleaning + split stage
``handleRating`` (``processing/handleData.py:17-123``) with identical
semantics so split membership matches the reference bit-for-bit given the
same input dataframe and seed:

1. per-user rating-count quantile-band filter (``handleData.py:39-57``)
2. column projection + rename via ``columns_map`` (``handleData.py:58-67``)
3. dense 0..N-1 id remap with sorted-unique ("LabelEncoder") class order
   (``handleData.py:70-77``)
4. 80/10/10 train/val/test split by interaction row with
   ``sklearn.train_test_split`` at seed 42 (``handleData.py:87-99``)
5. CSV artifacts: ``filter_rating.csv``, ``train_data.csv``, ``val_data.csv``,
   ``test_data.csv`` (``handleData.py:81,103,110,117``)
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer


@dataclass
class RatingSplits:
    rating: pd.DataFrame
    train: pd.DataFrame
    val: pd.DataFrame
    test: pd.DataFrame
    uid_mapping: Dict
    iid_mapping: Dict

    @property
    def n_users(self) -> int:
        return int(self.rating["user_id"].nunique())

    @property
    def n_items(self) -> int:
        return int(self.rating["item_id"].nunique())


def _dense_remap(values: pd.Series) -> tuple[np.ndarray, Dict]:
    """Sorted-unique to dense int remap — same class order as sklearn's
    LabelEncoder (``handleData.py:70-77``) without the per-call fit overhead."""
    classes = np.sort(values.unique())
    codes = np.searchsorted(classes, values.to_numpy())
    mapping = dict(zip(classes.tolist(), range(len(classes))))
    return codes, mapping


def prepare_ratings(
    rating_df: pd.DataFrame,
    cfg: Config,
    save_path: Optional[str] = None,
) -> RatingSplits:
    pre = cfg.preprocessing
    cols = pre.columns_map
    log = get_logger()

    with stage_timer("rating preprocessing done", log):
        # 1. quantile-band user-activity filter
        counts = rating_df[cols["user_id"]].value_counts()
        thr_start = counts.quantile(pre.quantile_start)
        thr_end = counts.quantile(pre.quantile_end)
        log.info("quantile start %.4f threshold: %s", pre.quantile_start, thr_start)
        log.info("quantile end %.4f threshold: %s", pre.quantile_end, thr_end)
        kept_users = counts[(counts >= thr_end) & (counts <= thr_start)].index
        filtered = rating_df[rating_df[cols["user_id"]].isin(kept_users)]

        # 2. column projection + rename
        filtered = filtered[
            [cols["user_id"], cols["item_id"], cols["rating"], cols["rating_time"]]
        ].copy()
        filtered.columns = ["user_id", "item_id", "rating", "rating_time"]

        # 3. dense id remap
        filtered["user_id"], uid_mapping = _dense_remap(filtered["user_id"])
        filtered["item_id"], iid_mapping = _dense_remap(filtered["item_id"])
        filtered.reset_index(drop=True, inplace=True)

        # 4. seeded 8:1:1 row split (sklearn to match reference shuffling)
        n = len(filtered)
        all_indices = np.arange(n)
        train_idx, holdout_idx = train_test_split(
            all_indices,
            test_size=pre.split_percentage[0],
            random_state=pre.seed,
        )
        val_idx, test_idx = train_test_split(
            holdout_idx,
            test_size=pre.split_percentage[1],
            random_state=pre.seed,
        )
        train = filtered.loc[train_idx]
        val = filtered.loc[val_idx]
        test = filtered.loc[test_idx]

        for name, df in (("train", train), ("val", val), ("test", test)):
            log.info(
                "%s split: %d ratings, %d users, %d items",
                name,
                df.shape[0],
                df["user_id"].nunique(),
                df["item_id"].nunique(),
            )

        # 5. artifacts
        if save_path:
            os.makedirs(save_path, exist_ok=True)
            filtered.to_csv(os.path.join(save_path, "filter_rating.csv"), index=False)
            train.to_csv(os.path.join(save_path, "train_data.csv"), index=False)
            val.to_csv(os.path.join(save_path, "val_data.csv"), index=False)
            test.to_csv(os.path.join(save_path, "test_data.csv"), index=False)
            # persist the raw->dense id mappings beside the split CSVs so a
            # warm-cache run can still decode internal ids (the reference
            # recomputes mappings on every run, handleData.py:70-77; we load
            # the CSVs instead, which would otherwise lose the mappings)
            _save_id_mappings(save_path, uid_mapping, iid_mapping)

    return RatingSplits(filtered, train, val, test, uid_mapping, iid_mapping)


def _save_id_mappings(save_path: str, uid_mapping: Dict, iid_mapping: Dict) -> None:
    """The mappings are {raw_id -> dense_id} with dense ids 0..N-1 assigned in
    sorted-raw order, so the sorted raw-class arrays are a complete encoding."""
    np.savez(
        os.path.join(save_path, "id_mappings.npz"),
        uid_classes=np.asarray(list(uid_mapping.keys())),
        iid_classes=np.asarray(list(iid_mapping.keys())),
    )


def _load_id_mappings(save_path: str) -> tuple[Dict, Dict]:
    path = os.path.join(save_path, "id_mappings.npz")
    if not os.path.exists(path):
        return {}, {}
    with np.load(path, allow_pickle=False) as data:
        uid = {k: i for i, k in enumerate(data["uid_classes"].tolist())}
        iid = {k: i for i, k in enumerate(data["iid_classes"].tolist())}
    return uid, iid


def load_cached_splits(save_path: str) -> Optional[RatingSplits]:
    """Load the CSV artifacts if all exist (reference ``main.py:28-40``)."""
    paths = {
        name: os.path.join(save_path, f"{name}.csv")
        for name in ("filter_rating", "train_data", "val_data", "test_data")
    }
    if not all(os.path.exists(p) for p in paths.values()):
        return None
    rating = pd.read_csv(paths["filter_rating"])
    uid_mapping, iid_mapping = _load_id_mappings(save_path)
    return RatingSplits(
        rating,
        pd.read_csv(paths["train_data"]),
        pd.read_csv(paths["val_data"]),
        pd.read_csv(paths["test_data"]),
        uid_mapping,
        iid_mapping,
    )
