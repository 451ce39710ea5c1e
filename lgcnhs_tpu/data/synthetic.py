"""Seeded synthetic dataset generation.

The reference assumes MovieLens-100K / Douban CSVs at absolute local paths
(``const.py:200-244``) that are not shipped with the repo. This module
synthesizes datasets with the same schemas and realistic statistics (power-law
item popularity, heterogeneous user activity) so that every pipeline stage,
test, and benchmark runs hermetically at any scale (100K .. 10M+ interactions).
Real CSVs are used instead whenever they exist on disk (``data/movielens.py``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def synthesize_movielens_like(
    n_users: int = 943,
    n_items: int = 1682,
    n_interactions: int = 100_000,
    seed: int = 42,
    user_col: str = "user",
    item_col: str = "item",
) -> pd.DataFrame:
    """Emit a ratings dataframe in the MovieLens ``u.data`` schema
    (user, item, rating, timestamp; ``processing/handleMovielens.py:122-129``).

    Item popularity ~ Zipf, user activity ~ lognormal, both seeded. Duplicate
    (user, item) pairs are dropped, so the realized interaction count is
    slightly below ``n_interactions`` (like real rating data, each pair rated
    once).
    """
    rng = np.random.default_rng(seed)

    item_pop = 1.0 / np.power(np.arange(1, n_items + 1), 0.9)
    item_pop /= item_pop.sum()
    user_act = rng.lognormal(mean=0.0, sigma=1.0, size=n_users)
    user_act /= user_act.sum()

    users = rng.choice(n_users, size=n_interactions, p=user_act)
    items = rng.choice(n_items, size=n_interactions, p=item_pop)

    df = pd.DataFrame(
        {
            user_col: users + 1,  # ml-100k ids are 1-based
            item_col: items + 1,
            "rating": rng.integers(1, 6, size=n_interactions),
            "timestamp": rng.integers(874_000_000, 893_000_000, size=n_interactions),
        }
    )
    df = df.drop_duplicates(subset=[user_col, item_col], keep="first")
    df = df.reset_index(drop=True)
    return df


def synthesize_features(
    n_rows: int, dim: int, seed: int
) -> np.ndarray:
    """Dense feature table stand-in for the reference's engineered user/item
    features (one-hots + Word2Vec pools, ``processing/handleMovielens.py:39-100``)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_rows, dim)).astype(np.float32)
