"""Graph array builders.

Replaces the reference's conversion utilities, which build dense matrices with
Python row loops (``utils/trans.py:13-116``) and round-trip through a dense
joint (U+I)x(U+I) adjacency every epoch (``utils/graph.py:12-50``,
``model/LightGCN/train.py:48``) — the reference's single biggest inefficiency.

TPU-native representation: interactions stay as flat edge arrays
(user_idx, item_idx). The bipartite incidence R (U x I) is materialized once,
vectorized; the joint adjacency is never materialized at all, because LightGCN
propagation over the joint graph factorizes into two bipartite products
(see ``ops/propagation.py``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class EdgeSet:
    """One split's interactions as parallel index arrays."""

    users: np.ndarray  # int32 (E,)
    items: np.ndarray  # int32 (E,)

    @property
    def n_edges(self) -> int:
        return int(self.users.shape[0])


@dataclass(frozen=True)
class InteractionGraph:
    n_users: int
    n_items: int
    all: EdgeSet
    train: EdgeSet
    val: EdgeSet
    test: EdgeSet


def edges_from_df(df: pd.DataFrame) -> EdgeSet:
    return EdgeSet(
        users=df["user_id"].to_numpy(dtype=np.int32),
        items=df["item_id"].to_numpy(dtype=np.int32),
    )


def unique_edges(es: EdgeSet) -> EdgeSet:
    """First-occurrence-ordered deduplication of (user, item) pairs.

    The reference round-trips every LightGCN-side edge list through a dense
    0/1 adjacency (``utils/graph.py:23-25``: ``R[u][i] = 1`` collapses
    duplicated rating rows) before ``gcn_norm`` propagation, BPR edge
    sampling (``convertAdjMatrixToEdgeIndex``) and ``calValLoss`` — so the
    GCN sees each interaction once even when ``handleRating`` keeps
    duplicate (user, item) rows (it never dedupes; real Douban exports can
    contain them). The metric/diffusion side instead counts dataframe ROWS
    (``item_degrees``/``user_pos_counts`` docstrings) — only the trainer's
    edge lists go through this. First-occurrence order keeps this a no-op
    (even in ordering) on duplicate-free splits."""
    users = np.asarray(es.users)
    items = np.asarray(es.items)
    if users.size == 0:
        return EdgeSet(users.astype(np.int32), items.astype(np.int32))
    stride = np.int64(items.max()) + 1
    key = users.astype(np.int64) * stride + items.astype(np.int64)
    _, first = np.unique(key, return_index=True)
    first.sort()
    return EdgeSet(
        users[first].astype(np.int32), items[first].astype(np.int32)
    )


def build_graph(splits) -> InteractionGraph:
    """From a ``RatingSplits`` to edge arrays (reference ``buildGraph``,
    ``model/LightGCN/recommend.py:23-66``, without the dense adjacency
    round-trips)."""
    return InteractionGraph(
        n_users=splits.n_users,
        n_items=splits.n_items,
        all=edges_from_df(splits.rating),
        train=edges_from_df(splits.train),
        val=edges_from_df(splits.val),
        test=edges_from_df(splits.test),
    )


def interaction_matrix(
    n_users: int, n_items: int, *edge_sets: EdgeSet, dtype=np.float32
) -> np.ndarray:
    """Dense 0/1 user-item matrix (reference
    ``getInteractionMatrixByDataframe``, ``utils/trans.py:13-29``), vectorized.
    Multiple edge sets are unioned (the reference concatenates train+val
    dataframes, e.g. ``model/SpreadMethod/recommend.py:81``)."""
    A = np.zeros((n_users, n_items), dtype=dtype)
    for es in edge_sets:
        A[es.users, es.items] = 1
    return A


def pos_bool_matrix(n_users: int, n_items: int, *edge_sets: EdgeSet) -> np.ndarray:
    """Boolean positives matrix — the vectorized form of the reference's
    uid -> [iid...] dicts (``utils/trans.py:51-80``)."""
    return interaction_matrix(n_users, n_items, *edge_sets, dtype=np.bool_)


def item_degrees(n_items: int, *edge_sets: EdgeSet) -> np.ndarray:
    """Item degree = number of interaction ROWS touching the item across the
    given splits (reference ``getItemDegreeByUserPosItemDict``,
    ``utils/trans.py:94-116``, counts dict-list entries, not unique pairs)."""
    deg = np.zeros(n_items, dtype=np.int64)
    for es in edge_sets:
        deg += np.bincount(es.items, minlength=n_items)
    return deg


def user_pos_counts(n_users: int, es: EdgeSet) -> np.ndarray:
    """Per-user positive count |pos_u| for a split — the reference recall
    denominator ``len(items)`` (``metrics/accurate.py:31``), which counts rows
    (duplicates included)."""
    return np.bincount(es.users, minlength=n_users)


def users_present(n_users: int, es: EdgeSet) -> np.ndarray:
    """Mask of users with >=1 interaction in the split. Reference metrics
    iterate only over keys of the split's pos dict (``metrics/accurate.py:26``);
    absent users contribute nothing to the means."""
    return user_pos_counts(n_users, es) > 0


def normalized_bipartite(
    n_users: int, n_items: int, es: EdgeSet, dtype=np.float32
) -> np.ndarray:
    """Symmetric-normalized bipartite incidence
    R_hat = D_u^-1/2 R D_i^-1/2 (dense).

    This is exactly torch-geometric's ``gcn_norm(add_self_loops=False)`` on
    the joint adjacency (``model/LightGCN/model.py:53``) restricted to its
    user-item block: the joint graph is bipartite, so the joint normalized
    adjacency is [[0, R_hat], [R_hat^T, 0]] and K-step propagation factorizes
    into alternating R_hat / R_hat^T products (see ``ops/propagation.py``).
    Zero-degree rows/cols get 0 (gcn_norm's deg_inv_sqrt masks inf to 0).
    """
    R = interaction_matrix(n_users, n_items, es, dtype=np.float64)
    du = R.sum(axis=1)
    di = R.sum(axis=0)
    with np.errstate(divide="ignore"):
        inv_su = np.where(du > 0, 1.0 / np.sqrt(du), 0.0)
        inv_si = np.where(di > 0, 1.0 / np.sqrt(di), 0.0)
    return (R * inv_su[:, None] * inv_si[None, :]).astype(dtype)


def binary_incidence_factors(
    n_users: int, n_items: int, es: EdgeSet
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Factored form of ``normalized_bipartite``: (R int8, du^-1/2, di^-1/2)
    with R the BINARY interaction matrix and
    R_hat == diag(du^-1/2) R diag(di^-1/2) exactly. The int8 incidence is
    what the bandwidth-bound TPU propagation streams (half the bytes of bf16,
    values exact); the degree scales apply to the small embedding operands
    (``ops/pallas/propagation.lightgcn_propagate_pallas_binary``)."""
    R = interaction_matrix(n_users, n_items, es, dtype=np.float64)
    du = R.sum(axis=1)
    di = R.sum(axis=0)
    with np.errstate(divide="ignore"):
        inv_su = np.where(du > 0, 1.0 / np.sqrt(du), 0.0).astype(np.float32)
        inv_si = np.where(di > 0, 1.0 / np.sqrt(di), 0.0).astype(np.float32)
    return R.astype(np.int8), inv_su, inv_si


def device_bf16_incidence(n_users: int, n_items: int, es: EdgeSet):
    """R_hat as a DEVICE-built bf16 dense incidence from the int8 pattern:
    1 host byte/entry and no (U, I) f64/f32 host intermediate (a host
    ``normalized_bipartite`` would materialize 12 GB at the 50k x 30k rung
    docs/PERF.md measures). Same binary-degree semantics as
    ``normalized_bipartite`` (edge multiplicity collapses to 0/1). Shared by
    the trainer's bf16-dense rung and bench.py so the two builds cannot
    drift."""
    import jax
    import jax.numpy as jnp

    R8 = np.zeros((n_users, n_items), np.int8)
    R8[np.asarray(es.users), np.asarray(es.items)] = 1
    du = R8.sum(axis=1, dtype=np.int64)
    di = R8.sum(axis=0, dtype=np.int64)
    with np.errstate(divide="ignore"):
        dui = jnp.asarray(np.where(du > 0, 1.0 / np.sqrt(du), 0.0).astype(np.float32))
        dii = jnp.asarray(np.where(di > 0, 1.0 / np.sqrt(di), 0.0).astype(np.float32))
    build = jax.jit(
        lambda r, a, b: (
            a[:, None] * r.astype(jnp.bfloat16) * b[None, :]
        ).astype(jnp.bfloat16)
    )
    return build(jnp.asarray(R8), dui, dii)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int) -> Tuple[np.ndarray, int]:
    """Pad an axis up to a multiple (TPU tiling wants 128-aligned lanes)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return np.pad(x, pad), size
