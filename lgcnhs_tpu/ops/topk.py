"""Ranking / top-k retrieval ops.

Covers the reference's two ranking flavors:

1. Masked top-k (GCN flavor): set seen user-item scores to exactly -(1 << 10)
   and take torch.topk (``model/LightGCN/evaluation.py:41-52``,
   ``recommend.py:93-114``). -1024.0 (not -inf) is load-bearing for parity.
2. Argsort-filter (spread flavor): argsort resources descending with numpy's
   reversed-stable tie order (equal values -> HIGHER index first), drop seen
   items, take first k (``model/SpreadMethod/recommend.py:35-50``).

Both are jitted and batched over all users at once — the reference's Python
per-user loop becomes one XLA sort/top-k program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Exact sentinel the reference writes into excluded entries.
MASK_VALUE = -float(1 << 10)


@partial(jax.jit, static_argnames=("k",))
def masked_topk(
    scores: jnp.ndarray,  # (U, I)
    seen: jnp.ndarray,  # (U, I) bool — entries to exclude
    k: int,
) -> jnp.ndarray:
    """Top-k item indices per user with seen entries masked to -1024.
    jax.lax.top_k breaks ties lowest-index-first like torch.topk's sorted
    path, matching the reference's observable ordering."""
    masked = jnp.where(seen, MASK_VALUE, scores)
    _, idx = jax.lax.top_k(masked, k)
    return idx


@partial(jax.jit, static_argnames=("k", "filter_seen"))
def rank_exclude_seen(
    resource: jnp.ndarray,  # (U, I)
    seen: jnp.ndarray,  # (U, I) bool
    k: int,
    filter_seen: bool = True,
) -> jnp.ndarray:
    """Spread-flavor ranking with exact numpy-parity tie behavior.

    The reference ranks with ``np.argsort(x)[::-1]``
    (``model/SpreadMethod/recommend.py:39``) under numpy's default UNSTABLE
    quicksort, so its order among equal scores is implementation-defined. We
    pin the deterministic stable flavor: value descending, ties broken by
    HIGHER index first (reversed stable ascending sort) — identical wherever
    scores are distinct, reproducible where the reference is not. Seen items
    are then stably pushed behind unseen ones and the first k taken.
    ``filter_seen=False`` reproduces the ProbS-on-movielens quirk that skips
    the seen filter (``recommend.py:48-50``).

    Edge case: a user with fewer than k unseen items gets the best SEEN items
    backfilled at the tail (static shapes). The reference instead emits a
    short list that crashes its own ragged np.array conversion
    (``utils/trans.py:91``) — our behavior is a documented strict improvement.
    """
    # order[u, s] = item at descending-rank s (ties -> higher index first):
    # exactly np.argsort(ascending, stable)[::-1].
    order = jnp.argsort(resource, axis=1, stable=True)[:, ::-1]

    if not filter_seen:
        return order[:, :k]

    # Stable partition: unseen slots keep relative order ahead of seen slots.
    seen_in_order = jnp.take_along_axis(seen, order, axis=1)
    perm = jnp.argsort(seen_in_order.astype(jnp.int32), axis=1, stable=True)
    filtered = jnp.take_along_axis(order, perm, axis=1)
    return filtered[:, :k]


@partial(jax.jit, static_argnames=("k", "filter_seen"))
def rank_exclude_seen_topk(
    resource: jnp.ndarray,  # (U, I)
    seen: jnp.ndarray,  # (U, I) bool
    k: int,
    filter_seen: bool = True,
) -> jnp.ndarray:
    """``rank_exclude_seen`` computed with two width-I top-k selections
    instead of two full-width stable argsorts — identical indices
    (tie rule and seen-backfill included; equality pinned in
    tests/test_topk.py), ~O(I·k) selection instead of O(I log I) sort.

    The tie rule (value descending, ties -> HIGHER index first) is exactly
    ``lax.top_k`` — which breaks ties lowest-index-first — applied to the
    item-REVERSED score row; reversing the axis makes "lowest reversed
    index" = "highest original index". Seen-before-unseen partitioning and
    the <k-unseen backfill are two such selections merged by prefix length:
    positions < min(k, unseen_count) come from the unseen selection, the
    rest from the best-seen selection (``model/SpreadMethod/recommend.py:
    35-50`` semantics; backfill documented at ``rank_exclude_seen``).

    Precondition (with ``filter_seen=True``): UNSEEN scores must be finite.
    -inf is the seen-mask sentinel here, so a genuine -inf unseen score ties
    with masked seen entries and the index tiebreak may diverge from
    ``rank_exclude_seen``. All production scorers satisfy this (diffusion
    resources are finite non-negative; fused G*F is finite) — -inf is only
    ever written into SEEN/padded entries, which is safe. k > I is clamped
    to I, matching ``rank_exclude_seen``'s I-wide slice.
    """
    I = resource.shape[1]
    k = min(k, I)
    rev = resource[:, ::-1]

    def _topk_rev(scores_rev):
        _, idx_rev = jax.lax.top_k(scores_rev, k)
        return (I - 1) - idx_rev

    if not filter_seen:
        return _topk_rev(rev)

    seen_rev = seen[:, ::-1]
    neg_inf = jnp.array(-jnp.inf, resource.dtype)
    unseen_idx = _topk_rev(jnp.where(seen_rev, neg_inf, rev))
    seen_idx = _topk_rev(jnp.where(seen_rev, rev, neg_inf))

    n_unseen = jnp.sum(~seen, axis=1, keepdims=True)  # (U, 1)
    slot = jnp.arange(k)[None, :]
    from_unseen = slot < n_unseen
    # slots past the unseen supply read the best-seen list from position 0
    backfill_pos = jnp.clip(slot - n_unseen, 0, k - 1)
    backfill = jnp.take_along_axis(seen_idx, backfill_pos, axis=1)
    return jnp.where(from_unseen, unseen_idx, backfill)


def retrieve_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    seen: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """Full-catalog layer-0 retrieval: scores + mask + top-k.

    On TPU this dispatches to the fused Pallas kernel (scores never touch
    HBM, ~2.3x the XLA path) WHEN its resident set fits VMEM
    (``fits_vmem_retrieval``, ~13k items at D=64); beyond that cap the
    item-tiled STREAMING kernel takes over (running top-k merge per user
    block; resident VMEM independent of catalog size), falling back to the
    materialized masked_topk only off-TPU or in f64 parity runs. All paths
    produce identical indices (tie rule included — padding is masked to
    -inf, strictly below the reference's finite -1024 seen sentinel).
    """
    if jax.default_backend() == "tpu" and user_emb.dtype != jnp.float64:
        from lgcnhs_tpu.ops.pallas.retrieval import (
            fits_vmem_retrieval,
            fused_topk_retrieval,
            pick_stream_tile,
            streaming_topk_retrieval,
        )

        if fits_vmem_retrieval(item_emb.shape[0], item_emb.shape[1]):
            idx, _ = fused_topk_retrieval(user_emb, item_emb, seen, k)
            return idx
        tile = pick_stream_tile(
            item_emb.shape[1], min(k, item_emb.shape[0])
        )
        if tile is not None:
            idx, _ = streaming_topk_retrieval(
                user_emb, item_emb, seen, k, item_tile=tile
            )
            return idx
        # pathological D: no streaming tile fits VMEM either — XLA chain
    scores = jnp.dot(
        user_emb,
        item_emb.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=user_emb.dtype,
    )
    return masked_topk(scores, seen, k)


