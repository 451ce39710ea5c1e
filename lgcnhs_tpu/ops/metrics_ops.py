"""Vectorized on-device metric kernels.

The reference computes metrics with Python loops over users and item pairs
(``metrics/accurate.py``, ``metrics/diversity.py`` — the Hamming metric alone
is an O(U^2) double loop with string-keyed memoization,
``metrics/diversity.py:32-58``). Here each metric is a closed-form jitted
program:

- precision/recall/NDCG: one gather (hit matrix) + masked means
- Hamming: the pairwise-overlap double sum collapses to ||c||^2 where c is the
  item recommendation-count vector, because sum_{i,j} |rec_i ^ rec_j| =
  || sum_u onehot(rec_u) ||^2 — O(U k) instead of O(U^2 k)
- internal similarity: the per-user item-pair loop becomes a bilinear form
  b_u^T S b_u over the degree-normalized co-occurrence matrix S

Host-side 5-decimal rounding parity lives in ``eval/metrics.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def hit_matrix(rec: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """(U, k) 0/1 hits: rec item in the user's positive set
    (``metrics/accurate.py:26-33``)."""
    return jnp.take_along_axis(pos.astype(jnp.float32), rec, axis=1)


@jax.jit
def precision_recall_from_hits(
    hits: jnp.ndarray,  # (U, k) 0/1 hit matrix
    pos_counts: jnp.ndarray,  # (U,) |pos_u| row counts (duplicates included)
    present: jnp.ndarray,  # (U,) bool — users with >=1 positive in the split
):
    """P@k / R@k means over present users only, matching the reference's
    iteration over the eval pos-dict keys (``metrics/accurate.py:26-42``).
    Hit-matrix form shared by the dense and large-graph (CSR) paths."""
    num_correct = jnp.sum(hits, axis=1)
    m = present.astype(jnp.float32)
    n_present = jnp.maximum(jnp.sum(m), 1.0)
    k = hits.shape[1]
    precision = jnp.sum(num_correct * m) / n_present / k
    safe_counts = jnp.maximum(pos_counts.astype(jnp.float32), 1.0)
    recall = jnp.sum(num_correct / safe_counts * m) / n_present
    return precision, recall


@jax.jit
def precision_recall(
    rec: jnp.ndarray,  # (U, k) int
    pos: jnp.ndarray,  # (U, I) bool — eval-split positives
    pos_counts: jnp.ndarray,
    present: jnp.ndarray,
):
    return precision_recall_from_hits(hit_matrix(rec, pos), pos_counts, present)


@jax.jit
def ndcg_from_hits(hits: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """Binary-relevance NDCG with log2 discount. The reference's IDCG marks
    all k slots relevant (label rows are always length k,
    ``metrics/accurate.py:76-86``), so IDCG is the constant sum of discounts."""
    k = hits.shape[1]
    discount = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))
    dcg = jnp.sum(hits * discount[None, :], axis=1)
    idcg = jnp.sum(discount)
    ndcg = dcg / idcg
    m = present.astype(jnp.float32)
    return jnp.sum(ndcg * m) / jnp.maximum(jnp.sum(m), 1.0)


@jax.jit
def ndcg_at_k(
    rec: jnp.ndarray,
    pos: jnp.ndarray,
    present: jnp.ndarray,
) -> jnp.ndarray:
    return ndcg_from_hits(hit_matrix(rec, pos), present)


@partial(jax.jit, static_argnames=("n_items",))
def hamming_distance(rec: jnp.ndarray, n_items: int) -> jnp.ndarray:
    """Mean over ordered user pairs (i != j) of 1 - |rec_i ^ rec_j| / k
    (``metrics/diversity.py:15-63``).

    Identity: sum over ALL ordered pairs (incl. i==j) of overlap equals
    ||c||^2 with c[item] = #users recommended that item; the diagonal
    contributes U*k (lists hold k distinct items). Hence
    H = 1 - (||c||^2 - U*k) / (U (U-1) k).
    """
    U, k = rec.shape
    counts = jnp.zeros(n_items, dtype=jnp.float32).at[rec.reshape(-1)].add(1.0)
    total_overlap = jnp.sum(counts * counts)
    off_diag = total_overlap - U * k
    # float denominator: U(U-1)k overflows int32 beyond ~60k users
    return 1.0 - off_diag / (float(U) * (U - 1) * k)


@jax.jit
def similarity_matrix(
    interaction: jnp.ndarray,  # (U, I) float 0/1 train+val matrix
    item_deg: jnp.ndarray,  # (I,) degrees from the train+val pos dicts
) -> jnp.ndarray:
    """Degree-normalized co-occurrence S[i,j] = cooc(i,j)/sqrt(k_i k_j) —
    the Sorensen kernel the reference evaluates pairwise per recommended item
    pair (``metrics/diversity.py:96-107``). One MXU matmul; rec-independent,
    so sweep drivers hoist it out of their lambda loop."""
    cooc = jnp.dot(interaction.T, interaction, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    deg = item_deg.astype(jnp.float32)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    return cooc * inv_sqrt[:, None] * inv_sqrt[None, :]


@jax.jit
def internal_similarity_from_matrix(
    rec: jnp.ndarray,  # (U, k)
    S: jnp.ndarray,  # (I, I) from similarity_matrix
) -> jnp.ndarray:
    """I@k given a precomputed similarity matrix: gather the (U, k, k) pair
    block of S and subtract its diagonal — O(U k^2) gathers instead of a
    (U,I)x(I,I) bilinear product, the cheap form when S is reused across many
    recommendation lists (lambda sweeps)."""
    U, k = rec.shape
    pair = S[rec[:, :, None], rec[:, None, :]]  # (U, k, k)
    diag = S[rec, rec]  # (U, k) — i == j terms
    return (jnp.sum(pair) - jnp.sum(diag)) / (float(U) * k * (k - 1))


@jax.jit
def internal_similarity(
    rec: jnp.ndarray,  # (U, k)
    interaction: jnp.ndarray,  # (U, I) float 0/1 train+val matrix
    item_deg: jnp.ndarray,  # (I,) degrees from the train+val pos dicts
) -> jnp.ndarray:
    """Sorensen intra-list similarity (``metrics/diversity.py:66-115``):
    I = (1/(U k (k-1))) * sum_u sum_{i != j in rec_u} cooc(i,j)/sqrt(k_i k_j),
    pairs with zero degree skipped.

    cooc = A^T A (one MXU matmul); the per-user pair sum is the bilinear form
    b_u^T S b_u minus its diagonal, evaluated for all users as one (U,I)x(I,I)
    product.
    """
    U, k = rec.shape
    n_items = interaction.shape[1]

    S = similarity_matrix(interaction, item_deg)

    B = jnp.zeros((U, n_items), dtype=jnp.float32)
    B = B.at[jnp.arange(U)[:, None], rec].set(1.0)

    quad = jnp.sum(jnp.dot(B, S, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32) * B)
    diag_term = jnp.sum(B * jnp.diagonal(S)[None, :])
    return (quad - diag_term) / (float(U) * k * (k - 1))


@partial(jax.jit, static_argnames=("chunk",))
def internal_similarity_direct(
    rec: jnp.ndarray,  # (U, k)
    interaction: jnp.ndarray,  # (U_i, I) float 0/1 train+val matrix
    item_deg: jnp.ndarray,  # (I,)
    chunk: int = 128,
) -> jnp.ndarray:
    """I@k with NO (I, I) similarity matrix: for each user's list, gather the
    k interaction columns and form the (k, k) co-occurrence block directly
    (``cooc(i,j) = B[:,i].B[:,j]``, ``metrics/diversity.py:96-107``), degree-
    normalized and diagonal-subtracted. O(U^2 k^2 / chunk-batched) FLOPs and
    O(U_i * chunk * k) peak memory — the tall-catalog flavor where
    ``similarity_matrix``'s I^2 operand cannot exist. Zero-degree items carry
    inv-sqrt 0, reproducing the reference's skipped pairs."""
    U, k = rec.shape
    U_pad = -(-U // chunk) * chunk
    recp = jnp.pad(rec, ((0, U_pad - U), (0, 0)))
    valid = (jnp.arange(U_pad) < U).astype(jnp.float32)
    deg = item_deg.astype(jnp.float32)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)

    def body(c):
        rc = jax.lax.dynamic_slice_in_dim(recp, c * chunk, chunk, axis=0)
        vc = jax.lax.dynamic_slice_in_dim(valid, c * chunk, chunk, axis=0)
        sub = interaction[:, rc]  # (U_i, C, k)
        cooc = jnp.einsum(
            "uci,ucj->cij", sub, sub, precision=jax.lax.Precision.HIGHEST
        )
        inv = inv_sqrt[rc]  # (C, k)
        pair = cooc * inv[:, :, None] * inv[:, None, :]
        per_user = jnp.sum(pair, axis=(1, 2)) - jnp.trace(pair, axis1=1, axis2=2)
        return jnp.sum(per_user * vc)

    total = jnp.sum(jax.lax.map(body, jnp.arange(U_pad // chunk)))
    return total / (float(U) * k * (k - 1))


@jax.jit
def novelty_avg_degree(rec: jnp.ndarray, item_deg: jnp.ndarray) -> jnp.ndarray:
    """Novelty = mean train degree of recommended items — the metric the
    reference author prototyped but abandoned
    (``waste/metrics/novelty.py:11-48``; lower = more novel)."""
    U, k = rec.shape
    return jnp.sum(item_deg.astype(jnp.float32)[rec]) / (U * k)


@partial(jax.jit, static_argnames=())
def all_accuracy_metrics(rec, pos, pos_counts, present):
    """Fused P/R/NDCG in one compiled program (single device sync)."""
    p, r = precision_recall(rec, pos, pos_counts, present)
    n = ndcg_at_k(rec, pos, present)
    return p, r, n
