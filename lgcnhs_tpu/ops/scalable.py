"""Memory-scalable kernels: nothing here materializes an O(U*I) array.

The dense trainer path (``train/trainer.py``) keeps (U, I) matrices resident
— optimal at MovieLens/Douban scale, impossible at the 200k-user x 100k-item
scale where ``choose_propagation`` picks "coo" (the dense incidence alone
would be tens of GB). This module provides the large-graph replacements:

- negative-sampling rejection via per-user binary search over a user-major
  CSR edge list instead of a dense ``pos_mask`` row gather
  (``models/lightgcn.sample_bpr_batch``; reference semantics are
  torch-geometric ``structured_negative_sampling``,
  ``model/LightGCN/loss.py:58``) — the candidate stream is IDENTICAL to the
  dense sampler's (same RNG splits/draws, same first-non-colliding pick)
- chunked masked top-k retrieval: the (U, I) score matrix is produced and
  masked one user-chunk at a time (reference equivalent
  ``model/LightGCN/evaluation.py:17-54`` scores the full matrix at once)
- hit matrices for P/R/NDCG via the same CSR binary search instead of a
  dense (U, I) positives gather (``metrics/accurate.py:26-42``)
- Sorensen internal similarity over the co-occurrence Gram restricted to the
  DISTINCT RECOMMENDED items (scipy.sparse on host) instead of the dense
  (I, I) matrix (``metrics/diversity.py:66-115``)

All index bookkeeping is int32: a (user, item) composite int64 key is not
available under JAX's default x64-disabled config, so membership tests are
per-user bounded binary searches (32 fixed bisection steps, branch-free).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.data.graph import EdgeSet


def user_csr(n_users: int, es: EdgeSet) -> Tuple[np.ndarray, np.ndarray]:
    """User-major CSR of an edge set: (rowptr (U+1,) int32, cols (E,) int32)
    with each user's item list sorted (and deduplicated — matching the dense
    0/1 ``interaction_matrix``/``pos_bool_matrix`` which set, not add).

    Built by the native C++ graph builder when available (counting sort +
    per-row dedup, ~6x numpy's lexsort at 10M edges — see
    ``cli/bench_native.py``); numpy fallback inside ``native.build_csr``."""
    from lgcnhs_tpu.native.bindings import build_csr

    indptr, indices = build_csr(
        np.asarray(es.users), np.asarray(es.items), n_users
    )
    return indptr.astype(np.int32), indices


def _segment_lower_bound(cols, lo, hi, target):
    """Vectorized branch-free lower_bound of ``target`` within
    ``cols[lo:hi]`` (each query has its own [lo, hi) segment). 32 bisection
    steps cover any int32 segment length."""
    E = cols.shape[0]
    for _ in range(32):
        active = lo < hi
        mid = (lo + hi) >> 1
        v = cols[jnp.clip(mid, 0, max(E - 1, 0))]
        less = v < target
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
    return lo


def _csr_contains(rowptr, cols, users, items):
    """Boolean membership of (users[i], items[i]) in the CSR edge set."""
    E = cols.shape[0]
    lo = rowptr[users]
    hi = rowptr[users + 1]
    pos = _segment_lower_bound(cols, lo, hi, items)
    return (pos < hi) & (cols[jnp.clip(pos, 0, max(E - 1, 0))] == items)


@partial(jax.jit, static_argnames=("batch_size", "n_items", "n_retries"))
def sample_bpr_batch_csr(
    key: jax.Array,
    edge_users: jnp.ndarray,  # (E,) the raw (with-multiplicity) edge list
    edge_items: jnp.ndarray,  # (E,)
    rowptr: jnp.ndarray,  # (U+1,) CSR over the SAME split, for rejection
    cols: jnp.ndarray,  # (Ec,) sorted item lists
    batch_size: int,
    n_items: int,
    n_retries: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``models.lightgcn.sample_bpr_batch`` without the (U, I)
    ``pos_mask``. The RNG structure (one split, one edge draw, one
    (n_retries, B) candidate draw, first-non-colliding pick) is byte-for-byte
    the dense sampler's, so the emitted triple stream is bit-identical —
    asserted by ``tests/test_scalable.py``."""
    k_edge, k_neg = jax.random.split(key)
    n_edges = edge_users.shape[0]
    idx = jax.random.randint(k_edge, (batch_size,), 0, n_edges)
    users = edge_users[idx]
    pos_items = edge_items[idx]

    cands = jax.random.randint(k_neg, (n_retries, batch_size), 0, n_items)
    collide = _csr_contains(
        rowptr, cols, jnp.broadcast_to(users[None, :], cands.shape), cands
    )
    first_ok = jnp.argmax(~collide, axis=0)
    negs = jnp.take_along_axis(cands, first_ok[None, :], axis=0)[0]
    return users, pos_items, negs


@partial(jax.jit, static_argnames=("n_items", "n_retries", "reject_user_ids"))
def sample_negatives_for_edges_csr(
    key: jax.Array,
    edge_users: jnp.ndarray,  # (E,)
    edge_items: jnp.ndarray,  # (E,)
    rowptr: jnp.ndarray,  # (U+1,) CSR over the SAME split, for rejection
    cols: jnp.ndarray,  # (Ec,) sorted item lists
    n_items: int,
    n_retries: int = 8,
    reject_user_ids: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CSR flavor of ``models.lightgcn.sample_negatives_for_edges`` — every
    edge exactly once in order, one rejected negative each (the reference's
    ``calValLoss`` sampling, ``model/LightGCN/evaluation.py:68-77``), with
    membership tested by per-user binary search instead of a dense (U, I)
    ``pos_mask``. Same RNG draws as the dense flavor, so the two emit
    bit-identical negative streams; ``reject_user_ids`` is the
    ``contains_neg_self_loops=False`` rejection (see the dense flavor's
    docstring)."""
    E = edge_users.shape[0]
    cands = jax.random.randint(key, (n_retries, E), 0, n_items)
    collide = _csr_contains(
        rowptr, cols, jnp.broadcast_to(edge_users[None, :], cands.shape), cands
    )
    if reject_user_ids:
        collide = collide | (cands == edge_users[None, :])
    first_ok = jnp.argmax(~collide, axis=0)
    negs = jnp.take_along_axis(cands, first_ok[None, :], axis=0)[0]
    return edge_users, edge_items, negs


@jax.jit
def hits_csr(rec: jnp.ndarray, rowptr: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """(U, k) 0/1 hit matrix — ``metrics_ops.hit_matrix`` against CSR
    positives instead of a dense (U, I) gather."""
    U, k = rec.shape
    users = jnp.broadcast_to(jnp.arange(U, dtype=rec.dtype)[:, None], rec.shape)
    return _csr_contains(rowptr, cols, users, rec).astype(jnp.float32)


@partial(jax.jit, static_argnames=("k",), donate_argnums=())
def _chunk_masked_topk(ue_chunk, item_emb, rows, cols, valid, k):
    """One user-chunk of masked retrieval: scatter of the chunk's seen edges
    + masked top-k. ``rows``/``cols`` are padded to a static length; padding
    carries valid=False and lands on (0, 0) under a logical-or scatter, so
    it cannot mask a real cell. On TPU the score+select runs in the fused /
    streaming Pallas kernels (identical index contract); off-TPU it
    materializes the (C, I) score block."""
    from lgcnhs_tpu.ops.topk import masked_topk

    seen = jnp.zeros(
        (ue_chunk.shape[0], item_emb.shape[0]), dtype=bool
    ).at[rows, cols].max(valid)
    if jax.default_backend() == "tpu" and ue_chunk.dtype != jnp.float64:
        from lgcnhs_tpu.ops.pallas.retrieval import (
            fits_vmem_retrieval,
            fused_topk_retrieval,
            pick_stream_tile,
            streaming_topk_retrieval,
        )

        if fits_vmem_retrieval(item_emb.shape[0], item_emb.shape[1]):
            return fused_topk_retrieval(ue_chunk, item_emb, seen, k)[0]
        tile = pick_stream_tile(item_emb.shape[1], min(k, item_emb.shape[0]))
        if tile is not None:
            return streaming_topk_retrieval(
                ue_chunk, item_emb, seen, k, item_tile=tile
            )[0]
        # pathological D: no streaming tile fits VMEM — XLA chain below
    scores = jnp.dot(
        ue_chunk, item_emb.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=ue_chunk.dtype,
    )
    return masked_topk(scores, seen, k)


def chunked_masked_topk(
    user_emb,
    item_emb,
    rowptr: np.ndarray,
    cols: np.ndarray,
    k: int,
    chunk_bytes: float = 256e6,
) -> np.ndarray:
    """(U, k) masked top-k retrieval with peak extra memory one
    (chunk, I) score block (~``chunk_bytes``) instead of the full (U, I)
    matrix. Emits exactly ``ops.topk.masked_topk``'s ids (same kernel per
    chunk; chunking the user axis cannot change per-user results)."""
    U = user_emb.shape[0]
    I = item_emb.shape[0]
    C = int(max(64, min(U, chunk_bytes / (4 * I))))
    n_chunks = (U + C - 1) // C
    # one static edge-pad length across chunks -> a single XLA compilation
    counts = rowptr[1:] - rowptr[:-1]
    e_max = 1
    for s in range(0, U, C):
        e_max = max(e_max, int(counts[s:s + C].sum()))

    ue = np.asarray(user_emb)
    out = np.empty((U, k), dtype=np.int32)
    for ci in range(n_chunks):
        s = ci * C
        e = min(s + C, U)
        lo, hi = int(rowptr[s]), int(rowptr[e])
        n_e = hi - lo
        rows = np.zeros(e_max, dtype=np.int32)
        ccols = np.zeros(e_max, dtype=np.int32)
        valid = np.zeros(e_max, dtype=bool)
        rows[:n_e] = np.repeat(
            np.arange(e - s, dtype=np.int32), counts[s:e].astype(np.int64)
        )
        ccols[:n_e] = cols[lo:hi]
        valid[:n_e] = True
        ue_chunk = ue[s:e]
        if e - s < C:  # pad the tail chunk to the static width
            ue_chunk = np.pad(ue_chunk, ((0, C - (e - s)), (0, 0)))
        rec = _chunk_masked_topk(
            jnp.asarray(ue_chunk), item_emb, jnp.asarray(rows),
            jnp.asarray(ccols), jnp.asarray(valid), k,
        )
        out[s:e] = np.asarray(rec)[: e - s]
    return out


def _csr_gather_pairs(G, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Elementwise gather G[rows[i], cols[i]] from a scipy CSR matrix via
    vectorized numpy binary search (scipy's fancy indexing builds a matrix
    per call — far too slow for U*k^2 queries)."""
    indptr, indices, data = G.indptr, G.indices, G.data
    lo = indptr[rows].astype(np.int64)
    hi = indptr[rows + 1].astype(np.int64)
    tgt = cols.astype(indices.dtype)
    for _ in range(int(np.ceil(np.log2(max(2, G.shape[1]))) + 1)):
        active = lo < hi
        mid = (lo + hi) >> 1
        v = indices[np.clip(mid, 0, max(len(indices) - 1, 0))]
        less = active & (v < tgt)
        geq = active & ~less
        lo[less] = mid[less] + 1
        hi[geq] = mid[geq]
    found = (lo < indptr[rows + 1]) & (
        indices[np.clip(lo, 0, max(len(indices) - 1, 0))] == tgt
    )
    out = np.zeros(len(rows), dtype=data.dtype if len(data) else np.float32)
    out[found] = data[np.clip(lo, 0, max(len(data) - 1, 0))[found]]
    return out


def internal_similarity_csr(
    rec: np.ndarray,  # (U, k)
    interaction_edges: Tuple[np.ndarray, np.ndarray],  # dedup (users, items)
    n_users: int,
    n_items: int,
    item_deg: np.ndarray,  # (I,)
) -> float:
    """Exact Sorensen intra-list similarity (``metrics/diversity.py:66-115``,
    identical math to ``metrics_ops.internal_similarity``) without the (I, I)
    co-occurrence matrix: the Gram A^T A is computed only over the DISTINCT
    RECOMMENDED items (scipy sparse product), then the per-user k x k pair
    values are gathered by binary search. Peak memory is O(E + nnz(Gram over
    recommended items)) — the (U, I) and (I, I) denses never exist."""
    import scipy.sparse as sp

    U, k = rec.shape
    uniq, inv = np.unique(rec.ravel(), return_inverse=True)
    eu, ei = interaction_edges
    A = sp.csr_matrix(
        (np.ones(len(eu), np.float32), (eu, ei)), shape=(n_users, n_items)
    )
    A.data[:] = 1.0  # duplicate edges sum in COO->CSR; the reference
    # interaction matrix is 0/1 (utils/trans.py:13-29)
    Asub = A[:, uniq]  # (U, R) — column slice keeps sparsity
    G = (Asub.T @ Asub).tocsr()  # (R, R) co-occurrence of recommended items

    deg = np.asarray(item_deg, np.float64)[uniq]
    with np.errstate(divide="ignore"):
        inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)

    ridx = inv.reshape(U, k)
    rows = np.repeat(ridx, k, axis=1).ravel()
    cols = np.tile(ridx, (1, k)).ravel()
    vals = _csr_gather_pairs(G, rows, cols).astype(np.float64)
    s = vals * inv_sqrt[rows] * inv_sqrt[cols]
    total = float(s.sum())
    diag = float(s[rows == cols].sum())
    return (total - diag) / (U * k * (k - 1))
