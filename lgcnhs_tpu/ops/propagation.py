"""LightGCN K-layer graph propagation.

The reference does edge-wise message passing over the joint (U+I)-node graph
via torch-geometric ``propagate`` with ``gcn_norm`` weights
(``model/LightGCN/model.py:53-84``). On TPU we exploit that the joint graph is
bipartite: with R_hat = D_u^-1/2 R D_i^-1/2, one joint propagation step is

    e_u' = R_hat   . e_i
    e_i' = R_hat^T . e_u

so the whole forward is 2K dense (or sparse) matmuls on the MXU — no edge
gather/scatter, no (U+I)^2 adjacency. The final embedding is the mean over
layers 0..K (``model/LightGCN/model.py:66-69``).

Two execution paths:
- dense: R_hat as a dense (U, I) matrix — optimal at MovieLens/Douban densities
  (the MXU eats 1k x 2k matmuls for breakfast; sparsity gather overhead loses).
- segment-sum: COO edges + jax.ops.segment_sum — for very sparse large graphs;
  also the reference semantics check for the dense path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_layers", "bf16_matmul"))
def lightgcn_propagate(
    user_emb: jnp.ndarray,  # (U, D) e_u^0
    item_emb: jnp.ndarray,  # (I, D) e_i^0
    R_hat: jnp.ndarray,  # (U, I) normalized bipartite incidence
    n_layers: int = 3,
    bf16_matmul: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense-path forward: returns (e_u^final, e_i^final) = per-side mean over
    layer stack 0..K (``model/LightGCN/model.py:60-72``).

    ``bf16_matmul=True`` is the MXU speed path: matmul INPUTS in bfloat16,
    accumulation and the layer mean in float32 (embeddings after sym-
    normalized propagation tolerate bf16 inputs; parity tests run the f32
    path).
    """
    eu, ei = user_emb, item_emb
    acc_u, acc_i = eu, ei
    if bf16_matmul:
        Rl = R_hat.astype(jnp.bfloat16)
        dot = lambda a, b: jnp.dot(
            a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        for _ in range(n_layers):
            eu, ei = dot(Rl, ei), dot(Rl.T, eu)
            acc_u = acc_u + eu
            acc_i = acc_i + ei
    else:
        dot = lambda a, b: jnp.dot(
            a,
            b,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=b.dtype,
        )
        for _ in range(n_layers):
            eu, ei = dot(R_hat, ei), dot(R_hat.T, eu)
            acc_u = acc_u + eu
            acc_i = acc_i + ei
    scale = 1.0 / (n_layers + 1)
    return acc_u * scale, acc_i * scale


@partial(jax.jit, static_argnames=("n_users", "n_items", "n_layers"))
def lightgcn_propagate_coo(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    edge_users: jnp.ndarray,  # (E,) int32
    edge_items: jnp.ndarray,  # (E,) int32
    edge_norm: jnp.ndarray,  # (E,) 1/sqrt(d_u d_i) per edge
    n_users: int,
    n_items: int,
    n_layers: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse segment-sum forward path — identical math to the dense path;
    preferred when the incidence is too sparse/large to densify."""
    eu, ei = user_emb, item_emb
    acc_u, acc_i = eu, ei
    for _ in range(n_layers):
        msg_u = jax.ops.segment_sum(
            ei[edge_items] * edge_norm[:, None], edge_users, num_segments=n_users
        )
        msg_i = jax.ops.segment_sum(
            eu[edge_users] * edge_norm[:, None], edge_items, num_segments=n_items
        )
        eu, ei = msg_u, msg_i
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (n_layers + 1)
    return acc_u * scale, acc_i * scale


class EdgeOrdering(NamedTuple):
    """The same weighted bipartite edge list in BOTH sorted orders.

    TPU scatter-adds with unsorted segment ids are the COO path's bottleneck
    (measured 0.35 s/step at E=2M vs ~10x less sorted): ``segment_sum`` with
    ``indices_are_sorted=True`` lowers to a much cheaper row-run accumulation.
    Keeping one copy of the edges sorted by user and one by item makes every
    scatter in BOTH the forward and the backward pass a sorted segment sum
    (see ``make_coo_propagator``); the random-access side of each edge is
    then only ever a gather.
    """

    eu_by_u: jnp.ndarray  # (E,) edge users, ascending
    ei_by_u: jnp.ndarray  # (E,) matching items (user-sorted order)
    norm_by_u: jnp.ndarray  # (E,) matching weights
    eu_by_i: jnp.ndarray  # (E,) users in item-sorted order
    ei_by_i: jnp.ndarray  # (E,) edge items, ascending
    norm_by_i: jnp.ndarray  # (E,)


def build_edge_ordering(
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    edge_norm: jnp.ndarray,
) -> EdgeOrdering:
    """Sort the weighted edge list by user and by item (stable, so equal-id
    runs keep the input edge order). One-time cost, hoistable out of any
    training scan; jit-safe."""
    pu = jnp.argsort(edge_users, stable=True)
    pi = jnp.argsort(edge_items, stable=True)
    return EdgeOrdering(
        eu_by_u=edge_users[pu], ei_by_u=edge_items[pu], norm_by_u=edge_norm[pu],
        eu_by_i=edge_users[pi], ei_by_i=edge_items[pi], norm_by_i=edge_norm[pi],
    )


def _self_adjoint_pair(pair_fn):
    """Wrap a linear bipartite pair ``(x_u, x_i) -> (A x_i, A^T x_u)`` with
    the self-adjoint custom VJP: the joint operator [[0, A], [A^T, 0]] is
    symmetric, so the backward is ``pair_fn`` applied to the cotangents —
    the same trick the Pallas dual kernel uses
    (``ops/pallas/propagation.py``). This keeps the backward on the same
    primitives as the forward; autodiff would instead transpose the gathers
    into unsorted scatter-adds over the full edge set."""

    @jax.custom_vjp
    def pair(x_u, x_i):
        return pair_fn(x_u, x_i)

    def fwd(x_u, x_i):
        return pair_fn(x_u, x_i), None

    def bwd(_, cot):
        return pair_fn(*cot)

    pair.defvjp(fwd, bwd)
    return pair


def _layer_mean(pair, user_emb, item_emb, n_layers: int):
    """K applications of the propagation pair + the layer-stack mean
    (``model/LightGCN/model.py:60-72``) — shared by every COO layout."""
    eu, ei = user_emb, item_emb
    acc_u, acc_i = eu, ei
    for _ in range(n_layers):
        eu, ei = pair(eu, ei)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (n_layers + 1)
    return acc_u * scale, acc_i * scale


def make_coo_propagator(order: EdgeOrdering, n_users: int, n_items: int):
    """One bipartite propagation layer over sorted edges
    (``_self_adjoint_pair`` custom VJP): every scatter is a sorted segment
    sum in forward AND backward; the random-access side is only gathers."""

    def _pair(x_u, x_i):
        msg_u = jax.ops.segment_sum(
            x_i[order.ei_by_u] * order.norm_by_u[:, None],
            order.eu_by_u,
            num_segments=n_users,
            indices_are_sorted=True,
        )
        msg_i = jax.ops.segment_sum(
            x_u[order.eu_by_i] * order.norm_by_i[:, None],
            order.ei_by_i,
            num_segments=n_items,
            indices_are_sorted=True,
        )
        return msg_u, msg_i

    return _self_adjoint_pair(_pair)


def lightgcn_propagate_coo_sorted(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    order: EdgeOrdering,
    n_users: int,
    n_items: int,
    n_layers: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``lightgcn_propagate_coo`` on pre-sorted edges — same math (summation
    order within a segment differs, float-level only), sorted scatters in
    forward and backward."""
    pair = make_coo_propagator(order, n_users, n_items)
    return _layer_mean(pair, user_emb, item_emb, n_layers)


class BucketedSide(NamedTuple):
    """Degree-bucketed ELL layout of one aggregation direction.

    TPU profile at E=2M, D=64 (one v5e chip): a same-volume gather+reduce
    runs 6.5 ms but ``segment_sum`` costs 22 ms sorted / 35 ms unsorted —
    the scatter-add is the COO path's real bottleneck, not the gather. This
    layout removes scatters entirely: nodes are grouped by quantized degree
    (``_bucket_caps``: multiples of 8, then 1/8-octave steps — pad ratio
    <= ~1.13 vs 1.51 for the round-3 power-of-two rule); each bucket stores
    a padded (Nb, Pb) neighbor matrix + weight matrix, aggregation is
    gather + dense masked sum over the pad axis, and results are
    reassembled by ONE inverse-permutation gather (zero-degree nodes read
    an appended zeros row).
    """

    nbr: tuple  # per bucket: (Nb, Pb) int32 neighbor ids (0-padded)
    w: tuple  # per bucket: (Nb, Pb) f32 edge weights (0-padded)
    inv: jnp.ndarray  # (n_out,) int32 row of each node in concat(+zeros)


class BucketedIncidence(NamedTuple):
    users: BucketedSide  # aggregates item vectors INTO users
    items: BucketedSide  # aggregates user vectors INTO items


def _bucket_caps(deg: np.ndarray, min_cap: int, quantum: int = 8) -> np.ndarray:
    """Per-node ELL row capacity: the round-3 power-of-two rule padded the
    bench graph's Poisson(40) degrees to cap 64 — a measured 1.51x gather
    volume (and the aggregation is gather-ISSUE-bound on TPU, so padded
    slots cost exactly like real ones; see docs/PERF.md COO roofline).
    Tighter rule: multiples of ``quantum`` up to 16*quantum (<=16 linear
    buckets), then 1/8-octave geometric steps (pad <= 1.125 per row, bucket
    count O(8 log2(max_deg)) so heavy-tailed real graphs don't explode the
    op count). Measured 1.36x on the 50k x 30k / 2M-edge train step."""
    deg = deg.astype(np.int64)
    caps = np.maximum(min_cap, -(-deg // quantum) * quantum)
    big = deg > 16 * quantum
    if big.any():
        e = np.floor(np.log2(deg[big])).astype(np.int64)
        step = np.maximum(1, (1 << e) // 8)  # 8 sub-steps per octave
        caps[big] = -(-deg[big] // step) * step
    return caps


class EllGrouping(NamedTuple):
    """Host-side per-device intermediates of the quantized-cap ELL grouping
    (one aggregation direction): edges sorted by destination, per-node
    degrees/rowptr, the present nodes and their ``_bucket_caps`` capacities.
    Shared by the single-chip ``_bucketize_side`` and the mesh
    ``parallel.sharding._bucketize_side_sharded`` (which adds cross-device
    cap-union/row-padding on top) so the grouping spec lives in ONE place."""

    nbrs_s: np.ndarray  # neighbor ids, edge order sorted by destination
    w_s: np.ndarray  # edge weights, same order
    deg: np.ndarray  # (n_out,) destination degrees
    rowptr: np.ndarray  # (n_out + 1,) prefix sums of deg
    present: np.ndarray  # destination ids with deg > 0
    caps: np.ndarray  # per-present-node ELL row capacity


def _ell_group(ids, nbrs, w, n_out: int, min_cap: int) -> EllGrouping:
    ids = np.asarray(ids)
    nbrs = np.asarray(nbrs)
    # preserve the weight dtype (f64 under x64 parity runs; f32 otherwise)
    w = np.asarray(w)
    if not np.issubdtype(w.dtype, np.floating):
        w = w.astype(np.float32)
    order = np.argsort(ids, kind="stable")
    ids_s, nbrs_s, w_s = ids[order], nbrs[order], w[order]
    deg = np.bincount(ids_s, minlength=n_out) if ids_s.size else np.zeros(
        n_out, np.int64
    )
    rowptr = np.concatenate([[0], np.cumsum(deg)])
    present = np.nonzero(deg)[0]
    caps = (
        _bucket_caps(deg[present], min_cap)
        if present.size
        else np.zeros(0, np.int64)
    )
    return EllGrouping(nbrs_s, w_s, deg, rowptr, present, caps)


def _ell_fill(g: EllGrouping, sel: np.ndarray, cap: int, w_dtype):
    """(nbr, w) ELL matrices (len(sel), cap) for the selected destination
    nodes: per-row gather of the sorted edge block, zero-padded past each
    row's degree. The ``posc`` clamp keeps the padded-lane gather in
    bounds; ``valid`` zeroes it out."""
    base = g.rowptr[sel]
    pos = base[:, None] + np.arange(cap)[None, :]
    valid = np.arange(cap)[None, :] < g.deg[sel][:, None]
    posc = np.minimum(pos, max(g.nbrs_s.shape[0] - 1, 0))
    nbr_m = np.where(valid, g.nbrs_s[posc], 0).astype(np.int32)
    w_m = np.where(valid, g.w_s[posc], 0.0).astype(w_dtype)
    return nbr_m, w_m


def _bucketize_side(ids, nbrs, w, n_out: int, min_cap: int) -> BucketedSide:
    g = _ell_group(ids, nbrs, w, n_out, min_cap)
    nbr_mats, w_mats = [], []
    inv = np.full(n_out, -1, np.int64)
    row_base = 0
    for cap in np.unique(g.caps):
        sel = g.present[g.caps == cap]
        nbr_m, w_m = _ell_fill(g, sel, int(cap), g.w_s.dtype)
        nbr_mats.append(nbr_m)
        w_mats.append(w_m)
        inv[sel] = row_base + np.arange(sel.shape[0])
        row_base += sel.shape[0]
    inv[inv < 0] = row_base  # the appended zeros row
    return BucketedSide(
        tuple(jnp.asarray(m) for m in nbr_mats),
        tuple(jnp.asarray(m) for m in w_mats),
        jnp.asarray(inv.astype(np.int32)),
    )


def build_bucketed_incidence(
    edge_users, edge_items, edge_norm, n_users: int, n_items: int,
    min_cap: int = 4,
) -> BucketedIncidence:
    """Host-side (numpy) one-time build of both aggregation directions.
    Padding overhead is bounded by ~1.13x the edges plus min_cap per
    low-degree node (``_bucket_caps`` quantized-cap rule)."""
    return BucketedIncidence(
        users=_bucketize_side(edge_users, edge_items, edge_norm, n_users, min_cap),
        items=_bucketize_side(edge_items, edge_users, edge_norm, n_items, min_cap),
    )


def _bucketed_aggregate(side: BucketedSide, x: jnp.ndarray) -> jnp.ndarray:
    # NOTE: a bf16-gather flavor (cast x to bfloat16 before the gather to
    # halve HBM read traffic) was measured SLOWER on chip (8.2k vs 10.7k
    # examples/s at E=2M) — the dtype casts break the gather->reduce fusion
    # — so the aggregation stays at the input dtype.
    parts = [
        jnp.sum(x[nb] * w[:, :, None].astype(x.dtype), axis=1)
        for nb, w in zip(side.nbr, side.w)
    ]
    parts.append(jnp.zeros((1, x.shape[1]), x.dtype))
    return jnp.concatenate(parts, axis=0)[side.inv]


def make_bucketed_propagator(binc: BucketedIncidence):
    """One bipartite propagation layer over the bucketed layout
    (``_self_adjoint_pair`` custom VJP): with the bucketed forward this
    makes BOTH passes scatter-free — autodiff of the gathers would
    otherwise transpose them into exactly the unsorted scatter-adds this
    layout eliminates."""

    def _pair(x_u, x_i):
        return (
            _bucketed_aggregate(binc.users, x_i),
            _bucketed_aggregate(binc.items, x_u),
        )

    return _self_adjoint_pair(_pair)


def lightgcn_propagate_bucketed(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    binc: BucketedIncidence,
    n_layers: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``lightgcn_propagate_coo`` on the scatter-free bucketed layout — same
    math up to float summation order."""
    return _layer_mean(make_bucketed_propagator(binc), user_emb, item_emb, n_layers)


def edge_gcn_norm(
    edge_users: jnp.ndarray,
    edge_items: jnp.ndarray,
    n_users: int,
    n_items: int,
) -> jnp.ndarray:
    """Per-edge symmetric normalization 1/sqrt(d_u d_i) — torch-geometric
    ``gcn_norm(add_self_loops=False)`` weights (``model/LightGCN/model.py:53``).
    Degrees count edge-list entries, so pass a DEDUPED edge list for
    reference parity: the reference always round-trips its edges through a
    dense 0/1 adjacency before gcn_norm (``utils/graph.py:23-25``), which
    collapses duplicated rating rows — the trainer feeds
    ``data/graph.unique_edges`` output so COO degrees match the dense
    ``normalized_bipartite`` graph exactly."""
    du = jax.ops.segment_sum(
        jnp.ones_like(edge_users, dtype=jnp.float32), edge_users, num_segments=n_users
    )
    di = jax.ops.segment_sum(
        jnp.ones_like(edge_items, dtype=jnp.float32), edge_items, num_segments=n_items
    )
    inv = lambda d: jnp.where(d > 0, jax.lax.rsqrt(d), 0.0)
    return inv(du)[edge_users] * inv(di)[edge_items]
