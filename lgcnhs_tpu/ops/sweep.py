"""Fused on-device lambda sweep for the findLambda driver.

Re-design of the reference's hyperparameter sweep loop
(``findLambda.py:83-116``): the reference runs 101 host iterations, each
computing a dense numpy HybridS transfer + resource pass
(``model/SpreadLightGCNOpti/model.py:173-188`` via ``findLambda.py:95``), a
per-user python ranking loop (``model/SpreadLightGCNOpti/recommend.py:18-53``)
and python-loop metrics — the Hamming metric alone is an O(U^2) double loop
(``metrics/diversity.py:32-58``) — per lambda.

Here the ENTIRE grid is one XLA program. G, A, W_gen, the seen mask, the
eval-split arrays, and the Sorensen similarity matrix are device-resident
loop constants hoisted out of the sweep (the reference also hoists G and
W_gen, ``findLambda.py:79-81``, but recomputes everything else);
``lax.map`` iterates the lambda grid on-device, each iteration fusing
diffusion -> Hadamard -> ranking -> all five raw metrics. F1 is defined on
the 5-decimal ROUNDED P/R (``metrics/accurate.py:48-56``), so it stays in
the host wrapper (``eval/metrics.py`` semantics).

Lambda points are embarrassingly parallel, so ``sharded_lambda_sweep``
splits the grid over EVERY device of a mesh (``shard_map`` over the
flattened device array as one "sweep" axis — for a grid sweep the best use
of the chips is one grid point per chip, not sharding each point's matmuls).

Layout ladder: ``lambda_sweep_metrics`` (dense, hoisted W_gen + S) ->
``lambda_sweep_metrics_tall`` (single chip, tall catalog: no (I, I) operand
— W-free factored diffusion + direct Sorensen) ->
``sharded_lambda_sweep``/``item_sharded_lambda_sweep`` (mesh).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lgcnhs_tpu.ops import metrics_ops
from lgcnhs_tpu.ops.diffusion import user_factored_diffusion_scores
from lgcnhs_tpu.ops.topk import rank_exclude_seen_topk

SWEEP_AXIS = "sweep"

# Column order of the metric rows returned by the sweep kernels.
METRIC_COLUMNS = ("P", "R", "NDCG", "H", "I")


def _blended_transfer(W_gen, k_item, lam):
    """Per-grid-point HybridS transfer: W_gen / (k_i^(1-lam) (x) k_j^lam)
    with the reference's zero-degree guard
    (``model/SpreadMethod/model.py:62-85``). Shared by both sweep layouts so
    their promised row-identity can't drift apart."""
    alpha = jnp.power(k_item, 1.0 - lam)
    beta = jnp.power(k_item, lam)
    denom = alpha[:, None] * beta[None, :]
    return W_gen / jnp.where(denom == 0, 1.0, denom)


def _metrics_for_rec(rec, eval_pos, eval_counts, eval_present, S, n_items,
                     intra_sim=None):
    """All five raw (unrounded) reference metrics for one (U, k) rec array.
    ``intra_sim`` overrides the Sorensen term (the tall flavor has no S
    matrix); default is the S-gather kernel."""
    hits = metrics_ops.hit_matrix(rec, eval_pos)
    p, r = metrics_ops.precision_recall_from_hits(hits, eval_counts, eval_present)
    n = metrics_ops.ndcg_from_hits(hits, eval_present)
    h = metrics_ops.hamming_distance(rec, n_items)
    i = (metrics_ops.internal_similarity_from_matrix(rec, S)
         if intra_sim is None else intra_sim(rec))
    return jnp.stack([p, r, n, h, i])


@partial(jax.jit, static_argnames=("k",))
def lambda_sweep_metrics(
    lambdas: jnp.ndarray,  # (L,) lambda grid
    G: jnp.ndarray,  # (U, I) allocation matrix (masked layer-0 scores)
    A: jnp.ndarray,  # (U, I) train+val interaction matrix
    W_gen: jnp.ndarray,  # (I, I) general spreading matrix
    seen: jnp.ndarray,  # (U, I) bool train+val positives
    eval_pos: jnp.ndarray,  # (U, I) bool eval-split positives
    eval_counts: jnp.ndarray,  # (U,)
    eval_present: jnp.ndarray,  # (U,) bool
    S: jnp.ndarray,  # (I, I) Sorensen similarity (metrics_ops.similarity_matrix)
    k: int,
) -> jnp.ndarray:
    """(L, 5) raw metrics [P, R, NDCG, H, I] for every lambda, on-device.

    Per grid point: W = W_gen / (k_i^(1-l) (x) k_j^l), F = A.W, rec =
    rank_exclude_seen(G*F) — the exact SpreadLightGCNOpti serving semantics
    (``findLambda.py:95-99``) — then the metric kernels on the device-resident
    eval arrays. ``lax.map`` keeps one iteration's (U, I)/(I, I) temporaries
    live at a time (a vmap over the grid would materialize (L, U, I))."""
    k_item = jnp.sum(A, axis=0)
    n_items = A.shape[1]

    def body(lam):
        W = _blended_transfer(W_gen, k_item, lam)
        F = jnp.dot(
            A, W, precision=jax.lax.Precision.HIGHEST, preferred_element_type=A.dtype
        )
        rec = rank_exclude_seen_topk(G * F, seen, k, filter_seen=True)
        return _metrics_for_rec(rec, eval_pos, eval_counts, eval_present, S, n_items)

    return jax.lax.map(body, lambdas)


@partial(jax.jit, static_argnames=("k",))
def lambda_sweep_metrics_tall(
    lambdas: jnp.ndarray,  # (L,)
    G: jnp.ndarray,  # (U, I) allocation matrix
    A: jnp.ndarray,  # (U, I) train+val interaction matrix
    seen: jnp.ndarray,  # (U, I) bool
    eval_pos: jnp.ndarray,  # (U, I) bool
    eval_counts: jnp.ndarray,  # (U,)
    eval_present: jnp.ndarray,  # (U,) bool
    item_deg: jnp.ndarray,  # (I,)
    k: int,
) -> jnp.ndarray:
    """``lambda_sweep_metrics`` for TALL catalogs (2U < I): identical rows,
    but with NO (I, I) operand anywhere — neither the hoisted W_gen nor the
    Sorensen similarity matrix exists at catalogs past ``choose_diffusion``'s
    budget. Per grid point the resource matrix comes from the W-free
    user-factored algebra (``ops/diffusion.user_factored_diffusion_scores``)
    and the Sorensen metric from the direct (U, k, k) co-occurrence kernel
    (``metrics_ops.internal_similarity_direct``) over A itself — the
    reference's diversity metrics consume the same train+val interaction
    matrix the diffusion does (``findLambda.py:74,106-114``). Row equality
    with the dense sweep is pinned in tests/test_sweep.py."""
    n_items = A.shape[1]

    def body(lam):
        F = user_factored_diffusion_scores(A, lam)
        rec = rank_exclude_seen_topk(G * F, seen, k, filter_seen=True)
        return _metrics_for_rec(
            rec, eval_pos, eval_counts, eval_present, None, n_items,
            intra_sim=lambda r: metrics_ops.internal_similarity_direct(
                r, A, item_deg
            ),
        )

    return jax.lax.map(body, lambdas)


# Per-device bytes the grid-parallel sweep may spend on replicated operands
# before falling back to the item-sharded sweep. The replicated set is two
# (I, I) operators (W_gen, S) plus five (U, I)-class arrays (G, A, seen,
# eval_pos, plus the per-point W/F temporaries) — fine at ML-100K/1M scale,
# dead on arrival at catalogs that actually need a mesh.
SWEEP_REPLICATION_BUDGET_BYTES = 4 * 1024**3


def _replicated_sweep_bytes(n_users: int, n_items: int, itemsize: int = 4) -> int:
    """Per-device high-water estimate of the grid-parallel sweep: replicated
    operands + one grid point's (I, I) W and (U, I) F temporaries, at the
    operands' element size (8 under the float64 parity configuration)."""
    return itemsize * (3 * n_items * n_items + 6 * n_users * n_items)


def sharded_lambda_sweep(
    mesh: Mesh,
    lambdas,
    G,
    A,
    W_gen,
    seen,
    eval_pos,
    eval_counts,
    eval_present,
    S,
    k: int,
    memory_budget_bytes: int = SWEEP_REPLICATION_BUDGET_BYTES,
    item_deg=None,
) -> jnp.ndarray:
    """(L, 5) metrics for the grid on a mesh, by one of two layouts:

    - grid-parallel (default): the lambda grid sharded over ALL devices
      (the (data, model) axes flattened into one "sweep" axis), operands
      REPLICATED — at sweep scale the grid axis, not the catalog, is what
      parallelizes, and one grid point per device is the best use of the
      chips.
    - item-sharded fallback: when replicating the operands would exceed
      ``memory_budget_bytes`` per device (catalogs that outgrow a chip —
      the regime the mesh exists for), the catalog axis is sharded over the
      model axis instead and the grid runs point-at-a-time with collective
      matmuls + the distributed spread ranker (``item_sharded_lambda_sweep``).

    Both layouts produce identical rows (pinned in tests/test_sweep.py)."""
    if _replicated_sweep_bytes(
        A.shape[0], A.shape[1], jnp.asarray(A).dtype.itemsize
    ) > memory_budget_bytes:
        return item_sharded_lambda_sweep(
            mesh, lambdas, G, A, W_gen, seen, eval_pos, eval_counts,
            eval_present, S, k, item_deg=item_deg,
        )

    if W_gen is None:
        from lgcnhs_tpu.ops.diffusion import general_spreading_matrix

        W_gen = general_spreading_matrix(A)
    if S is None:
        from lgcnhs_tpu.ops.metrics_ops import similarity_matrix

        # item_deg MUST be the reference's duplicate-counting degree vector
        # (eval.metrics.EvalContext.item_deg) when the caller has one — a
        # column sum of the 0/1 A undercounts duplicated rating rows and
        # shifts the I@k column vs the single-device sweep
        if item_deg is None:
            item_deg = jnp.sum(jnp.asarray(A, jnp.float32), axis=0)
        S = similarity_matrix(jnp.asarray(A, jnp.float32), jnp.asarray(item_deg))

    devices = mesh.devices.reshape(-1)
    n_dev = devices.size
    # keep the caller's lambda dtype (f64 under the x64 parity config —
    # a forced f32 cast here would break the "identical rows vs
    # lambda_sweep_metrics" contract; round-5 review finding)
    lambdas = jnp.asarray(lambdas)
    L = lambdas.shape[0]
    pad = (-L) % n_dev
    if pad:
        lambdas = jnp.concatenate([lambdas, jnp.repeat(lambdas[-1:], pad)])
    sweep_mesh = Mesh(devices, (SWEEP_AXIS,))

    local = lambda lams, G, A, Wg, sn, ep, ec, pr, S: lambda_sweep_metrics(
        lams, G, A, Wg, sn, ep, ec, pr, S, k
    )
    run = jax.jit(
        shard_map(
            local,
            mesh=sweep_mesh,
            in_specs=(P(SWEEP_AXIS),) + (P(),) * 8,
            out_specs=P(SWEEP_AXIS),
            check_vma=False,
        )
    )
    out = run(lambdas, G, A, W_gen, seen, eval_pos, eval_counts, eval_present, S)
    return out[:L]


def sharded_lambda_sweep_tall(
    mesh: Mesh,
    lambdas,
    G,
    A,
    seen,
    eval_pos,
    eval_counts,
    eval_present,
    item_deg,
    k: int,
) -> jnp.ndarray:
    """Grid-parallel mesh sweep for TALL catalogs (``choose_diffusion`` ==
    "factored"): the lambda grid shards over every device and each point
    runs the W-free / S-free flavor (``lambda_sweep_metrics_tall``) locally
    — NO (I, I) operand exists on ANY device, replicated or sharded. For
    2U < I this strictly dominates ``item_sharded_lambda_sweep``, whose
    layout still materializes I^2/n_dev-sized W_gen/S shards; the
    replicated set here is only the (U, I)-class arrays, small in the tall
    regime by definition. Rows match the single-device tall sweep exactly
    (same kernel per point)."""
    devices = mesh.devices.reshape(-1)
    n_dev = devices.size
    # caller's lambda dtype preserved (see sharded_lambda_sweep)
    lambdas = jnp.asarray(lambdas)
    L = lambdas.shape[0]
    pad = (-L) % n_dev
    if pad:
        lambdas = jnp.concatenate([lambdas, jnp.repeat(lambdas[-1:], pad)])
    sweep_mesh = Mesh(devices, (SWEEP_AXIS,))

    local = lambda lams, G, A, sn, ep, ec, pr, deg: lambda_sweep_metrics_tall(
        lams, G, A, sn, ep, ec, pr, deg, k
    )
    run = jax.jit(
        shard_map(
            local,
            mesh=sweep_mesh,
            in_specs=(P(SWEEP_AXIS),) + (P(),) * 7,
            out_specs=P(SWEEP_AXIS),
            check_vma=False,
        )
    )
    out = run(lambdas, G, A, seen, eval_pos, eval_counts, eval_present, item_deg)
    return out[:L]


def item_sharded_lambda_sweep(
    mesh: Mesh,
    lambdas,
    G,
    A,
    W_gen,
    seen,
    eval_pos,
    eval_counts,
    eval_present,
    S,
    k: int,
    item_deg=None,
) -> jnp.ndarray:
    """Catalog-sharded sweep: every (U, I)/(I, I) operand column-sharded over
    the model axis, one grid point at a time. The diffusion matmul A·W runs
    as a GSPMD collective matmul, ranking goes through the exact distributed
    spread ranker (``parallel.sharding._distributed_rank_core``), and the
    metric kernels consume the item-sharded eval arrays. Per-device memory is
    O(U·I/n + I²/n) instead of O(U·I + I²).

    ``W_gen`` and/or ``S`` may be ``None``: they are then built HERE, as
    collective Gram matmuls over the already-item-sharded A, never dense on
    one device — at catalogs over the replication budget, a host-built
    (I, I) W_gen/S would OOM before this sweep could shard anything (the
    regime this layout exists for). The sharded builds mirror
    ``ops.diffusion.general_spreading_matrix`` / ``metrics_ops.
    similarity_matrix`` exactly (same clamps, precision, element types).

    The item axis is padded to divide the model axis; padded columns carry
    A=0 (so item degrees and W rows/cols are unchanged), seen=True and
    G=-inf (ranked strictly last, never emitted), eval_pos=False and S=0
    (inert in every metric — a padded zero A column yields zero W_gen/S
    rows+columns, exactly the pad values)."""
    from jax.sharding import NamedSharding

    from lgcnhs_tpu.parallel.sharding import _distributed_rank_core, _pad_len
    from lgcnhs_tpu.runtime.mesh import MODEL_AXIS

    U, I = A.shape
    n_shards = mesh.shape[MODEL_AXIS]
    I_pad = _pad_len(I, n_shards)
    if k > I_pad // n_shards:
        raise ValueError(f"k={k} exceeds shard width {I_pad // n_shards}")
    if I_pad != I:
        pc = ((0, 0), (0, I_pad - I))
        G = jnp.pad(G, pc, constant_values=-jnp.inf)
        A = jnp.pad(A, pc)
        seen = jnp.pad(seen, pc, constant_values=True)
        eval_pos = jnp.pad(eval_pos, pc)
        if W_gen is not None:
            W_gen = jnp.pad(W_gen, ((0, I_pad - I), (0, I_pad - I)))
        if S is not None:
            S = jnp.pad(S, ((0, I_pad - I), (0, I_pad - I)))

    item_cols = NamedSharding(mesh, P(None, MODEL_AXIS))
    G = jax.device_put(G, item_cols)
    A = jax.device_put(A, item_cols)
    seen = jax.device_put(seen, item_cols)
    eval_pos = jax.device_put(eval_pos, item_cols)

    if W_gen is None:
        # (An^T A) with A item-sharded: GSPMD collective matmul, output
        # THE general_spreading_matrix, column-sharded via out_shardings —
        # one body, so the diffusion spec cannot drift between the
        # single-device and mesh layouts (round-5 review finding)
        from lgcnhs_tpu.ops.diffusion import general_spreading_matrix

        W_gen = jax.jit(
            general_spreading_matrix, out_shardings=item_cols
        )(A)
    else:
        W_gen = jax.device_put(W_gen, item_cols)
    if S is None:
        # metrics_ops.similarity_matrix over the sharded interaction matrix
        # (A IS the train+val 0/1 interaction the drivers pass as both).
        # Degrees come from the caller's duplicate-counting item_deg when
        # given (reference parity: EvalContext.item_deg counts dict-list
        # entries, a colsum of 0/1 A undercounts duplicated rating rows).
        if item_deg is None:
            deg_pad = jnp.sum(A.astype(jnp.float32), axis=0)
        else:
            deg_pad = jnp.pad(
                jnp.asarray(item_deg, jnp.float32), (0, I_pad - I)
            )

        # THE metrics_ops.similarity_matrix, column-sharded via
        # out_shardings (same f32-cast call convention as the
        # single-device sweep above) — one body, no drift
        from lgcnhs_tpu.ops.metrics_ops import similarity_matrix

        S = jax.jit(similarity_matrix, out_shardings=item_cols)(
            A.astype(jnp.float32), deg_pad
        )
    else:
        S = jax.device_put(S, item_cols)

    block = I_pad // n_shards

    # lambda-invariant: item degrees hoisted out of the grid loop
    k_item_host = jnp.sum(A, axis=0)

    @partial(jax.jit, static_argnames=("k", "n_items"))
    def point(lam, G, A, k_item, W_gen, seen, eval_pos, eval_counts,
              eval_present, S, k, n_items):
        W = _blended_transfer(W_gen, k_item, lam)
        W = jax.lax.with_sharding_constraint(W, item_cols)
        F = jnp.dot(
            A, W, precision=jax.lax.Precision.HIGHEST, preferred_element_type=A.dtype
        )
        F = jax.lax.with_sharding_constraint(F, item_cols)
        fused = G * F  # padded columns: -inf * 0 = nan — remask below
        fused = jnp.where(
            jnp.arange(F.shape[1])[None, :] < n_items, fused, -jnp.inf
        )
        fused = jax.lax.with_sharding_constraint(fused, item_cols)
        rec = _distributed_rank_core(mesh, fused, seen, k, True, block)
        return _metrics_for_rec(rec, eval_pos, eval_counts, eval_present, S, n_items)

    rows = [
        point(jnp.asarray(lam), G, A, k_item_host, W_gen, seen, eval_pos,
              eval_counts, eval_present, S, k, I)
        for lam in np.asarray(lambdas)  # caller's lambda dtype preserved
    ]
    return jnp.stack(rows)


def sweep_rows(lambdas, metrics: np.ndarray) -> list:
    """Host-side finishing: per-lambda dicts with the reference's 5-decimal
    rounding and F1-of-rounded-P/R semantics (``metrics/accurate.py:46-56``),
    matching ``eval/metrics.evaluate_recommendations`` key order."""
    rows = []
    for lam, row in zip(np.asarray(lambdas).tolist(), np.asarray(metrics)):
        p, r, n, h, i = (round(float(v), 5) for v in row)
        f1 = 0.0 if p + r == 0 else round(2 * p * r / (p + r), 5)
        rows.append(
            {"lambda": round(float(lam), 4), "P": p, "R": r, "F1": f1,
             "NDCG": n, "H": h, "I": i}
        )
    return rows
