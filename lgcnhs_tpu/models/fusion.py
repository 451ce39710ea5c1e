"""LGCNHS fusion models: SpreadLightGCN / SpreadLightGCNOpti.

Re-design of ``model/SpreadLightGCN/model.py`` + ``model/SpreadLightGCNOpti/
model.py``. The fusion is the Hadamard product of

  G — the "allocation weight matrix": layer-0 GCN preference scores with
      train+val positives masked to -1024 (``SpreadLightGCN/model.py:55-104``)
  F — the HybridS diffusion resource matrix over train+val interactions
      (``SpreadLightGCN/model.py:106-120``)

  F_new = G * F  (``SpreadLightGCN/model.py:151``; Opti ``model.py:241``)

ranked with the spread-flavor ranker incl. seen filtering
(``SpreadLightGCN/recommend.py:18-75``). SpreadLightGCNOpti differs only in
using the feature-initialized LightGCNOpti embedding model (diff-verified,
SURVEY.md section 2.7).

Everything after training is one jitted program: scores, masking, diffusion,
Hadamard, ranking.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.graph import InteractionGraph, interaction_matrix, pos_bool_matrix
from lgcnhs_tpu.models.lightgcn import LightGCNParams, layer0_scores
from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_resource
from lgcnhs_tpu.ops.topk import MASK_VALUE, rank_exclude_seen_topk
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer


@jax.jit
def allocate_matrix(params: LightGCNParams, seen: jnp.ndarray) -> jnp.ndarray:
    """G: layer-0 preference scores with train+val positives set to -1024
    (``model/SpreadLightGCN/model.py:55-104``)."""
    return jnp.where(seen, MASK_VALUE, layer0_scores(params))


@partial(jax.jit, static_argnames=("k",))
def fused_recommend(
    params: LightGCNParams,
    A: jnp.ndarray,  # (U, I) train+val interaction matrix
    seen: jnp.ndarray,  # (U, I) bool train+val positives
    lam: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """G -> F -> F_new = G*F -> ranked top-k, one XLA program
    (reference call chain ``SpreadLightGCN/model.py:122-153`` +
    ``recommend.py:18-75``). F dispatches by catalog size
    (``ops.diffusion.choose_diffusion``): at parity scales this traces the
    exact dense W_gen chain; past the (I, I) budget it switches to the
    W-free user-factored or blocked streaming algorithm."""
    from lgcnhs_tpu.ops.diffusion import diffusion_scores_auto

    G = allocate_matrix(params, seen)
    F = diffusion_scores_auto(A, lam)
    F_new = G * F
    return rank_exclude_seen_topk(F_new, seen, k, filter_seen=True)


def fusion_scores(
    params: LightGCNParams,
    A: np.ndarray,
    seen: np.ndarray,
    lam: float,
) -> jnp.ndarray:
    """F_new without the ranking step (lambda-sweep driver reuses G and W_gen;
    see ``cli/find_lambda.py``)."""
    G = allocate_matrix(params, jnp.asarray(seen))
    W_gen = general_spreading_matrix(jnp.asarray(A))
    F = hybrid_resource(jnp.asarray(A), W_gen, jnp.asarray(lam, A.dtype))
    return G * F


def serve_fused(
    graph: InteractionGraph,
    cfg: Config,
    params: LightGCNParams,
    exact: bool = False,
) -> np.ndarray:
    """High-QPS serving flavor of the fused recommendation: one Pallas pass
    (G, F, Hadamard, top-k all in VMEM) on TPU, the equivalent unfused XLA
    chain elsewhere. Differs from ``recommend_fused`` only in top-k
    tie-breaking (lowest index, torch.topk-style) — use ``recommend_fused``
    for reference-parity evaluation.

    ``exact=True`` (CLI ``--serve-exact``) forces the HIGHEST-precision XLA
    chain at ANY catalog size: the fused kernel deliberately runs native MXU
    precision (bf16-truncated f32 operands — HIGHEST blows its VMEM at
    ML-1M scale and costs 7x, see ops/pallas/fusion_serve.py), which is
    tie-equivalent but can swap value-equal slots; parity-critical serving
    should be a flag, not a code read (VERDICT r4 #6)."""
    A = interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    W_gen = general_spreading_matrix(jnp.asarray(A))
    from lgcnhs_tpu.ops.diffusion import hybrid_transfer

    W = hybrid_transfer(jnp.asarray(A), W_gen, jnp.asarray(cfg.hparams.lambda_, A.dtype))
    if exact:
        return np.asarray(
            _serve_unfused_exact(
                params.user_emb, params.item_emb, jnp.asarray(A), W,
                jnp.asarray(seen), cfg.k,
            )
        )
    if jax.default_backend() == "tpu":
        from lgcnhs_tpu.ops.pallas.fusion_serve import (
            fits_vmem_serve,
            fused_lgcnhs_serve,
        )

        if fits_vmem_serve(graph.n_items, params.item_emb.shape[1]):
            idx, _ = fused_lgcnhs_serve(
                params.user_emb, params.item_emb, jnp.asarray(A), W,
                jnp.asarray(seen), cfg.k,
            )
            return np.asarray(idx)
        # resident set over VMEM (~10-12k items at D=64): XLA chain instead

    return np.asarray(
        _serve_unfused(params.user_emb, params.item_emb, jnp.asarray(A), W,
                       jnp.asarray(seen), cfg.k)
    )


@partial(jax.jit, static_argnames=("k", "precision"))
def _serve_unfused_chain(ue, ie, A, W, seen, k, precision):
    """One XLA serving chain, two precisions (one body so the serve
    contract — sentinel, accumulation dtype, top_k tie rule — cannot
    diverge between flavors; round-5 review finding)."""
    G = jnp.dot(ue, ie.T, precision=precision,
                preferred_element_type=jnp.float32)
    F = jnp.dot(A, W, precision=precision,
                preferred_element_type=jnp.float32)
    fused = jnp.where(seen, -3.0e38, G * F)
    return jax.lax.top_k(fused, k)[1]


def _serve_unfused(ue, ie, A, W, seen, k):
    # native MXU precision, matching the fused kernel's deliberate serving
    # contract (see ops/pallas/fusion_serve.py: HIGHEST blows VMEM / costs
    # 7x in-kernel); the two flavors are tie-equivalent, pinned on-chip by
    # tests/tpu_smoke.py
    return _serve_unfused_chain(ue, ie, A, W, seen, k,
                                jax.lax.Precision.DEFAULT)


def _serve_unfused_exact(ue, ie, A, W, seen, k):
    """The exact-precision serving chain behind ``serve_fused(exact=True)``:
    both matmuls at HIGHEST (full-f32 MXU emulation), so the fused scores —
    and therefore the emitted indices — are free of the speed flavor's bf16
    near-tie swaps at any catalog size."""
    return _serve_unfused_chain(ue, ie, A, W, seen, k,
                                jax.lax.Precision.HIGHEST)


def distributed_fused_recommend(
    mesh,
    params: LightGCNParams,
    A: jnp.ndarray,  # (U, I) train+val interaction matrix
    seen: jnp.ndarray,  # (U, I) bool
    lam: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """Item-block-sharded LGCNHS serving (SURVEY.md section 2.9): G computed
    column-sharded, the two diffusion passes as collective matmuls over the
    model axis (the I x I operator never lives on one device), and F_new
    ranked with the exact distributed spread ranker
    (``parallel.sharding.distributed_rank_exclude_seen``)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lgcnhs_tpu.parallel.sharding import _pad_len, distributed_rank_exclude_seen
    from lgcnhs_tpu.runtime.mesh import MODEL_AXIS

    # Catalogs rarely divide the model axis (ML-100K: 1682 items): pad the
    # item axis with zero-interaction columns. Degree vectors of real items
    # are unchanged (padding only adds zeros to the sums), padded columns get
    # seen=True and an explicit -inf fused score so they rank strictly last
    # and can never be emitted for k <= I.
    n_items = A.shape[1]
    I_pad = _pad_len(n_items, mesh.shape[MODEL_AXIS])
    if I_pad != n_items:
        pad_cols = ((0, 0), (0, I_pad - n_items))
        A = jnp.pad(A, pad_cols)
        seen = jnp.pad(seen, pad_cols, constant_values=True)
        params = LightGCNParams(
            params.user_emb,
            jnp.pad(jnp.asarray(params.item_emb), ((0, I_pad - n_items), (0, 0))),
        )

    item_cols = NamedSharding(mesh, P(None, MODEL_AXIS))
    A = jax.device_put(A, item_cols)
    seen = jax.device_put(seen, item_cols)

    @partial(jax.jit, static_argnames=("n_real",))
    def scores(params, A, seen, lam, n_real):
        G = allocate_matrix(params, seen)
        W_gen = general_spreading_matrix(A)
        W_gen = jax.lax.with_sharding_constraint(W_gen, item_cols)
        F = hybrid_resource(A, W_gen, lam)
        F = jax.lax.with_sharding_constraint(F, item_cols)
        fused = G * F
        if A.shape[1] != n_real:
            fused = jnp.where(
                jnp.arange(A.shape[1])[None, :] < n_real, fused, -jnp.inf
            )
        return jax.lax.with_sharding_constraint(fused, item_cols)

    return distributed_rank_exclude_seen(
        mesh, scores(params, A, seen, lam, n_items), seen, k
    )


def recommend_fused(
    graph: InteractionGraph,
    cfg: Config,
    params: LightGCNParams,
) -> np.ndarray:
    """(U, k) recommendations for SpreadLightGCN[Opti]; runs the item-sharded
    multi-chip path when ``ComputeConfig.mesh_shape`` configures a mesh."""
    from lgcnhs_tpu.runtime.mesh import mesh_from_config

    log = get_logger()
    mesh = mesh_from_config(cfg.compute)
    with stage_timer(f"{cfg.model} fused recommendation done", log):
        A = interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
        seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
        if mesh is not None:
            rec = distributed_fused_recommend(
                mesh,
                params,
                jnp.asarray(A),
                jnp.asarray(seen),
                jnp.asarray(cfg.hparams.lambda_, A.dtype),
                cfg.k,
            )
        else:
            rec = fused_recommend(
                params,
                jnp.asarray(A),
                jnp.asarray(seen),
                jnp.asarray(cfg.hparams.lambda_, A.dtype),
                cfg.k,
            )
    return np.asarray(rec)
