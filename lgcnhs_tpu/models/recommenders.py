"""Model dispatch: load-or-train + recommend for every model family.

Re-design of the per-model ``recommend.py`` drivers
(``model/LightGCN/recommend.py:127-159``, ``model/LightGCNOpti/recommend.py``,
``model/SpreadLightGCN/recommend.py``, ``model/SpreadLightGCNOpti/recommend.py``)
plus the cache-else-train pattern (``model/LightGCN/recommend.py:148-154``).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.graph import InteractionGraph, pos_bool_matrix
from lgcnhs_tpu.models.fusion import recommend_fused
from lgcnhs_tpu.models.lightgcn import LightGCNParams
from lgcnhs_tpu.models.spread import recommend_spread_method
from lgcnhs_tpu.ops.topk import retrieve_topk
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer


def _embedding_model_name(model: str) -> str:
    """Which embedding model a fusion/GCN model trains."""
    return "LightGCNOpti" if model.endswith("Opti") else "LightGCN"


def get_or_train_params(
    graph: InteractionGraph,
    cfg: Config,
    user_features: Optional[np.ndarray] = None,
    item_features: Optional[np.ndarray] = None,
) -> LightGCNParams:
    """Load the cached checkpoint else train (reference
    ``model/LightGCN/recommend.py:148-154``)."""
    # deferred import: models package <-> trainer would otherwise be circular
    from lgcnhs_tpu.train.trainer import load_checkpoint, train_lightgcn

    log = get_logger()
    name = _embedding_model_name(cfg.model)
    ckpt = os.path.join(cfg.model_path, f"{cfg.k}_{name}.npz")
    params = load_checkpoint(ckpt)
    if params is not None:
        if (
            params.user_emb.shape[0] == graph.n_users
            and params.item_emb.shape[0] == graph.n_items
        ):
            log.info("loaded cached %s checkpoint: %s", name, ckpt)
            return params
        log.info("cached checkpoint shape mismatch, retraining")
    feats = (user_features, item_features) if name == "LightGCNOpti" else (None, None)
    return train_lightgcn(graph, cfg, *feats).params


def recommend_gcn(
    graph: InteractionGraph, cfg: Config, params: LightGCNParams
) -> np.ndarray:
    """LightGCN[Opti] final recommendations: layer-0 scores, train AND val
    positives masked to -1024, top-k
    (``model/LightGCN/recommend.py:68-125``). With a configured mesh the
    catalog is item-sharded and ranked by the distributed top-k merge; when
    the (U, I) score/seen matrices would not fit (>4 GB), retrieval runs
    chunked over users with CSR seen-masking (same masked_topk kernel, same
    ids — ``ops/scalable.chunked_masked_topk``)."""
    from lgcnhs_tpu.runtime.mesh import mesh_from_config

    mesh = mesh_from_config(cfg.compute)
    if mesh is None and 4.0 * graph.n_users * graph.n_items > 4e9:
        from lgcnhs_tpu.data.graph import EdgeSet
        from lgcnhs_tpu.ops.scalable import chunked_masked_topk, user_csr

        seen_edges = EdgeSet(
            np.concatenate([graph.train.users, graph.val.users]),
            np.concatenate([graph.train.items, graph.val.items]),
        )
        rowptr, cols = user_csr(graph.n_users, seen_edges)
        return chunked_masked_topk(
            jnp.asarray(params.user_emb), jnp.asarray(params.item_emb),
            rowptr, cols, cfg.k,
        )
    seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    if mesh is not None:
        from lgcnhs_tpu.parallel.sharding import distributed_retrieve_topk

        rec = distributed_retrieve_topk(
            mesh,
            jnp.asarray(params.user_emb),
            jnp.asarray(params.item_emb),
            jnp.asarray(seen),
            cfg.k,
        )
        return np.asarray(rec)
    rec = retrieve_topk(params.user_emb, params.item_emb, jnp.asarray(seen), cfg.k)
    return np.asarray(rec)


def recommend(
    graph: InteractionGraph,
    cfg: Config,
    user_features: Optional[np.ndarray] = None,
    item_features: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Model switch — reference ``main.py:66-80``."""
    model = cfg.model
    if model in ("ProbS", "HeatS", "HybridS"):
        return recommend_spread_method(graph, cfg, model)
    params = get_or_train_params(graph, cfg, user_features, item_features)
    if model in ("LightGCN", "LightGCNOpti"):
        log = get_logger()
        with stage_timer(f"{model} recommendation done", log):
            return recommend_gcn(graph, cfg, params)
    if model in ("SpreadLightGCN", "SpreadLightGCNOpti"):
        return recommend_fused(graph, cfg, params)
    raise ValueError(f"unknown model {model!r}")
