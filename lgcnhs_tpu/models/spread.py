"""SpreadMethod recommenders (ProbS / HeatS / HybridS) — training-free.

Re-design of ``model/SpreadMethod/recommend.py``. The whole pipeline
(interaction matrix -> W_gen -> blended transfer matrix -> two-pass diffusion
-> rank) runs as jitted XLA programs; ranking uses the exact-parity ordering
from ``ops/topk.py``.

Dataset-specific quirks faithfully reproduced
(``model/SpreadMethod/recommend.py:87-105,48-50``):
- ProbS on movielens: transfer matrix transposed, lambda forced to 0.01, and
  the seen-item filter is SKIPPED at ranking time.
- HeatS on douban: transfer matrix transposed, lambda forced to 0.99.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.config import Config
from lgcnhs_tpu.data.graph import InteractionGraph, interaction_matrix, pos_bool_matrix
from lgcnhs_tpu.ops.diffusion import diffusion_scores_auto
from lgcnhs_tpu.ops.topk import rank_exclude_seen_topk
from lgcnhs_tpu.runtime.logging import get_logger, stage_timer

SPREAD_METHODS = ("ProbS", "HeatS", "HybridS")


def resolve_spread_variant(method: str, dataset: str, lam: float):
    """(effective lambda, transpose_w, filter_seen) after dataset overrides."""
    if method not in SPREAD_METHODS:
        raise ValueError(f"method must be one of {SPREAD_METHODS}, got {method!r}")
    # ML-1M inherits the movielens quirks: the reference keys them on the
    # config string DATASET == "movielens" (recommend.py:87-105), which is
    # what a reference user would set when pointing it at the ml-1m files.
    if dataset == "movielens1m":
        dataset = "movielens"
    transpose_w = False
    filter_seen = True
    if method == "ProbS":
        lam = 1.0
        if dataset == "movielens":
            lam, transpose_w, filter_seen = 0.01, True, False
    elif method == "HeatS":
        lam = 0.0
        if dataset == "douban":
            lam, transpose_w = 0.99, True
    return lam, transpose_w, filter_seen


def spread_scores(
    A: np.ndarray, method: str, dataset: str, lam: float
) -> jnp.ndarray:
    """Resource matrix F for a spread method incl. quirks. Dispatches by
    catalog size (``ops.diffusion.choose_diffusion``): the dense reference-
    order program at every parity scale, the W-free user-factored / blocked
    streaming algorithms once (I, I) outgrows a chip."""
    eff_lam, transpose_w, _ = resolve_spread_variant(method, dataset, lam)
    return diffusion_scores_auto(
        jnp.asarray(A), jnp.asarray(eff_lam, A.dtype), transpose_w=transpose_w
    )


def recommend_spread_method(
    graph: InteractionGraph,
    cfg: Config,
    method: Optional[str] = None,
) -> np.ndarray:
    """All-user (U, k) recommendations — reference ``recommendSpreadMethod`` +
    ``recommendForAllUser`` (``model/SpreadMethod/recommend.py:18-115``).
    The diffusion input A is built from train+val (``recommend.py:81``), and
    seen filtering also masks train+val positives (``recommend.py:31``)."""
    method = method or cfg.model
    log = get_logger()
    with stage_timer(f"{method} diffusion recommendation done", log):
        # compute.dtype="float64" (+ x64) reproduces the reference's numpy
        # double arithmetic exactly (cli/parity_report.py); the default f32
        # HIGHEST path is rank-identical except at f32-resolution ties.
        dtype = (
            np.float32 if cfg.compute.dtype == "bfloat16"
            else np.dtype(cfg.compute.dtype)
        )
        A = interaction_matrix(
            graph.n_users, graph.n_items, graph.train, graph.val, dtype=dtype
        )
        _, _, filter_seen = resolve_spread_variant(
            method, cfg.dataset, cfg.hparams.lambda_
        )
        F = spread_scores(A, method, cfg.dataset, cfg.hparams.lambda_)
        seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
        rec = rank_exclude_seen_topk(
            F, jnp.asarray(seen), cfg.k, filter_seen=filter_seen
        )
    return np.asarray(rec)
