"""Host-facing metric suite with reference rounding parity.

Aggregates the device kernels in ``ops/metrics_ops.py`` and reproduces the
reference's observable numerics exactly:

- every metric is rounded to 5 decimals at the same stage the reference rounds
  (``metrics/accurate.py:46,56,102``; ``metrics/diversity.py:61-63,115``)
- F1 is the harmonic mean of the ALREADY-ROUNDED P and R
  (``metrics/accurate.py:48-56``)
- P/R/NDCG average only over users present in the eval split's positives dict
  (``metrics/accurate.py:26``); H and I run over all users
  (``metrics/diversity.py:32,84``)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from lgcnhs_tpu.data.graph import (
    EdgeSet,
    interaction_matrix,
    item_degrees,
    pos_bool_matrix,
    user_pos_counts,
    users_present,
)
from lgcnhs_tpu.ops import metrics_ops


@dataclass(frozen=True)
class EvalContext:
    """Precomputed eval-side arrays for one dataset (reference rebuilds these
    per call, ``main.py:86-94``; we build once)."""

    n_users: int
    n_items: int
    eval_pos: np.ndarray  # (U, I) bool — eval split positives
    eval_counts: np.ndarray  # (U,)
    eval_present: np.ndarray  # (U,) bool
    interaction: np.ndarray  # (U, I) f32 train+val
    item_deg: np.ndarray  # (I,)

    @classmethod
    def build(
        cls,
        n_users: int,
        n_items: int,
        eval_edges: EdgeSet,
        train_edges: EdgeSet,
        val_edges: EdgeSet,
    ) -> "EvalContext":
        return cls(
            n_users=n_users,
            n_items=n_items,
            eval_pos=pos_bool_matrix(n_users, n_items, eval_edges),
            eval_counts=user_pos_counts(n_users, eval_edges),
            eval_present=users_present(n_users, eval_edges),
            interaction=interaction_matrix(n_users, n_items, train_edges, val_edges),
            item_deg=item_degrees(n_items, train_edges, val_edges),
        )


def accurate_metrics(
    ctx: EvalContext, rec: np.ndarray
) -> Tuple[float, float, float, float]:
    """(P@k, R@k, F1@k, NDCG@k) — reference ``getAccurateMetrics``
    (``metrics/accurate.py:104-126``)."""
    p, r, n = metrics_ops.all_accuracy_metrics(
        rec, ctx.eval_pos, ctx.eval_counts, ctx.eval_present
    )
    precision = round(float(p), 5)
    recall = round(float(r), 5)
    if precision + recall == 0:
        # the reference would ZeroDivisionError here (metrics/accurate.py:55);
        # defining F1=0 for the degenerate case is a documented improvement
        f1 = 0.0
    else:
        f1 = round(2 * precision * recall / (precision + recall), 5)
    ndcg = round(float(n), 5)
    return precision, recall, f1, ndcg


def diversity_metrics(ctx: EvalContext, rec: np.ndarray) -> Tuple[float, float]:
    """(H@k, I@k) — reference ``getDiversityMetrics``
    (``metrics/diversity.py:117-136``)."""
    h = metrics_ops.hamming_distance(rec, ctx.n_items)
    i = metrics_ops.internal_similarity(
        rec, ctx.interaction, ctx.item_deg
    )
    return round(float(h), 5), round(float(i), 5)


def novelty_metric(ctx: EvalContext, rec: np.ndarray) -> float:
    """Average recommended-item degree (reference
    ``waste/metrics/novelty.py:11-48``)."""
    return round(float(metrics_ops.novelty_avg_degree(rec, ctx.item_deg)), 5)


def evaluate_recommendations(
    ctx: EvalContext, rec: np.ndarray, include_novelty: bool = False
) -> dict:
    """All six reference metrics as a dict (reference drivers log
    P/R/F1/NDCG/H/I, ``main.py:99-106``); novelty optional (the reference
    prototyped it in ``waste/`` but never wired it in)."""
    p, r, f1, n = accurate_metrics(ctx, rec)
    h, i = diversity_metrics(ctx, rec)
    out = {"P": p, "R": r, "F1": f1, "NDCG": n, "H": h, "I": i}
    if include_novelty:
        out["Novelty"] = novelty_metric(ctx, rec)
    return out
