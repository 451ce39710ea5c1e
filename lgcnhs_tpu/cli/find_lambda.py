"""Lambda hyperparameter sweep.

Re-design of ``findLambda.py:49-138``: train (or load) the LightGCNOpti
allocation matrix G ONCE, compute W_gen ONCE, then sweep lambda recomputing
F and G*F and evaluating all six metrics per lambda. On TPU the whole sweep
body is one jitted program re-invoked per lambda (G and W_gen stay resident
in HBM); results land in ``lambda_evaluation_<k>.csv`` + metric PNGs like the
reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from lgcnhs_tpu.cli.common import base_parser, config_from_args, load_pipeline
from lgcnhs_tpu.data.graph import interaction_matrix, pos_bool_matrix
from lgcnhs_tpu.eval.metrics import EvalContext, evaluate_recommendations
from lgcnhs_tpu.models.fusion import allocate_matrix
from lgcnhs_tpu.models.recommenders import get_or_train_params
from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_resource
from lgcnhs_tpu.ops.topk import rank_exclude_seen
from lgcnhs_tpu.runtime.logging import get_logger
import os


@partial(jax.jit, static_argnames=("k",))
def _sweep_step(G, A, W_gen, seen, lam, k):
    F = hybrid_resource(A, W_gen, lam)
    return rank_exclude_seen(G * F, seen, k, filter_seen=True)


def main(argv=None) -> pd.DataFrame:
    parser = base_parser(__doc__)
    parser.add_argument("--step", type=float, default=0.01, help="lambda grid step")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)

    graph, user_features, item_features = load_pipeline(cfg)
    ctx = EvalContext.build(
        graph.n_users, graph.n_items, graph.test, graph.train, graph.val
    )

    # G once (findLambda.py:79), W_gen once (findLambda.py:81)
    params = get_or_train_params(graph, cfg, user_features, item_features)
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    G = allocate_matrix(params, seen)
    W_gen = general_spreading_matrix(A)

    lambdas = np.arange(0.0, 1.0 + args.step, args.step).tolist()
    rows = []
    for lam in lambdas:
        rec = np.asarray(_sweep_step(G, A, W_gen, seen, jnp.float32(lam), cfg.k))
        metrics = evaluate_recommendations(ctx, rec)
        rows.append({"lambda": round(lam, 4), **metrics})
        log.info("lambda %.2f evaluated: %s", lam, metrics)

    df = pd.DataFrame(rows)
    out = os.path.join(cfg.evaluation_path, f"lambda_evaluation_{cfg.k}.csv")
    df.to_csv(out, index=False)
    log.info("lambda sweep saved: %s", out)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for metric in ("P", "R", "F1", "NDCG", "H", "I"):
            fig = plt.figure()
            plt.plot(df["lambda"], df[metric])
            plt.xlabel("lambda")
            plt.ylabel(metric)
            plt.title(f"{metric} curves")
            plt.savefig(
                os.path.join(cfg.evaluation_path, f"{metric}_{cfg.k}.png")
            )
            plt.close(fig)
    except Exception as exc:
        log.warning("plotting failed: %s", exc)
    return df


if __name__ == "__main__":
    main()
