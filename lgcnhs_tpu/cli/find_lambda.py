"""Lambda hyperparameter sweep.

Re-design of ``findLambda.py:49-138``: train (or load) the LightGCNOpti
allocation matrix G ONCE, compute W_gen ONCE, then sweep lambda recomputing
F and G*F and evaluating all six metrics per lambda. Where the reference
re-enters numpy + python metric loops 101 times (``findLambda.py:83-116``),
the whole grid here is ONE on-device program (``ops/sweep.py``): diffusion,
Hadamard fusion, ranking, and the five raw metrics run under a single
``lax.map`` with every loop constant resident in HBM — and with ``--mesh``
the grid points fan out one-per-device. Results land in
``lambda_evaluation_<k>.csv`` + metric PNGs like the reference.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd

from lgcnhs_tpu.cli.common import base_parser, config_from_args, load_pipeline
from lgcnhs_tpu.data.graph import interaction_matrix, pos_bool_matrix
from lgcnhs_tpu.eval.metrics import EvalContext
from lgcnhs_tpu.models.fusion import allocate_matrix
from lgcnhs_tpu.models.recommenders import get_or_train_params
from lgcnhs_tpu.ops.diffusion import (
    choose_diffusion,
    factored_fits,
    general_spreading_matrix,
)
from lgcnhs_tpu.ops.metrics_ops import similarity_matrix
from lgcnhs_tpu.ops.sweep import (
    lambda_sweep_metrics,
    lambda_sweep_metrics_tall,
    sharded_lambda_sweep,
    sharded_lambda_sweep_tall,
    sweep_rows,
)
from lgcnhs_tpu.runtime.logging import get_logger
from lgcnhs_tpu.runtime.mesh import mesh_from_config


def main(argv=None) -> pd.DataFrame:
    parser = base_parser(__doc__)
    parser.add_argument("--step", type=float, default=0.01, help="lambda grid step")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)

    graph, user_features, item_features, splits = load_pipeline(cfg)
    ctx = EvalContext.build(
        graph.n_users, graph.n_items, graph.test, graph.train, graph.val
    )

    # G once (findLambda.py:79)
    params = get_or_train_params(graph, cfg, user_features, item_features)
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    G = allocate_matrix(params, seen)
    lambdas = np.arange(0.0, 1.0 + args.step, args.step, dtype=np.float32)
    mesh = mesh_from_config(cfg.compute)

    itemsize = np.dtype(A.dtype).itemsize
    regime = choose_diffusion(graph.n_users, graph.n_items, itemsize)
    # The W-free flavor is exact algebra for ANY shape — choose_diffusion's
    # 2U < I is only its FLOPs heuristic — so it also rescues non-dense
    # regimes whose factored live set (U^2 + 3 U I) still fits one chip
    # (e.g. U ~ I/2 catalogs that are over the dense budget).
    tall_ok = regime == "factored" or (
        regime in ("blocked", "sharded")
        and factored_fits(graph.n_users, graph.n_items, itemsize)
    )
    if tall_ok:
        # tall catalog: neither (I, I) operand (W_gen, S) can exist — the
        # W-free / S-free sweep flavor (ops/sweep.py); with a mesh the grid
        # fans out one point per device, same kernel, still no (I, I)
        # anywhere (strictly better than the item-sharded layout here —
        # including for blocked/sharded regimes the factored live set
        # rescues: the per-device footprint of one grid point is exactly
        # the single-chip live set factored_fits just checked)
        log.info(
            "lambda sweep: W-free flavor (no (I, I) operand; user-factored "
            "diffusion + direct Sorensen)%s",
            "" if mesh is None else f", grid over {mesh.devices.size} devices",
        )
        tall_args = (
            G, A, seen,
            jnp.asarray(ctx.eval_pos), jnp.asarray(ctx.eval_counts),
            jnp.asarray(ctx.eval_present), jnp.asarray(ctx.item_deg),
        )
        if mesh is not None:
            metrics = sharded_lambda_sweep_tall(
                mesh, lambdas, *tall_args, k=cfg.k
            )
        else:
            metrics = lambda_sweep_metrics_tall(
                jnp.asarray(lambdas), *tall_args, cfg.k
            )
    elif mesh is None and regime in ("blocked", "sharded"):
        # wide catalogs where even the W-free factored live set
        # (U^2 + 3 U I, checked above) is over budget: nothing single-chip
        # fits — this regime needs the item-sharded mesh layout (which
        # builds W_gen and S as collective Grams, never dense on one
        # device — see item_sharded_lambda_sweep)
        raise SystemExit(
            f"lambda sweep at U={graph.n_users} x I={graph.n_items} exceeds "
            "a single device in every layout (the (I, I) operands and the "
            "W-free flavor's (U, U) + (U, I) live set are all over budget) "
            "— run with --mesh to use the item-sharded sweep"
        )
    elif mesh is not None:
        # W_gen and S are NOT built here: sharded_lambda_sweep builds them
        # in whichever layout its replication budget picks — dense when the
        # operands replicate, as collective Grams over the item-sharded A
        # when they don't (a host-dense (I, I) here would OOM exactly in the
        # regime the single-chip error above tells users to bring a mesh for)
        log.info(
            "lambda sweep sharded over %d devices (mesh %s flattened)",
            mesh.devices.size, dict(mesh.shape),
        )
        metrics = sharded_lambda_sweep(
            mesh, lambdas, G, A, None, seen,
            jnp.asarray(ctx.eval_pos), jnp.asarray(ctx.eval_counts),
            jnp.asarray(ctx.eval_present), None, k=cfg.k,
            item_deg=jnp.asarray(ctx.item_deg),
        )
    else:
        # W_gen once (findLambda.py:81)
        W_gen = general_spreading_matrix(A)
        S = similarity_matrix(jnp.asarray(ctx.interaction), jnp.asarray(ctx.item_deg))
        metrics = lambda_sweep_metrics(
            jnp.asarray(lambdas), G, A, W_gen, seen,
            jnp.asarray(ctx.eval_pos), jnp.asarray(ctx.eval_counts),
            jnp.asarray(ctx.eval_present), S, cfg.k,
        )

    rows = sweep_rows(lambdas, np.asarray(metrics))
    for row in rows:
        log.info("lambda %.2f evaluated: %s", row["lambda"], row)

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
