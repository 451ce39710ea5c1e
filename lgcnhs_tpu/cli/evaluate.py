"""Cross-model evaluation report.

Re-design of ``evaluationMetrics.py:19-98``: for each k in a list and each
model, load the cached recommendation matrix and compute all six metrics.
The reference rebuilds every eval-side array per (k, model) pair
(``evaluationMetrics.py:63-69``); we build the EvalContext exactly once.
Output: one CSV per k plus a combined report (the reference writes an Excel
workbook; openpyxl is optional here, CSV is the durable format).
"""
from __future__ import annotations

import os

import pandas as pd

from lgcnhs_tpu.cli.common import base_parser, config_from_args, load_pipeline
from lgcnhs_tpu.config import MODEL_NAMES
from lgcnhs_tpu.eval.metrics import EvalContext, evaluate_recommendations
from lgcnhs_tpu.runtime.cache import ArtifactCache
from lgcnhs_tpu.runtime.logging import get_logger


def main(argv=None) -> dict:
    parser = base_parser(__doc__)
    parser.add_argument(
        "--ks", type=int, nargs="+", default=[30, 50, 100],
        help="recommendation lengths to evaluate (evaluationMetrics.py:45)",
    )
    parser.add_argument(
        "--models", nargs="+", default=list(MODEL_NAMES),
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)

    graph, _, _, _ = load_pipeline(cfg)
    cache = ArtifactCache(cfg.recommend_path)

    # k-independent: built once for all k (the redundancy the module
    # docstring calls out in the reference's evaluationMetrics.py:63-69).
    ctx = EvalContext.build(
        graph.n_users, graph.n_items, graph.test, graph.train, graph.val
    )
    sheets = {}
    for k in args.ks:
        rows = []
        for model in args.models:
            rec = cache.load_recommendations(f"all_user_recommend_{model}_{k}")
            if rec is None:
                log.info("no cached recommendations for model=%s k=%d; skipping", model, k)
                continue
            if rec.shape[1] < k:
                log.info(
                    "cached recommendations for %s have only %d < %d columns; skipping",
                    model, rec.shape[1], k,
                )
                continue
            metrics = evaluate_recommendations(ctx, rec[:, :k])
            rows.append({"Model": model, **metrics})
            log.info("k=%d model=%s: %s", k, model, metrics)
        if rows:
            df = pd.DataFrame(rows)
            df.to_csv(
                os.path.join(cfg.evaluation_path, f"model_evaluation_{k}.csv"),
                index=False,
            )
            sheets[k] = df

    # Excel workbook like the reference's (evaluationMetrics.py:94-96):
    # pandas/openpyxl when available, else the in-repo minimal OOXML writer
    if sheets:
        xlsx_path = os.path.join(cfg.evaluation_path, "model_evaluation_results.xlsx")
        try:
            with pd.ExcelWriter(xlsx_path) as writer:
                for k, df in sheets.items():
                    df.to_excel(writer, sheet_name=str(k), index=False)
        except Exception:
            from lgcnhs_tpu.runtime.xlsx import write_xlsx

            write_xlsx(
                xlsx_path,
                {
                    str(k): [list(df.columns)] + df.values.tolist()
                    for k, df in sheets.items()
                },
            )
            log.info("openpyxl unavailable; wrote %s with built-in writer", xlsx_path)
    return sheets


if __name__ == "__main__":
    main()
