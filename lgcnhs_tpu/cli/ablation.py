"""Ablation comparison charts: LGCNHS-e (SpreadLightGCN) vs LGCNHS
(SpreadLightGCNOpti).

Re-design of ``draw/ablation.ipynb`` (cells 1-4): bar charts of the six
metrics comparing the two fusion variants at a given k, sourced from the
cross-model CSV produced by ``cli.evaluate``.

Usage:
  python -m lgcnhs_tpu.cli.ablation --dataset synthetic --ks 10
"""
from __future__ import annotations

import argparse
import os

import pandas as pd

from lgcnhs_tpu.cli.common import base_parser, config_from_args
from lgcnhs_tpu.runtime.logging import get_logger

ABLATION_MODELS = {"SpreadLightGCN": "LGCNHS-e", "SpreadLightGCNOpti": "LGCNHS"}


def main(argv=None):
    parser = base_parser(__doc__)
    parser.add_argument("--ks", type=int, nargs="+", default=[30])
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)

    outputs = []
    for k in args.ks:
        path = os.path.join(cfg.evaluation_path, f"model_evaluation_{k}.csv")
        if not os.path.exists(path):
            log.info("no evaluation CSV for k=%d (%s); run cli.evaluate first", k, path)
            continue
        df = pd.read_csv(path)
        df = df[df["Model"].isin(ABLATION_MODELS)]
        if df.empty:
            log.info("no fusion-model rows in %s", path)
            continue
        df["Model"] = df["Model"].map(ABLATION_MODELS)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            metrics = ["P", "R", "F1", "NDCG", "H", "I"]
            fig, axes = plt.subplots(1, len(metrics), figsize=(3 * len(metrics), 3))
            for ax, metric in zip(axes, metrics):
                ax.bar(df["Model"], df[metric])
                ax.set_title(f"{metric}@{k}")
                ax.tick_params(axis="x", rotation=20)
            fig.tight_layout()
            out = os.path.join(cfg.evaluation_path, f"ablation_{k}.png")
            fig.savefig(out)
            plt.close(fig)
            outputs.append(out)
            log.info("ablation chart saved: %s", out)
        except Exception as exc:
            log.warning("plotting failed: %s", exc)
    return outputs


if __name__ == "__main__":
    main()
