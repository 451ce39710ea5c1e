"""End-to-end recommendation pipeline driver.

Re-design of the reference ``main.py:25-106``: Step1 load/preprocess data,
Step2 load-or-compute recommendations for the selected model, Step3 evaluate
all six metrics on the test split. Model/dataset/env selection is by CLI flag
instead of editing ``const.py`` (``const.py:493-518``).

Usage:
  python -m lgcnhs_tpu.cli.main --dataset synthetic --model SpreadLightGCNOpti \
      --env dev --epochs 200
"""
from __future__ import annotations

import json

import contextlib

from lgcnhs_tpu.cli.common import base_parser, config_from_args, load_pipeline
from lgcnhs_tpu.eval.metrics import EvalContext, evaluate_recommendations
from lgcnhs_tpu.models.recommenders import recommend
from lgcnhs_tpu.runtime.cache import ArtifactCache
from lgcnhs_tpu.runtime.logging import get_logger, profile_trace


def main(argv=None) -> dict:
    parser = base_parser(__doc__)
    parser.add_argument(
        "--target-user",
        type=int,
        default=None,
        help="also print this (internal) user's recommendation list "
        "(douban config's target_user concept, const.py:244)",
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)
    trace = profile_trace(args.profile) if args.profile else contextlib.nullcontext()
    with trace:
        return _run(args, cfg, log)


def _run(args, cfg, log) -> dict:

    log.info("Step1: loading preprocessed data")
    graph, user_features, item_features = load_pipeline(cfg)

    log.info("Step2: computing recommendations with model %s", cfg.model)
    cache = ArtifactCache(cfg.recommend_path, enabled=not args.no_cache)
    rec_key = f"all_user_recommend_{cfg.model}_{cfg.k}"
    rec = cache.load_recommendations(rec_key)
    if rec is None or rec.shape != (graph.n_users, cfg.k):
        rec = recommend(graph, cfg, user_features, item_features)
        cache.save_recommendations(rec_key, rec)
    else:
        log.info("loaded cached recommendations: %s", rec_key)

    log.info("Step3: evaluating recommendations on the test split")
    ctx = EvalContext.build(graph.n_users, graph.n_items, graph.test, graph.train, graph.val)
    metrics = evaluate_recommendations(ctx, rec)
    log.info(
        "[%s Test Accurate] precision@%d: %s, recall@%d: %s, f1@%d: %s, NDCG@%d: %s",
        cfg.model, cfg.k, metrics["P"], cfg.k, metrics["R"], cfg.k, metrics["F1"],
        cfg.k, metrics["NDCG"],
    )
    log.info(
        "[%s Test Diversity] H@%d: %s, I@%d: %s",
        cfg.model, cfg.k, metrics["H"], cfg.k, metrics["I"],
    )
    if args.target_user is not None and 0 <= args.target_user < graph.n_users:
        log.info(
            "recommendations for user %d: %s",
            args.target_user,
            rec[args.target_user].tolist(),
        )
    print(json.dumps({"model": cfg.model, "k": cfg.k, **metrics}))
    return metrics


if __name__ == "__main__":
    main()
