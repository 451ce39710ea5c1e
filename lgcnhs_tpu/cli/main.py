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
        default=None,
        help="also print this user's recommendation list, by RAW dataset id "
        "— a Douban nickname-md5 or a raw MovieLens id — decoded through "
        "the stored id mappings (the reference configures target_user as a "
        "raw md5, const.py:244; handleRating's uid_mapping, "
        "processing/handleData.py:70-77)",
    )
    parser.add_argument(
        "--target-user-internal",
        type=int,
        default=None,
        help="like --target-user but takes the INTERNAL dense index directly",
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)
    trace = profile_trace(args.profile) if args.profile else contextlib.nullcontext()
    with trace:
        return _run(args, cfg, log)


def _run(args, cfg, log) -> dict:

    log.info("Step1: loading preprocessed data")
    graph, user_features, item_features, splits = load_pipeline(cfg)

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
    if args.target_user is not None or args.target_user_internal is not None:
        from lgcnhs_tpu.data.idmap import IdMapper

        if not splits.uid_mapping:
            # warm split caches written before id_mappings.npz existed have
            # no raw<->internal maps (cli/retrieve.py guards identically);
            # the internal flavor still works, raw-id decode cannot
            if (
                args.target_user_internal is not None
                and 0 <= args.target_user_internal < graph.n_users
            ):
                log.info(
                    "recommendations for internal user %d (no id mappings "
                    "cached; re-run preprocessing with --no-cache for raw-id "
                    "decode): %s",
                    args.target_user_internal,
                    rec[args.target_user_internal].tolist(),
                )
            else:
                log.warning(
                    "target user %r: no id mappings cached — re-run "
                    "preprocessing with --no-cache, or use "
                    "--target-user-internal",
                    args.target_user,
                )
        else:
            mapper = IdMapper.from_splits(splits)
            if args.target_user_internal is not None:
                internal = args.target_user_internal
            else:
                # raw id lookup: exact key first (douban md5 strings), then
                # the int form (MovieLens raw ids round-trip argv as str)
                internal = mapper.uid_to_internal.get(args.target_user)
                if internal is None:
                    try:
                        internal = mapper.uid_to_internal.get(int(args.target_user))
                    except ValueError:
                        internal = None
            if internal is None or not 0 <= int(internal) < graph.n_users:
                log.warning(
                    "target user %r not found in the id mapping (%d users)",
                    args.target_user
                    if args.target_user is not None
                    else args.target_user_internal,
                    graph.n_users,
                )
            else:
                internal = int(internal)
                raw_items = [mapper.internal_to_iid[i] for i in rec[internal]]
                log.info(
                    "recommendations for user %s (internal %d): internal %s, raw %s",
                    mapper.internal_to_uid[internal], internal,
                    rec[internal].tolist(), raw_items,
                )
    print(json.dumps({"model": cfg.model, "k": cfg.k, **metrics}))
    return metrics


if __name__ == "__main__":
    main()
