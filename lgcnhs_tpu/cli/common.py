"""Shared CLI plumbing: argument parsing and pipeline assembly."""
from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np

from lgcnhs_tpu.config import DATASETS, MODEL_NAMES, Config, load_config
from lgcnhs_tpu.data.datasets import load_dataset
from lgcnhs_tpu.data.graph import InteractionGraph, build_graph
from lgcnhs_tpu.runtime.logging import get_logger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--env", choices=["dev", "prod"], default="dev")
    p.add_argument("--dataset", choices=list(DATASETS), default="movielens")
    p.add_argument("--model", choices=list(MODEL_NAMES), default="SpreadLightGCNOpti")
    p.add_argument("--workdir", default="artifacts")
    p.add_argument("--k", type=int, default=None, help="recommendation list size")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lambda", dest="lambda_", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--users", type=int, default=None, help="synthetic user count")
    p.add_argument("--items", type=int, default=None, help="synthetic item count")
    p.add_argument(
        "--interactions", type=int, default=None, help="synthetic interaction count"
    )
    p.add_argument(
        "--mesh",
        default=None,
        metavar="DATA,MODEL",
        help='device mesh shape, e.g. "2,4", or "auto" to use every local '
        "device on the model axis (tables row-sharded, catalog item-sharded, "
        "distributed top-k; default single device)",
    )
    p.add_argument(
        "--data-dir",
        default=None,
        metavar="DIR",
        help="directory holding the raw dataset files (e.g. an extracted "
        "ml-100k/); sets preprocessing.dataset_paths",
    )
    p.add_argument(
        "--fetch",
        action="store_true",
        help="opt-in: download the dataset (ML-100K ~5 MB / ML-1M ~6 MB, "
        "files.grouplens.org, md5-verified) into <workdir>/data when the raw "
        "files are absent; logged no-op without network egress",
    )
    p.add_argument(
        "--quantile",
        type=float,
        nargs=2,
        default=None,
        metavar=("START", "END"),
        help="override the user-activity quantile band filter "
        "(reference handleData.py:39-57; e.g. '--quantile 1 0' disables "
        "filtering, douban's preset is 0.991 0.99)",
    )
    p.add_argument(
        "--scan-chunk",
        type=int,
        default=None,
        metavar="N",
        help="max epochs per device program (bounds single-execution "
        "wall-clock on relayed TPUs; chunking never changes the model — "
        "the per-epoch fold_in key stream is dispatch-invariant)",
    )
    p.add_argument(
        "--platform",
        choices=["auto", "cpu", "tpu"],
        default="auto",
        help="force the JAX platform (this machine's sitecustomize pins "
        "jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var — "
        "'--platform cpu' is the only reliable way to keep a CLI run off "
        "the TPU; 'auto' keeps the ambient default)",
    )
    p.add_argument(
        "--dtype",
        choices=["float32", "bfloat16"],
        default=None,
        help="compute dtype: float32 = the exact parity path (HIGHEST MXU "
        "precision; dev default), bfloat16 = mixed precision (bf16 matmul "
        "inputs, f32 params/optimizer; prod default)",
    )
    p.add_argument(
        "--neg-range",
        choices=["catalog", "reference"],
        default=None,
        help="BPR negative-candidate range: 'catalog' (default, uniform over "
        "all items) or 'reference' to reproduce torch-geometric's "
        "structured_negative_sampling bound (max node id present in the "
        "split, model/LightGCN/loss.py:58; docs/PARITY.md deviations #6)",
    )
    p.add_argument(
        "--coo-table-sharding",
        action="store_true",
        help="mesh x COO regime: row-shard the embedding tables + optimizer "
        "state over the model axis (~1/n_model persistent table bytes per "
        "device) instead of replicating; minibatch rows exchanged "
        "shard-by-shard. Requires --mesh and a graph on the COO path",
    )
    p.add_argument("--no-cache", action="store_true", help="ignore cached artifacts")
    p.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR",
    )
    return p


def enable_compilation_cache(path: str = "/tmp/lgcnhs_jax_cache") -> None:
    """Persistent XLA compilation cache — first-compile through the TPU tunnel
    costs tens of seconds per program; caching makes every later process
    start warm. (No reference counterpart; torch has no AOT compile step.)"""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def warmup_device_transfer() -> float:
    """Force the once-per-process device->host handshake now.

    On the tunneled axon TPU backend, the FIRST D2H transfer of a process
    pays a large variable setup penalty (measured 25s..540s); all later
    transfers are ~25ms. Taking the hit eagerly at startup makes subsequent
    stage timings meaningful. Returns the handshake seconds.
    """
    import time

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((4,)))
    return time.perf_counter() - t0


def config_from_args(args: argparse.Namespace) -> Config:
    enable_compilation_cache()
    if getattr(args, "platform", "auto") != "auto":
        import jax

        # must land before any backend use; "cpu" avoids the tunneled TPU's
        # variable first-transfer handshake for host-scale runs
        jax.config.update(
            "jax_platforms",
            "cpu" if args.platform == "cpu" else "axon,cpu",
        )
    try:
        import jax

        if jax.default_backend() == "tpu":
            secs = warmup_device_transfer()
            get_logger().info("TPU device handshake: %.1f s", secs)
    except Exception:
        pass
    overrides = {}
    if args.k is not None:
        overrides["k"] = args.k
    if args.epochs is not None:
        overrides["hparams.epochs"] = args.epochs
    if args.lambda_ is not None:
        overrides["hparams.lambda_"] = args.lambda_
    if args.batch_size is not None:
        overrides["hparams.batch_size"] = args.batch_size
    if args.users is not None:
        overrides["synthetic_users"] = args.users
    if args.items is not None:
        overrides["synthetic_items"] = args.items
    if args.interactions is not None:
        overrides["synthetic_interactions"] = args.interactions
    if getattr(args, "scan_chunk", None) is not None:
        overrides["compute.scan_chunk"] = args.scan_chunk
    if getattr(args, "neg_range", None) is not None:
        overrides["hparams.neg_range"] = args.neg_range
    if getattr(args, "dtype", None) is not None:
        overrides["compute.dtype"] = args.dtype
    if getattr(args, "coo_table_sharding", False):
        overrides["compute.coo_table_sharding"] = True
    if getattr(args, "quantile", None) is not None:
        overrides["preprocessing.quantile_start"] = args.quantile[0]
        overrides["preprocessing.quantile_end"] = args.quantile[1]
    if getattr(args, "mesh", None) is not None:
        if args.mesh == "auto":
            overrides["compute.mesh_shape"] = (0, 0)  # all local devices
        else:
            parts = tuple(int(x) for x in args.mesh.split(","))
            if len(parts) != 2 or any(p < 1 for p in parts):
                raise SystemExit(f"--mesh expects DATA,MODEL (got {args.mesh!r})")
            overrides["compute.mesh_shape"] = parts
    if getattr(args, "data_dir", None):
        from lgcnhs_tpu.data.fetch import douban_paths, ml100k_paths, ml1m_paths

        path_fn = {
            "movielens1m": ml1m_paths,
            "douban": douban_paths,
        }.get(args.dataset, ml100k_paths)
        overrides["preprocessing.dataset_paths"] = path_fn(args.data_dir)
    elif getattr(args, "fetch", False) and args.dataset in (
        "movielens", "movielens1m"
    ):
        import os

        from lgcnhs_tpu.data.fetch import fetch_ml100k, fetch_ml1m

        fetch_fn = fetch_ml1m if args.dataset == "movielens1m" else fetch_ml100k
        paths = fetch_fn(os.path.join(args.workdir, "data"))
        if paths is not None:
            overrides["preprocessing.dataset_paths"] = paths
    cfg = load_config(
        env=args.env,
        dataset=args.dataset,
        model=args.model,
        workdir=args.workdir,
        overrides=overrides,
    )
    cfg.ensure_dirs()
    return cfg


def load_pipeline(cfg: Config):
    """Dataset -> (graph arrays, features, splits), with shape logging
    (reference ``main.py:47-58``). ``splits`` carries the raw<->internal id
    mappings (``handleRating``'s uid_mapping/iid_mapping,
    ``processing/handleData.py:70-77``) for external-id decode."""
    log = get_logger("lgcnhs", cfg.log_path)
    splits, user_features, item_features = load_dataset(cfg)
    graph = build_graph(splits)
    log.info(
        "users: %d, items: %d | train %s val %s test %s | user_features %s item_features %s",
        graph.n_users,
        graph.n_items,
        len(splits.train),
        len(splits.val),
        len(splits.test),
        user_features.shape,
        item_features.shape,
    )
    return graph, user_features, item_features, splits
