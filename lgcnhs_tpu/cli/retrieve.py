"""Batch retrieval from a trained checkpoint (serving path).

Loads a LightGCN[Opti] checkpoint, runs the fused Pallas retrieval kernel
(or the XLA path off-TPU) over the full catalog with train+val positives
masked, and writes the (U, k) recommendation matrix plus a JSON of raw-id
recommendations decoded through the id mapper.

The reference has no standalone serving path — recommendation generation is
buried in each model's recommend.py and emits pickled dicts of internal ids
(``model/LightGCN/recommend.py:114-122``).

Usage:
  python -m lgcnhs_tpu.cli.retrieve --dataset synthetic --model LightGCN --k 10
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.cli.common import base_parser, config_from_args
from lgcnhs_tpu.data.datasets import load_dataset
from lgcnhs_tpu.data.graph import build_graph, pos_bool_matrix
from lgcnhs_tpu.data.idmap import IdMapper
from lgcnhs_tpu.models.recommenders import get_or_train_params
from lgcnhs_tpu.ops.topk import retrieve_topk
from lgcnhs_tpu.runtime.logging import get_logger


def main(argv=None):
    parser = base_parser(__doc__)
    parser.add_argument(
        "--decode", action="store_true",
        help="also write raw-id recommendations via the id mapper",
    )
    parser.add_argument(
        "--serve-exact", action="store_true",
        help="fusion models: serve through the HIGHEST-precision XLA chain "
        "instead of the fused Pallas kernel (whose native-MXU matmuls are "
        "tie-equivalent but can swap value-equal slots) — parity-critical "
        "serving as a flag, any catalog size",
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    log = get_logger("lgcnhs", cfg.log_path)

    splits, user_features, item_features = load_dataset(cfg)
    graph = build_graph(splits)
    params = get_or_train_params(graph, cfg, user_features, item_features)

    if cfg.model in ("SpreadLightGCN", "SpreadLightGCNOpti"):
        from lgcnhs_tpu.models.fusion import serve_fused

        rec = serve_fused(graph, cfg, params, exact=args.serve_exact)
    else:
        seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
        rec = np.asarray(
            retrieve_topk(params.user_emb, params.item_emb, jnp.asarray(seen), cfg.k)
        )
    out = os.path.join(cfg.recommend_path, f"retrieval_{cfg.model}_{cfg.k}.npy")
    np.save(out, rec)
    log.info("retrieval matrix saved: %s %s", out, rec.shape)

    if args.decode and splits.uid_mapping:
        mapper = IdMapper.from_splits(splits)
        decoded = mapper.decode_recommendations(rec)
        out_json = os.path.join(
            cfg.recommend_path, f"retrieval_{cfg.model}_{cfg.k}.json"
        )
        with open(out_json, "w") as f:
            json.dump({str(k): [str(i) for i in v] for k, v in decoded.items()}, f)
        log.info("decoded recommendations saved: %s", out_json)
    return rec


if __name__ == "__main__":
    main()
