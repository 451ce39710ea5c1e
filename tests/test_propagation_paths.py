"""Dense vs COO trainer path selection and equivalence."""
import dataclasses

import numpy as np
import pytest

from lgcnhs_tpu.config import ComputeConfig, load_config
from lgcnhs_tpu.data.graph import build_graph
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.train.trainer import choose_propagation, train_lightgcn


def test_choose_propagation():
    compute = ComputeConfig()
    # small dense graph -> dense
    assert choose_propagation(1000, 2000, 100_000, compute) == "dense"
    # incidence over 4GB -> coo
    assert choose_propagation(200_000, 100_000, 5_000_000, compute) == "coo"
    # hyper-sparse -> coo
    assert choose_propagation(10_000, 10_000, 500, compute) == "coo"
    # mixed precision stores the incidence at 2 bytes/entry: the dense
    # regime reaches 2x the catalog area (50k x 30k = 6 GB f32 / 3 GB bf16)
    assert choose_propagation(50_000, 30_000, 2_000_000, compute) == "coo"
    bf16 = dataclasses.replace(compute, dtype="bfloat16")
    assert choose_propagation(50_000, 30_000, 2_000_000, bf16) == "dense"
    assert choose_propagation(200_000, 100_000, 5_000_000, bf16) == "coo"


def test_coo_training_path_runs_and_learns():
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    # force the COO path via an absurd density threshold
    cfg = cfg.replace(
        compute=dataclasses.replace(cfg.compute, dense_threshold=1.0),
        hparams=cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "epochs": 40, "epoch_per_eval": 20,
               "batch_size": 128}
        ),
    )
    df = synthesize_movielens_like(50, 80, 2500, seed=6)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    result = train_lightgcn(graph, cfg, save_artifacts=False)
    losses = result.history["train_loss"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
