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
    # the bf16 expansion is SINGLE-CHIP only: the mesh-dense branch builds
    # host-side f32/f64 (U, I) arrays the rung never densifies, so a mesh
    # run in the expanded band keeps the f32 budget and takes the
    # edge-sharded COO path (round-4 review finding)
    bf16_mesh = dataclasses.replace(bf16, mesh_shape=(2, 4))
    assert choose_propagation(50_000, 30_000, 2_000_000, bf16_mesh) == "coo"
    # under the f32 budget, mesh-dense is unaffected
    assert choose_propagation(1000, 2000, 100_000, bf16_mesh) == "dense"


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


def test_bf16_dense_rung_trains_with_csr_eval(monkeypatch):
    """The bf16-dense middle rung (propagation 'dense' under a shrunken
    budget where the f32 eval arrays do NOT fit): dense train step + CSR
    eval machinery, device-built incidence. History must be finite and the
    final params must track a plain dense-bf16 run closely (same sampler
    stream; only the R_hat build differs at bf16 resolution)."""
    import lgcnhs_tpu.train.trainer as trainer_mod

    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    df = synthesize_movielens_like(50, 80, 1600, seed=21)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    U, I = graph.n_users, graph.n_items

    hp = dataclasses.replace(
        cfg.hparams, epochs=8, epoch_per_eval=4, batch_size=64
    )
    bf16 = dataclasses.replace(cfg.compute, dtype="bfloat16")
    cfg_bf16 = cfg.replace(hparams=hp, compute=bf16)

    # plain dense-bf16 run (budget ample)
    base = train_lightgcn(graph, cfg_bf16, save_artifacts=False)

    # shrink the budget into the rung's window: bf16 incidence fits
    # (2*U*I <= B), f32 eval arrays do not (4*U*I > B)
    budget = 3.0 * U * I
    monkeypatch.setattr(trainer_mod, "DENSIFY_BUDGET_BYTES", budget)
    monkeypatch.setattr(trainer_mod, "HOST_INCIDENCE_BUILD_BYTES", 0.0)
    assert choose_propagation(U, I, graph.train.n_edges, bf16) == "dense"
    assert 4.0 * U * I > budget  # eval must take the CSR machinery

    rung = train_lightgcn(graph, cfg_bf16, save_artifacts=False)
    for k, vals in rung.history.items():
        assert np.isfinite(np.asarray(vals, np.float64)).all(), k
    # same triple stream, R_hat equal to bf16 resolution -> close params
    np.testing.assert_allclose(
        np.asarray(rung.params.user_emb), np.asarray(base.params.user_emb),
        rtol=0.05, atol=5e-3,
    )


def test_choose_propagation_auto_mesh_on_single_device():
    """mesh_shape=(0,0) ('auto') resolves to NO mesh on a one-device host
    (mesh_from_config returns None); the trainer passes single_chip=True
    and the bf16 densify expansion must apply (round-4 review finding)."""
    compute = ComputeConfig(dtype="bfloat16", mesh_shape=(0, 0))
    # proxy default treats any non-(1,1) shape as multi-chip
    assert choose_propagation(50_000, 30_000, 2_000_000, compute) == "coo"
    # resolved truth overrides the proxy
    assert (
        choose_propagation(50_000, 30_000, 2_000_000, compute, single_chip=True)
        == "dense"
    )
