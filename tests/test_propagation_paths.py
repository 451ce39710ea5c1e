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


def test_unique_edges_dedupes_preserving_order():
    from lgcnhs_tpu.data.graph import EdgeSet, unique_edges

    es = EdgeSet(
        users=np.array([3, 1, 3, 2, 1, 3], np.int32),
        items=np.array([7, 0, 7, 5, 0, 2], np.int32),
    )
    ded = unique_edges(es)
    np.testing.assert_array_equal(ded.users, [3, 1, 2, 3])
    np.testing.assert_array_equal(ded.items, [7, 0, 5, 2])
    # duplicate-free input: exact no-op (ordering included)
    again = unique_edges(ded)
    np.testing.assert_array_equal(again.users, ded.users)
    np.testing.assert_array_equal(again.items, ded.items)
    empty = unique_edges(EdgeSet(np.zeros(0, np.int32), np.zeros(0, np.int32)))
    assert empty.n_edges == 0


def test_duplicate_edges_train_identically_on_dense_and_coo():
    """Duplicated (user, item) rating rows (handleRating never dedupes;
    real Douban exports can carry them) must not change the trained model
    with the propagation layout: the reference round-trips every edge list
    through a dense 0/1 adjacency (utils/graph.py:23-25) so its GCN sees
    each interaction once — the trainer dedupes its LightGCN-side edge
    lists to match (round-5 review finding: the COO path previously
    counted edge multiplicity in gcn_norm degrees AND aggregated the
    duplicated edge twice, silently diverging from the dense path when
    choose_propagation flipped)."""
    import pandas as pd

    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "epochs": 12, "epoch_per_eval": 6,
           "batch_size": 64}
    )
    df = synthesize_movielens_like(40, 60, 1800, seed=9)
    # duplicate ~25% of the rows (same user/item/rating, later timestamp)
    dup = df.sample(frac=0.25, random_state=0)
    df = pd.concat([df, dup], ignore_index=True)
    splits = prepare_ratings(df.sample(frac=1.0, random_state=1), cfg)
    graph = build_graph(splits)
    assert graph.train.n_edges > len(
        set(zip(graph.train.users.tolist(), graph.train.items.tolist()))
    ), "fixture must actually carry duplicated train edges"

    dense = train_lightgcn(graph, cfg.replace(hparams=hp), save_artifacts=False)
    coo = train_lightgcn(
        graph,
        cfg.replace(
            hparams=hp,
            compute=dataclasses.replace(cfg.compute, dense_threshold=1.0),
        ),
        save_artifacts=False,
    )
    # identical (deduped) triple stream + binary-degree propagation on both
    # layouts: same history up to float reassociation
    for key in ("train_loss", "val_loss"):
        np.testing.assert_allclose(
            np.asarray(dense.history[key], np.float64),
            np.asarray(coo.history[key], np.float64),
            rtol=2e-4, atol=1e-5, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(dense.params.user_emb), np.asarray(coo.params.user_emb),
        rtol=2e-4, atol=1e-5,
    )
