"""Flagship multi-chip path regression: ``train_lightgcn`` / ``recommend_gcn``
/ ``recommend_fused`` driven THROUGH ``ComputeConfig.mesh_shape`` must
reproduce the single-device product exactly (the reference hardcodes one
device, ``model/LightGCN/train.py:87``; here the mesh is a config knob).

Catalog sizes are chosen NOT to divide the model axis so the padding
machinery (padded tables, seen=True/-inf padded columns, padded eval
matrices) is exercised, not just the happy divisible case.
"""
import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import build_graph
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.models.fusion import recommend_fused
from lgcnhs_tpu.models.recommenders import recommend_gcn
from lgcnhs_tpu.runtime.mesh import mesh_from_config
from lgcnhs_tpu.train.trainer import train_lightgcn

# 131 items: 131 % 4 == 3 and 131 % 8 == 3 — every mesh needs column padding
N_USERS, N_ITEMS, N_INTER = 40, 131, 1200


def _cfg(mesh_shape, epochs=6):
    return load_config(
        env="dev",
        dataset="synthetic",
        model="SpreadLightGCN",
        overrides={
            "compute.mesh_shape": mesh_shape,
            "hparams.epochs": epochs,
            "hparams.epoch_per_eval": 3,
            "hparams.batch_size": 64,
            "k": 7,
        },
    )


@pytest.fixture(scope="module")
def graph():
    df = synthesize_movielens_like(N_USERS, N_ITEMS, N_INTER, seed=3)
    splits = prepare_ratings(df, _cfg((1, 1)))
    return build_graph(splits)


@pytest.fixture(scope="module")
def single_device_run(graph):
    cfg = _cfg((1, 1))
    result = train_lightgcn(graph, cfg, save_artifacts=False)
    rec_gcn = recommend_gcn(graph, cfg, result.params)
    rec_fused = recommend_fused(graph, cfg, result.params)
    return result, rec_gcn, rec_fused


def test_mesh_from_config_semantics():
    assert mesh_from_config(_cfg((1, 1)).compute) is None
    mesh = mesh_from_config(_cfg((2, 4)).compute)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 2, "model": 4}
    auto = mesh_from_config(_cfg((0, 0)).compute)
    assert auto.devices.size == 8  # all fake devices on the model axis


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_mesh_training_matches_single_device(graph, single_device_run, mesh_shape):
    base, rec_gcn_1, rec_fused_1 = single_device_run
    cfg = _cfg(mesh_shape)
    result = train_lightgcn(graph, cfg, save_artifacts=False)

    # the logged history (loss + 6 metrics, already 5-dec rounded) must agree
    assert set(result.history) == set(base.history)
    for name in base.history:
        assert result.history[name] == pytest.approx(
            base.history[name], abs=2e-5
        ), name

    # final params: unpadded to the true catalog, numerically equal
    assert result.params.user_emb.shape == base.params.user_emb.shape
    assert result.params.item_emb.shape == base.params.item_emb.shape
    np.testing.assert_allclose(
        np.asarray(result.params.user_emb),
        np.asarray(base.params.user_emb),
        rtol=0, atol=1e-5,
    )

    # both serving paths emit the same item ids as single-device
    rec_gcn_m = recommend_gcn(graph, cfg, base.params)
    np.testing.assert_array_equal(rec_gcn_m, rec_gcn_1)
    rec_fused_m = recommend_fused(graph, cfg, base.params)
    np.testing.assert_array_equal(rec_fused_m, rec_fused_1)
    assert (rec_fused_m < graph.n_items).all()  # padded ids unreachable


def test_mesh_flagship_opti_with_features(graph):
    """SpreadLightGCNOpti under the mesh: the LightGCNOpti feature-projection
    init (init_lightgcn_opti) and feature plumbing must run sharded and match
    the single-device product (VERDICT r2 item 6)."""
    from lgcnhs_tpu.data.synthetic import synthesize_features

    uf = synthesize_features(graph.n_users, 29, seed=5)
    itf = synthesize_features(graph.n_items, 37, seed=6)

    def run(mesh_shape):
        cfg = _cfg(mesh_shape, epochs=4).replace(model="SpreadLightGCNOpti")
        result = train_lightgcn(
            graph, cfg, user_features=uf, item_features=itf, save_artifacts=False
        )
        rec = recommend_fused(graph, cfg, result.params)
        return result, rec

    base, rec_1 = run((1, 1))
    sharded, rec_m = run((2, 4))

    for name in base.history:
        assert sharded.history[name] == pytest.approx(
            base.history[name], abs=2e-5
        ), name
    np.testing.assert_allclose(
        np.asarray(sharded.params.user_emb),
        np.asarray(base.params.user_emb),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_array_equal(rec_m, rec_1)
