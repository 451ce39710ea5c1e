import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import build_graph
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_features, synthesize_movielens_like
from lgcnhs_tpu.train.trainer import (
    load_checkpoint,
    lr_schedule,
    save_checkpoint,
    train_lightgcn,
)


@pytest.fixture(scope="module")
def small_graph():
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    df = synthesize_movielens_like(60, 90, 3000, seed=3)
    splits = prepare_ratings(df, cfg)
    return build_graph(splits), cfg


def test_lr_schedule_reference_semantics():
    """lr0 * gamma^max(0, floor((e-1)/200)): decay at 201, 401, ... matching
    scheduler.step() every 200 epochs skipping epoch 0
    (model/LightGCN/train.py:180-181)."""
    sched = lr_schedule(1e-3, 0.95, 200)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(200)) == pytest.approx(1e-3)
    assert float(sched(201)) == pytest.approx(1e-3 * 0.95)
    assert float(sched(400)) == pytest.approx(1e-3 * 0.95)
    assert float(sched(401)) == pytest.approx(1e-3 * 0.95**2)


def test_training_reduces_loss(small_graph):
    graph, cfg = small_graph
    cfg = cfg.replace(
        hparams=cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "epochs": 60, "epoch_per_eval": 20, "batch_size": 256}
        )
    )
    result = train_lightgcn(graph, cfg, save_artifacts=False)
    assert result.params.user_emb.shape == (graph.n_users, cfg.hparams.embedding_dim)
    losses = result.history["train_loss"]
    assert len(losses) == 3
    # the sign-flipped BPR decreases (more negative) as ranking improves
    assert losses[-1] < losses[0]
    assert all(np.isfinite(v) for v in losses)
    # eval metrics recorded each eval epoch
    assert len(result.history["val_precision"]) == 3
    assert result.history["iters"] == [0, 20, 40]


def test_training_with_features_opti(small_graph):
    graph, cfg = small_graph
    cfg = cfg.replace(
        model="LightGCNOpti",
        hparams=cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "epochs": 10, "epoch_per_eval": 5, "batch_size": 128}
        ),
    )
    uf = synthesize_features(graph.n_users, 12, 0)
    itf = synthesize_features(graph.n_items, 9, 1)
    result = train_lightgcn(graph, cfg, uf, itf, save_artifacts=False)
    assert np.isfinite(result.history["train_loss"]).all()


def test_checkpoint_roundtrip(tmp_path, small_graph):
    graph, cfg = small_graph
    cfg = cfg.replace(
        hparams=cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "epochs": 3, "epoch_per_eval": 2}
        )
    )
    result = train_lightgcn(graph, cfg, save_artifacts=False)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, result.params)
    loaded = load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(loaded.user_emb), np.asarray(result.params.user_emb)
    )
    assert load_checkpoint(str(tmp_path / "missing.npz")) is None


def test_scan_chunk_is_invisible_to_training(small_graph):
    """compute.scan_chunk bounds the device-program length (relayed TPUs
    kill long executions); the fold_in-per-epoch key stream must make any
    chunking produce the identical model."""
    graph, cfg = small_graph
    cfg = cfg.replace(
        hparams=cfg.hparams.__class__(
            **{**cfg.hparams.__dict__, "epochs": 24, "epoch_per_eval": 12,
               "batch_size": 64}
        )
    )
    res_full = train_lightgcn(graph, cfg, save_artifacts=False)
    cfg_chunked = cfg.replace(
        compute=cfg.compute.__class__(
            **{**cfg.compute.__dict__, "scan_chunk": 5}
        )
    )
    res_chunked = train_lightgcn(graph, cfg_chunked, save_artifacts=False)
    np.testing.assert_array_equal(
        np.asarray(res_full.params.user_emb),
        np.asarray(res_chunked.params.user_emb),
    )
    assert res_full.history["train_loss"] == res_chunked.history["train_loss"]
    assert res_full.history["val_loss"] == res_chunked.history["val_loss"]


def test_train_scan_matches_per_step_path(small_graph):
    """make_train_scan's fold_in-per-epoch stream must reproduce the
    per-dispatch make_train_step sequence bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import optax

    from lgcnhs_tpu.data.graph import normalized_bipartite, pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.train.trainer import make_train_scan, make_train_step

    graph, cfg = small_graph
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 64, "embedding_dim": 8}
    )
    U, I = graph.n_users, graph.n_items
    R_hat = jnp.asarray(normalized_bipartite(U, I, graph.train))
    pos = jnp.asarray(pos_bool_matrix(U, I, graph.train))
    eu = jnp.asarray(graph.train.users)
    ei = jnp.asarray(graph.train.items)
    optimizer = optax.adam(1e-2)
    key = jax.random.PRNGKey(11)

    params_a = init_lightgcn(jax.random.PRNGKey(0), U, I, 8)
    state_a = optimizer.init(params_a)
    step = make_train_step(optimizer, hp, I)
    for e in range(2, 7):  # arbitrary non-zero epoch window
        k = jax.random.fold_in(key, e)
        params_a, state_a, loss_a = step(params_a, state_a, k, R_hat, eu, ei, pos)

    params_b = init_lightgcn(jax.random.PRNGKey(0), U, I, 8)
    state_b = optimizer.init(params_b)
    scan = make_train_scan(optimizer, hp, I)
    params_b, state_b, loss_b = scan(params_b, state_b, key, 2, 5, R_hat, eu, ei, pos)

    np.testing.assert_array_equal(
        np.asarray(params_a.user_emb), np.asarray(params_b.user_emb)
    )
    np.testing.assert_array_equal(
        np.asarray(params_a.item_emb), np.asarray(params_b.item_emb)
    )
    assert float(loss_a) == float(loss_b)
