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


# ---- hparams.neg_range="reference" (torch-geometric candidate-range quirk,
# model/LightGCN/loss.py:58 / evaluation.py:71-72; docs/PARITY.md
# "Known deviations" #6) ----


def _tail_graph(n_users=20, n_items=40, tail=6, seed=0):
    """Graph whose last ``tail`` item ids appear in NO split: the regime where
    the reference's structured_negative_sampling (candidates bounded by the
    split's max node id) can never draw them as negatives."""
    from lgcnhs_tpu.data.graph import EdgeSet, InteractionGraph

    rng = np.random.default_rng(seed)
    eu = rng.integers(0, n_users, 500).astype(np.int32)
    ei = rng.integers(0, n_items - tail, 500).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei]), axis=1)
    eu, ei = pairs[0], pairs[1]
    n = eu.shape[0]
    perm = rng.permutation(n)
    cut1, cut2 = int(0.8 * n), int(0.9 * n)

    def es(idx):
        return EdgeSet(eu[idx].copy(), ei[idx].copy())

    return InteractionGraph(
        n_users, n_items, EdgeSet(eu, ei),
        es(perm[:cut1]), es(perm[cut1:cut2]), es(perm[cut2:]),
    )


def _neg_range_cfg(neg_range, mesh=(1, 1), dense_threshold=0.001):
    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    return cfg.replace(
        hparams=cfg.hparams.__class__(
            **{
                **cfg.hparams.__dict__,
                "epochs": 8,
                "epoch_per_eval": 4,
                "batch_size": 256,
                "neg_range": neg_range,
            }
        ),
        compute=cfg.compute.__class__(
            **{
                **cfg.compute.__dict__,
                "mesh_shape": mesh,
                "dense_threshold": dense_threshold,
            }
        ),
    )


@pytest.mark.parametrize(
    "mesh,dense_threshold",
    [((1, 1), 0.001), ((1, 1), 1.0), ((1, 2), 0.001)],
    ids=["dense", "coo", "mesh-dense"],
)
def test_neg_range_reference_tail_items_receive_no_gradient(mesh, dense_threshold):
    """Under neg_range='reference', items beyond the split's max id are never
    drawn as negatives, so (having no edges either) their embeddings never
    receive ANY gradient and stay bit-exact at init — the reference's
    observable behavior. Under the default 'catalog' range the same rows move
    (drawn as negatives w.h.p.). Covers the dense, CSR/COO, and sharded
    sampler wirings."""
    import jax

    from lgcnhs_tpu.models.lightgcn import init_lightgcn

    tail = 6
    graph = _tail_graph(tail=tail)
    max_id = int(max(graph.train.items.max(), graph.train.users.max(),
                     graph.val.items.max(), graph.val.users.max()))
    assert max_id < graph.n_items - tail  # the premise: a real tail exists

    cfg = _neg_range_cfg("reference", mesh, dense_threshold)
    # the exact init stream train_lightgcn uses
    key = jax.random.PRNGKey(cfg.hparams.seed)
    _, init_key = jax.random.split(key)
    init = init_lightgcn(
        init_key, graph.n_users, graph.n_items, cfg.hparams.embedding_dim
    )

    result = train_lightgcn(graph, cfg, save_artifacts=False)
    got_tail = np.asarray(result.params.item_emb)[-tail:]
    np.testing.assert_array_equal(got_tail, np.asarray(init.item_emb)[-tail:])
    # trained rows DID move (training happened)
    assert not np.allclose(
        np.asarray(result.params.item_emb)[: graph.n_items - tail],
        np.asarray(init.item_emb)[: graph.n_items - tail],
    )

    result_cat = train_lightgcn(
        graph, _neg_range_cfg("catalog", mesh, dense_threshold),
        save_artifacts=False,
    )
    assert not np.allclose(
        np.asarray(result_cat.params.item_emb)[-tail:], got_tail
    )


def test_neg_range_reference_rejects_user_ids_beyond_catalog():
    """When the split's max USER id >= n_items the reference's own sampler
    would index items_emb out of range (e.g. ML-1M's 6040 users > 3706
    items); we fail fast with the explanation instead."""
    from lgcnhs_tpu.data.graph import EdgeSet, InteractionGraph

    rng = np.random.default_rng(1)
    eu = np.arange(30, dtype=np.int32)  # max user id 29 >= n_items=10
    ei = rng.integers(0, 10, 30).astype(np.int32)
    es = EdgeSet(eu, ei)
    graph = InteractionGraph(30, 10, es, es, es, es)
    with pytest.raises(ValueError, match="neg_range='reference'"):
        train_lightgcn(graph, _neg_range_cfg("reference"), save_artifacts=False)


def test_neg_range_unknown_value_rejected():
    graph = _tail_graph()
    with pytest.raises(ValueError, match="neg_range"):
        train_lightgcn(graph, _neg_range_cfg("bogus"), save_artifacts=False)


def test_donate_state_false_is_honored_and_equivalent(small_graph):
    """compute.donate_state=False re-jits the step/scan without buffer
    donation (previously the knob was advertised in config.py/MIGRATION.md
    but never read — round-5 review finding). Training math is identical;
    only the buffer reuse changes."""
    import dataclasses

    graph, cfg = small_graph
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "epochs": 10, "epoch_per_eval": 5,
           "batch_size": 64}
    )
    base = train_lightgcn(graph, cfg.replace(hparams=hp), save_artifacts=False)
    nodonate = train_lightgcn(
        graph,
        cfg.replace(
            hparams=hp,
            compute=dataclasses.replace(cfg.compute, donate_state=False),
        ),
        save_artifacts=False,
    )
    np.testing.assert_array_equal(
        np.asarray(base.history["train_loss"]),
        np.asarray(nodonate.history["train_loss"]),
    )
    np.testing.assert_array_equal(
        np.asarray(base.params.user_emb), np.asarray(nodonate.params.user_emb)
    )
