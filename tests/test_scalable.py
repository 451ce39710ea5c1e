"""Large-graph (no O(U*I) materialization) path: kernel equivalences against
the dense kernels, plus an end-to-end train+eval at a scale where any dense
(U, I) allocation would be multi-GB — guarded by monkeypatching the dense
constructors to raise."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import (
    EdgeSet,
    build_graph,
    interaction_matrix,
    item_degrees,
    pos_bool_matrix,
)
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.models.lightgcn import init_lightgcn, sample_bpr_batch
from lgcnhs_tpu.ops import metrics_ops
from lgcnhs_tpu.ops.scalable import (
    chunked_masked_topk,
    hits_csr,
    internal_similarity_csr,
    sample_bpr_batch_csr,
    user_csr,
)
from lgcnhs_tpu.ops.topk import masked_topk

U, I = 60, 170


def _edges(seed=0, n=900):
    rng = np.random.default_rng(seed)
    pairs = np.unique(
        np.stack([rng.integers(0, U, n), rng.integers(0, I, n)]), axis=1
    )
    return EdgeSet(pairs[0].astype(np.int32), pairs[1].astype(np.int32))


def test_csr_sampler_bit_identical_to_dense():
    es = _edges()
    rowptr, cols = user_csr(U, es)
    pos_mask = jnp.asarray(pos_bool_matrix(U, I, es))
    eu, ei = jnp.asarray(es.users), jnp.asarray(es.items)
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        d = sample_bpr_batch(key, eu, ei, pos_mask, 64, I)
        s = sample_bpr_batch_csr(key, eu, ei, jnp.asarray(rowptr), jnp.asarray(cols), 64, I)
        for a, b in zip(d, s):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_csr_sampler_negatives_never_positive():
    es = _edges(seed=3)
    rowptr, cols = user_csr(U, es)
    pos = pos_bool_matrix(U, I, es)
    users, _, negs = sample_bpr_batch_csr(
        jax.random.PRNGKey(7), jnp.asarray(es.users), jnp.asarray(es.items),
        jnp.asarray(rowptr), jnp.asarray(cols), 256, I,
    )
    assert not pos[np.asarray(users), np.asarray(negs)].any()


def test_all_edges_sampler_covers_every_edge_once_and_matches_csr():
    """sample_negatives_for_edges (the calValLoss sampler,
    model/LightGCN/evaluation.py:68-77): enumeration is the edge list itself
    in order, negatives are true negatives, and the CSR flavor is
    bit-identical to the dense one."""
    from lgcnhs_tpu.models.lightgcn import sample_negatives_for_edges
    from lgcnhs_tpu.ops.scalable import sample_negatives_for_edges_csr

    es = _edges(seed=5)
    rowptr, cols = user_csr(U, es)
    pos = pos_bool_matrix(U, I, es)
    eu, ei = jnp.asarray(es.users), jnp.asarray(es.items)
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        du, dp, dn = sample_negatives_for_edges(key, eu, ei, jnp.asarray(pos), I)
        # every edge exactly once, in order — no resample
        np.testing.assert_array_equal(np.asarray(du), es.users)
        np.testing.assert_array_equal(np.asarray(dp), es.items)
        assert not pos[np.asarray(du), np.asarray(dn)].any()
        su, sp, sn = sample_negatives_for_edges_csr(
            key, eu, ei, jnp.asarray(rowptr), jnp.asarray(cols), I
        )
        np.testing.assert_array_equal(np.asarray(dn), np.asarray(sn))
        np.testing.assert_array_equal(np.asarray(su), es.users)
        np.testing.assert_array_equal(np.asarray(sp), es.items)


def test_chunked_masked_topk_matches_dense():
    es = _edges(seed=1)
    rowptr, cols = user_csr(U, es)
    params = init_lightgcn(jax.random.PRNGKey(2), U, I, 16)
    scores = jnp.dot(
        params.user_emb, params.item_emb.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    want = masked_topk(scores, jnp.asarray(pos_bool_matrix(U, I, es)), 7)
    # tiny chunk_bytes forces many chunks incl. a ragged tail
    got = chunked_masked_topk(
        params.user_emb, params.item_emb, rowptr, cols, 7,
        chunk_bytes=64 * 4 * I,
    )
    np.testing.assert_array_equal(got, np.asarray(want))


def test_hits_csr_matches_dense_hit_matrix():
    es = _edges(seed=4)
    rowptr, cols = user_csr(U, es)
    rec = np.random.default_rng(5).integers(0, I, (U, 9)).astype(np.int32)
    want = metrics_ops.hit_matrix(
        jnp.asarray(rec), jnp.asarray(pos_bool_matrix(U, I, es))
    )
    got = hits_csr(jnp.asarray(rec), jnp.asarray(rowptr), jnp.asarray(cols))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_internal_similarity_csr_matches_dense():
    es = _edges(seed=6)
    rng = np.random.default_rng(7)
    # distinct items per row (top-k lists never repeat an item)
    rec = np.stack([rng.choice(I, 8, replace=False) for _ in range(U)]).astype(np.int32)
    deg = item_degrees(I, es)
    dense = metrics_ops.internal_similarity(
        jnp.asarray(rec),
        jnp.asarray(interaction_matrix(U, I, es)),
        jnp.asarray(deg),
    )
    sparse = internal_similarity_csr(
        rec, (np.asarray(es.users), np.asarray(es.items)), U, I, deg
    )
    assert sparse == pytest.approx(float(dense), rel=1e-5)


def test_huge_graph_trains_without_dense_allocations(monkeypatch):
    """200k-user-class scale (VERDICT r1 item 2): dense (U, I) would be
    ~9.6 GB, so the dense constructors are monkeypatched to raise — the whole
    train+eval+recommend path must never call them."""
    import lgcnhs_tpu.train.trainer as trainer_mod
    import lgcnhs_tpu.models.recommenders as rec_mod

    def _boom(*a, **kw):
        raise AssertionError("dense (U, I) constructor called on the COO path")

    for name in ("interaction_matrix", "pos_bool_matrix", "normalized_bipartite"):
        monkeypatch.setattr(trainer_mod, name, _boom)
    monkeypatch.setattr(rec_mod, "pos_bool_matrix", _boom)

    cfg = load_config(
        env="dev", dataset="synthetic", model="LightGCN",
        overrides={
            "hparams.epochs": 2,
            "hparams.epoch_per_eval": 2,
            "hparams.batch_size": 256,
            "hparams.embedding_dim": 8,
            "k": 5,
        },
    )
    df = synthesize_movielens_like(60_000, 40_000, 300_000, seed=11)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    assert 4.0 * graph.n_users * graph.n_items > 4e9  # auto-selects COO

    result = trainer_mod.train_lightgcn(graph, cfg, save_artifacts=False)
    for name, series in result.history.items():
        assert all(np.isfinite(v) for v in series), (name, series)
    assert len(result.history["val_precision"]) == 1

    rec = rec_mod.recommend_gcn(graph, cfg, result.params)
    assert rec.shape == (graph.n_users, cfg.k)
    assert (rec >= 0).all() and (rec < graph.n_items).all()
    # top-k lists never contain a train/val positive
    seen = set(zip(graph.train.users.tolist(), graph.train.items.tolist()))
    seen.update(zip(graph.val.users.tolist(), graph.val.items.tolist()))
    urows = np.random.default_rng(0).choice(graph.n_users, 200, replace=False)
    for u in urows:
        for it in rec[u]:
            assert (int(u), int(it)) not in seen


def test_all_edges_sampler_reject_user_ids_flag():
    """reject_user_ids reproduces calValLoss's contains_neg_self_loops=False
    (evaluation.py:71): no emitted negative equals its edge's user id, in
    both sampler flavors, which stay bit-identical to each other. Default
    (False) streams are unchanged."""
    from lgcnhs_tpu.models.lightgcn import sample_negatives_for_edges
    from lgcnhs_tpu.ops.scalable import sample_negatives_for_edges_csr

    es = _edges(seed=9)
    rowptr, cols = user_csr(U, es)
    pos = pos_bool_matrix(U, I, es)
    eu, ei = jnp.asarray(es.users), jnp.asarray(es.items)
    saw_collision = False
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        _, _, base = sample_negatives_for_edges(key, eu, ei, jnp.asarray(pos), I)
        du, dp, dn = sample_negatives_for_edges(
            key, eu, ei, jnp.asarray(pos), I, reject_user_ids=True
        )
        dn_np = np.asarray(dn)
        assert not (dn_np == es.users).any()
        assert not pos[np.asarray(du), dn_np].any()
        saw_collision |= bool((np.asarray(base) == es.users).any())
        _, _, sn = sample_negatives_for_edges_csr(
            key, eu, ei, jnp.asarray(rowptr), jnp.asarray(cols), I,
            reject_user_ids=True,
        )
        np.testing.assert_array_equal(dn_np, np.asarray(sn))
    # the flag must have actually rejected something across the seeds
    # (U ~ I here, so value coincidences are common in the base stream)
    assert saw_collision
