"""Fused LGCNHS serving kernel vs the unfused XLA chain."""
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.pallas.fusion_serve import fused_lgcnhs_serve

U, I, D, K = 70, 190, 16, 10


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(23)
    ue = rng.standard_normal((U, D)).astype(np.float32)
    ie = rng.standard_normal((I, D)).astype(np.float32)
    A = (rng.random((U, I)) < 0.15).astype(np.float32)
    seen = A > 0
    # HybridS-like transfer matrix (non-negative)
    W = rng.random((I, I)).astype(np.float32) * 0.1
    return ue, ie, A, W, seen


def _reference(ue, ie, A, W, seen, k):
    G = ue @ ie.T
    F = A @ W
    fused = np.where(seen, -np.inf, G * F)
    idx = np.argsort(-fused, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(fused, idx, axis=1)
    return idx, vals


def test_matches_unfused_chain(problem):
    ue, ie, A, W, seen = problem
    idx, vals = fused_lgcnhs_serve(
        jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(A), jnp.asarray(W),
        jnp.asarray(seen), K, item_tile=64, interpret=True,
    )
    want_idx, want_vals = _reference(ue, ie, A, W, seen, K)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-4, atol=1e-4)


def test_never_recommends_seen_or_padded(problem):
    ue, ie, A, W, seen = problem
    idx, _ = fused_lgcnhs_serve(
        jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(A), jnp.asarray(W),
        jnp.asarray(seen), K, item_tile=64, interpret=True,
    )
    idx = np.asarray(idx)
    assert (idx < I).all()
    for u in range(U):
        assert not seen[u, idx[u]].any()


def test_zero_product_does_not_outrank_negative(problem):
    """The -1024*0 = 0 pitfall: an unseen item with F=0 scores G*0 = 0, which
    must compete as 0, while seen items must NEVER appear even when all
    unseen products are negative."""
    rng = np.random.default_rng(1)
    ue = -np.abs(rng.standard_normal((4, 8))).astype(np.float32)
    ie = np.abs(rng.standard_normal((20, 8))).astype(np.float32)
    A = np.zeros((4, 20), np.float32)
    A[:, :15] = 1.0  # items 15..19 unseen, F columns nonzero via W
    W = np.ones((20, 20), np.float32)
    seen = A > 0
    idx, vals = fused_lgcnhs_serve(
        jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(A), jnp.asarray(W),
        jnp.asarray(seen), 5, item_tile=4, interpret=True,
    )
    idx = np.asarray(idx)
    assert (idx >= 15).all()  # only the 5 unseen items are eligible


def test_serve_exact_routes_to_highest_chain(monkeypatch, tmp_path):
    """serve_fused(exact=True) must take the HIGHEST-precision XLA chain —
    never the fused kernel or the native-precision unfused chain (VERDICT
    r4 #6: parity-critical serving is a flag, not a code read)."""
    import jax
    import jax.numpy as jnp

    from lgcnhs_tpu import models
    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import build_graph, interaction_matrix, pos_bool_matrix
    from lgcnhs_tpu.data.ratings import prepare_ratings
    from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
    from lgcnhs_tpu.models import fusion
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.ops.diffusion import general_spreading_matrix, hybrid_transfer

    cfg = load_config(env="dev", dataset="synthetic", model="SpreadLightGCN",
                      overrides={"k": 7})
    df = synthesize_movielens_like(40, 60, 1200, seed=3)
    graph = build_graph(prepare_ratings(df, cfg))
    params = init_lightgcn(jax.random.PRNGKey(0), graph.n_users, graph.n_items, 8)

    def _poison(*a, **k):
        raise AssertionError("speed-path serving dispatched under exact=True")

    monkeypatch.setattr(fusion, "_serve_unfused", _poison)
    import lgcnhs_tpu.ops.pallas.fusion_serve as fs
    monkeypatch.setattr(fs, "fused_lgcnhs_serve", _poison)

    rec = fusion.serve_fused(graph, cfg, params, exact=True)
    assert rec.shape == (graph.n_users, cfg.k)

    # equals top_k over the independently-computed HIGHEST fused scores
    A = jnp.asarray(interaction_matrix(graph.n_users, graph.n_items,
                                       graph.train, graph.val))
    seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    W = hybrid_transfer(A, general_spreading_matrix(A),
                        jnp.asarray(cfg.hparams.lambda_, A.dtype))
    hi = jax.lax.Precision.HIGHEST
    G = np.asarray(jnp.dot(params.user_emb, params.item_emb.T, precision=hi,
                           preferred_element_type=jnp.float32))
    F = np.asarray(jnp.dot(A, W, precision=hi,
                           preferred_element_type=jnp.float32))
    fused_scores = np.where(seen, -3.0e38, G * F)
    want = np.asarray(jax.lax.top_k(jnp.asarray(fused_scores), cfg.k)[1])
    np.testing.assert_array_equal(rec, want)


def test_retrieve_cli_serve_exact_flag(tmp_path):
    """--serve-exact plumbs through cli.retrieve for fusion models."""
    from lgcnhs_tpu.cli import retrieve as retrieve_cli

    rec = retrieve_cli.main([
        "--dataset", "synthetic", "--env", "dev", "--model", "SpreadLightGCN",
        "--users", "40", "--items", "60", "--interactions", "1200",
        "--epochs", "8", "--k", "6", "--workdir", str(tmp_path),
        "--serve-exact",
    ])
    assert rec.shape[1] == 6
    assert (rec >= 0).all()
