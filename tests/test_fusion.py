import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import (
    build_graph,
    interaction_matrix,
    pos_bool_matrix,
)
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.models.fusion import allocate_matrix, fused_recommend
from lgcnhs_tpu.models.lightgcn import init_lightgcn, layer0_scores
from lgcnhs_tpu.ops.topk import MASK_VALUE
from tests import reference_formulas as ref


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(env="dev", dataset="synthetic", model="SpreadLightGCN")
    df = synthesize_movielens_like(40, 70, 1500, seed=13)
    splits = prepare_ratings(df, cfg)
    graph = build_graph(splits)
    params = init_lightgcn(jax.random.PRNGKey(5), graph.n_users, graph.n_items, 16)
    return cfg, graph, params


def test_allocate_matrix_masks_seen(setup):
    cfg, graph, params = setup
    seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    G = np.asarray(allocate_matrix(params, jnp.asarray(seen)))
    assert (G[seen] == MASK_VALUE).all()
    raw = np.asarray(layer0_scores(params))
    np.testing.assert_allclose(G[~seen], raw[~seen], rtol=1e-5)


def test_fused_recommend_matches_reference_chain(setup):
    """G * F Hadamard fusion + spread ranking == literal reference chain
    (model/SpreadLightGCN/model.py:122-153 + recommend.py:18-75)."""
    cfg, graph, params = setup
    lam = 0.5
    A = interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    seen = pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)

    got = np.asarray(
        fused_recommend(
            params, jnp.asarray(A), jnp.asarray(seen), jnp.float32(lam), cfg.k
        )
    )

    # reference-formula chain in float64
    G = np.asarray(layer0_scores(params)).astype(np.float64)
    G[seen] = MASK_VALUE
    W_gen = ref.ref_general_w(A.astype(np.float64))
    F = ref.ref_resource(A.astype(np.float64), ref.ref_hybrid(A, W_gen, lam))
    F_new = G * F
    seen_lists = {u: list(np.flatnonzero(seen[u])) for u in range(graph.n_users)}
    want = ref.ref_rank_filter(F_new, seen_lists, cfg.k, filter_seen=True)

    # float32-vs-float64 rounding can flip near-equal scores; require
    # near-total agreement and identical first halves
    agree = (got == want).mean()
    assert agree > 0.97, f"only {agree:.3f} agreement"


def test_fused_recommend_tall_dispatch_same_lists(setup, monkeypatch):
    """fused_recommend's diffusion dispatch (diffusion_scores_auto) must
    yield the same recommendation lists when the budget forces the W-free
    factored regime (float reassociation cannot reorder at these gaps)."""
    import lgcnhs_tpu.ops.diffusion as diff

    from lgcnhs_tpu.models.lightgcn import LightGCNParams

    cfg, graph, params = setup
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    # tall slice: 30 users x 70 items satisfies 2U < I
    U = 30
    params = LightGCNParams(params.user_emb[:U], params.item_emb)
    A, seen = A[:U], seen[:U]
    lam = jnp.float32(0.6)
    dense = np.asarray(fused_recommend(params, A, seen, lam, k=5))
    # budget excludes the dense live set (2 I^2 + 3 U I) but fits the
    # factored one (U^2 + 3 U I) at this 30 x ~70 f32 slice
    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 30_000)
    assert diff.choose_diffusion(U, graph.n_items) == "factored"
    # the dispatch happens at trace time — force a retrace
    fused_recommend.clear_cache()
    factored = np.asarray(fused_recommend(params, A, seen, lam, k=5))
    fused_recommend.clear_cache()
    np.testing.assert_array_equal(factored, dense)


def test_lambda_extremes_change_ranking(setup):
    cfg, graph, params = setup
    A = jnp.asarray(
        interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    seen = jnp.asarray(
        pos_bool_matrix(graph.n_users, graph.n_items, graph.train, graph.val)
    )
    rec0 = np.asarray(fused_recommend(params, A, seen, jnp.float32(0.0), cfg.k))
    rec1 = np.asarray(fused_recommend(params, A, seen, jnp.float32(1.0), cfg.k))
    assert (rec0 != rec1).any()
