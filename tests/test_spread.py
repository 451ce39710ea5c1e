"""End-to-end SpreadMethod pipeline against the literal reference formulas."""
import numpy as np
import pytest

from lgcnhs_tpu.config import load_config
from lgcnhs_tpu.data.graph import build_graph, interaction_matrix
from lgcnhs_tpu.data.ratings import prepare_ratings
from lgcnhs_tpu.data.synthetic import synthesize_movielens_like
from lgcnhs_tpu.models.spread import recommend_spread_method, resolve_spread_variant
from tests import reference_formulas as ref


@pytest.fixture(scope="module")
def graph_and_cfg():
    cfg = load_config(env="dev", dataset="synthetic", model="HybridS")
    df = synthesize_movielens_like(80, 120, 4000, seed=11)
    splits = prepare_ratings(df, cfg)
    return build_graph(splits), cfg


def _seen_lists(graph):
    seen = {}
    for es in (graph.train, graph.val):
        for u, i in zip(es.users, es.items):
            seen.setdefault(int(u), []).append(int(i))
    return seen


@pytest.mark.parametrize("method", ["ProbS", "HeatS", "HybridS"])
def test_spread_end_to_end_parity(graph_and_cfg, method):
    graph, cfg = graph_and_cfg
    cfg = cfg.replace(model=method)
    rec = recommend_spread_method(graph, cfg, method)
    assert rec.shape == (graph.n_users, cfg.k)

    # literal reference computation
    A = interaction_matrix(graph.n_users, graph.n_items, graph.train, graph.val).astype(
        np.float64
    )
    lam, transpose_w, filter_seen = resolve_spread_variant(
        method, cfg.dataset, cfg.hparams.lambda_
    )
    W_gen = ref.ref_general_w(A)
    if transpose_w:
        W_gen = W_gen.T
    F = ref.ref_resource(A, ref.ref_hybrid(A, W_gen, lam))
    want = ref.ref_rank_filter(F, _seen_lists(graph), cfg.k, filter_seen)
    np.testing.assert_array_equal(rec, want)


def test_movielens_probs_quirk():
    """ProbS-on-movielens: lambda 0.01, transposed W_gen, NO seen filter
    (model/SpreadMethod/recommend.py:48-50,88-91)."""
    lam, transpose_w, filter_seen = resolve_spread_variant("ProbS", "movielens", 1.0)
    assert (lam, transpose_w, filter_seen) == (0.01, True, False)


def test_douban_heats_quirk():
    lam, transpose_w, filter_seen = resolve_spread_variant("HeatS", "douban", 0.0)
    assert (lam, transpose_w, filter_seen) == (0.99, True, True)
