import numpy as np
import pandas as pd
import pytest

from lgcnhs_tpu.data.graph import EdgeSet
from lgcnhs_tpu.eval.metrics import EvalContext, accurate_metrics, diversity_metrics
from lgcnhs_tpu.ops import metrics_ops
from tests import reference_formulas as ref

U, I, K = 15, 30, 5


@pytest.fixture
def setup():
    rng = np.random.default_rng(3)
    train = EdgeSet(
        users=rng.integers(0, U, 120).astype(np.int32),
        items=rng.integers(0, I, 120).astype(np.int32),
    )
    val = EdgeSet(
        users=rng.integers(0, U, 30).astype(np.int32),
        items=rng.integers(0, I, 30).astype(np.int32),
    )
    # test split deliberately missing some users (dict-iteration parity)
    test_users = rng.integers(0, U - 3, 40).astype(np.int32)
    test = EdgeSet(users=test_users, items=rng.integers(0, I, 40).astype(np.int32))
    rec = np.stack([rng.choice(I, size=K, replace=False) for _ in range(U)]).astype(
        np.int32
    )
    ctx = EvalContext.build(U, I, test, train, val)
    return ctx, rec, train, val, test


def _pos_dict(es):
    d = {}
    for u, i in zip(es.users, es.items):
        d.setdefault(int(u), []).append(int(i))
    return d


def _degree_dict(*sets):
    d = {}
    for es in sets:
        for i in es.items:
            d[int(i)] = d.get(int(i), 0) + 1
    return d


def test_precision_recall_ndcg_parity(setup):
    ctx, rec, train, val, test = setup
    pos_dict = _pos_dict(test)
    p, r, f1, n = accurate_metrics(ctx, rec)
    want_p, want_r = ref.ref_precision_recall(pos_dict, rec, K)
    assert p == pytest.approx(want_p, abs=2e-5)
    assert r == pytest.approx(want_r, abs=2e-5)
    assert f1 == pytest.approx(ref.ref_f1(want_p, want_r), abs=2e-5)
    assert n == pytest.approx(ref.ref_ndcg(pos_dict, rec, K), abs=2e-5)


def test_f1_uses_rounded_inputs():
    """F1 must be computed from already-rounded P and R
    (metrics/accurate.py:46,56)."""
    p, r = 0.12345678, 0.2345678
    rp, rr = round(p, 5), round(r, 5)
    assert ref.ref_f1(rp, rr) == round(2 * rp * rr / (rp + rr), 5)


def test_hamming_parity(setup):
    ctx, rec, *_ = setup
    got = float(metrics_ops.hamming_distance(rec, I))
    want = ref.ref_hamming(rec, K)
    assert round(got, 5) == pytest.approx(want, abs=2e-5)


def test_internal_similarity_parity(setup):
    ctx, rec, train, val, test = setup
    got = float(metrics_ops.internal_similarity(rec, ctx.interaction, ctx.item_deg))
    want = ref.ref_internal_similarity(
        rec, _degree_dict(train, val), ctx.interaction, K
    )
    assert round(got, 5) == pytest.approx(want, abs=2e-5)


def test_diversity_wrapper(setup):
    ctx, rec, *_ = setup
    h, i = diversity_metrics(ctx, rec)
    assert 0.0 <= h <= 1.0
    assert i >= 0.0


def test_hamming_identical_lists_is_zero():
    rec = np.tile(np.arange(K, dtype=np.int32), (4, 1))
    assert float(metrics_ops.hamming_distance(rec, I)) == pytest.approx(0.0, abs=1e-6)


def test_hamming_disjoint_lists_is_one():
    rec = np.arange(4 * K, dtype=np.int32).reshape(4, K)
    assert float(metrics_ops.hamming_distance(rec, 4 * K)) == pytest.approx(
        1.0, abs=1e-6
    )
