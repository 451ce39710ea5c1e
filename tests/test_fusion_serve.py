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
