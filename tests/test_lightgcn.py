import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.data.graph import EdgeSet, normalized_bipartite, pos_bool_matrix
from lgcnhs_tpu.models.lightgcn import (
    bpr_loss,
    init_lightgcn,
    init_lightgcn_opti,
    layer0_scores,
    sample_bpr_batch,
)

U, I, D = 20, 30, 8


def test_init_statistics():
    params = init_lightgcn(jax.random.PRNGKey(0), 1000, 2000, 64)
    assert params.user_emb.shape == (1000, 64)
    assert params.item_emb.shape == (2000, 64)
    # N(0, 0.1^2) init (model/LightGCN/model.py:36-38)
    assert abs(float(jnp.std(params.user_emb)) - 0.1) < 0.005
    assert abs(float(jnp.mean(params.item_emb))) < 0.005


def test_init_opti_projects_features():
    uf = jnp.ones((U, 5))
    itf = jnp.ones((I, 7))
    params = init_lightgcn_opti(jax.random.PRNGKey(1), uf, itf, D)
    assert params.user_emb.shape == (U, D)
    assert params.item_emb.shape == (I, D)
    # identical feature rows must project to identical embeddings
    np.testing.assert_allclose(
        np.asarray(params.user_emb[0]), np.asarray(params.user_emb[1]), rtol=1e-6
    )


def test_bpr_loss_matches_reference_form():
    """Sign-flipped softplus + epsilon-scaled L2 of layer-0 slices
    (model/LightGCN/loss.py:29-42)."""
    rng = np.random.default_rng(0)
    uf, u0, pf, p0, nf, n0 = (
        rng.standard_normal((16, D)).astype(np.float32) for _ in range(6)
    )
    eps = 1e-4
    got = float(bpr_loss(uf, u0, pf, p0, nf, n0, eps))
    pos = (uf * pf).sum(-1)
    neg = (uf * nf).sum(-1)
    want = -np.mean(np.log1p(np.exp(pos - neg))) + eps * (
        (u0**2).sum() + (p0**2).sum() + (n0**2).sum()
    )
    assert got == pytest.approx(want, rel=1e-4)


def test_sample_bpr_batch_negatives_are_true_negatives():
    rng = np.random.default_rng(4)
    eu = rng.integers(0, U, 100).astype(np.int32)
    ei = rng.integers(0, I, 100).astype(np.int32)
    pos = pos_bool_matrix(U, I, EdgeSet(eu, ei))
    users, pos_items, negs = sample_bpr_batch(
        jax.random.PRNGKey(7), jnp.asarray(eu), jnp.asarray(ei), jnp.asarray(pos), 256, I
    )
    users, pos_items, negs = map(np.asarray, (users, pos_items, negs))
    # every (user, pos) pair is a real edge
    assert pos[users, pos_items].all()
    # negatives never collide with the user's positives
    assert not pos[users, negs].any()


def test_sample_bpr_batch_deterministic_per_key():
    rng = np.random.default_rng(4)
    eu = jnp.asarray(rng.integers(0, U, 50).astype(np.int32))
    ei = jnp.asarray(rng.integers(0, I, 50).astype(np.int32))
    pos = jnp.asarray(pos_bool_matrix(U, I, EdgeSet(np.asarray(eu), np.asarray(ei))))
    a = sample_bpr_batch(jax.random.PRNGKey(1), eu, ei, pos, 64, I)
    b = sample_bpr_batch(jax.random.PRNGKey(1), eu, ei, pos, 64, I)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_layer0_scores_shape_and_value():
    params = init_lightgcn(jax.random.PRNGKey(2), U, I, D)
    s = np.asarray(layer0_scores(params))
    want = np.asarray(params.user_emb) @ np.asarray(params.item_emb).T
    np.testing.assert_allclose(s, want, rtol=1e-5, atol=1e-6)
