"""Blocked, user-factored, and sharded diffusion vs the dense path."""
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.diffusion import (
    blocked_diffusion_scores,
    choose_diffusion,
    diffusion_scores,
    diffusion_scores_auto,
    user_factored_diffusion_scores,
)
from lgcnhs_tpu.parallel.sharding import sharded_diffusion_scores
from lgcnhs_tpu.runtime.mesh import make_mesh


@pytest.fixture
def x64():
    import jax

    was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", was)


@pytest.fixture
def A():
    rng = np.random.default_rng(5)
    A = (rng.random((40, 128)) < 0.1).astype(np.float32)
    A[:, 7] = 0
    return A


@pytest.mark.parametrize("transpose_w", [False, True])
def test_blocked_matches_dense(A, transpose_w):
    lam = np.float32(0.6)
    dense = np.asarray(diffusion_scores(A, lam, transpose_w=transpose_w))
    blocked = np.asarray(
        blocked_diffusion_scores(A, lam, block=32, transpose_w=transpose_w)
    )
    np.testing.assert_allclose(blocked, dense, rtol=1e-5, atol=1e-6)


def test_blocked_falls_back_on_indivisible(A):
    lam = np.float32(0.3)
    dense = np.asarray(diffusion_scores(A, lam))
    blocked = np.asarray(blocked_diffusion_scores(A, lam, block=100))
    np.testing.assert_allclose(blocked, dense, rtol=1e-6)


@pytest.mark.parametrize("transpose_w", [False, True])
@pytest.mark.parametrize("lam", [0.0, 0.37, 1.0])
def test_user_factored_matches_dense(A, transpose_w, lam, x64):
    # f64 so the associativity reorder's rounding difference stays ~1e-12
    A64 = A.astype(np.float64)
    lam64 = np.float64(lam)
    dense = np.asarray(diffusion_scores(A64, lam64, transpose_w=transpose_w))
    fact = np.asarray(
        user_factored_diffusion_scores(A64, lam64, transpose_w=transpose_w)
    )
    np.testing.assert_allclose(fact, dense, rtol=1e-11, atol=1e-12)


def test_user_factored_zero_degree_user_and_item(A, x64):
    # zero-degree item column 7 comes from the fixture; add a zero-degree user
    A = A.copy()
    A[3, :] = 0
    A64 = A.astype(np.float64)
    dense = np.asarray(diffusion_scores(A64, np.float64(0.6)))
    fact = np.asarray(user_factored_diffusion_scores(A64, np.float64(0.6)))
    np.testing.assert_allclose(fact, dense, rtol=1e-11, atol=1e-12)
    assert np.all(fact[:, 7] == 0) and np.all(fact[3] == 0)


def test_choose_diffusion_regimes():
    # parity scales stay dense (ML-100K, ML-1M both fit the budget)
    assert choose_diffusion(943, 1682) == "dense"
    assert choose_diffusion(6040, 3706) == "dense"
    # over budget + tall catalog (2U < I) -> W-free factored path
    assert choose_diffusion(2000, 100_000) == "factored"
    # over budget but wide user base -> streamed blocks
    assert choose_diffusion(80_000, 100_000) == "blocked"


@pytest.mark.parametrize("regime", ["factored", "blocked"])
def test_auto_dispatch_matches_dense(A, regime, monkeypatch, x64):
    import lgcnhs_tpu.ops.diffusion as diff

    # shrink the budget so the 128-item fixture counts as "over budget"
    monkeypatch.setattr(diff, "DENSE_TRANSFER_BUDGET_BYTES", 1)
    U = 40 if regime == "factored" else 200
    rng = np.random.default_rng(9)
    Ar = (rng.random((U, 128)) < 0.1).astype(np.float64)
    assert diff.choose_diffusion(U, 128, 8, budget_bytes=1) == regime
    got = np.asarray(diffusion_scores_auto(Ar, np.float64(0.6), block=32))
    want = np.asarray(diffusion_scores(Ar, np.float64(0.6)))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_sharded_matches_dense(A):
    lam = 0.6
    mesh = make_mesh((1, 8))
    got = np.asarray(sharded_diffusion_scores(mesh, jnp.asarray(A), lam))
    want = np.asarray(diffusion_scores(A, np.float32(lam)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_keeps_output_sharded(A):
    mesh = make_mesh((1, 8))
    out = sharded_diffusion_scores(mesh, jnp.asarray(A), 0.5)
    from jax.sharding import PartitionSpec as P

    assert out.sharding.spec == P(None, "model")
