"""Blocked and sharded diffusion vs the dense single-device path."""
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.diffusion import blocked_diffusion_scores, diffusion_scores
from lgcnhs_tpu.parallel.sharding import sharded_diffusion_scores
from lgcnhs_tpu.runtime.mesh import make_mesh


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
