import numpy as np
import pytest

from lgcnhs_tpu.ops import diffusion
from tests import reference_formulas as ref


@pytest.fixture
def A():
    rng = np.random.default_rng(0)
    A = (rng.random((23, 37)) < 0.15).astype(np.float32)
    A[:, 5] = 0  # zero-degree item
    A[7, :] = 0  # zero-degree user
    return A


def test_general_spreading_matrix(A):
    got = np.asarray(diffusion.general_spreading_matrix(A))
    want = ref.ref_general_w(A.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_probs_heats(A):
    W_gen = ref.ref_general_w(A.astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(diffusion.probs_transfer(A, W_gen.astype(np.float32))),
        ref.ref_probs(A, W_gen),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(diffusion.heats_transfer(A, W_gen.astype(np.float32))),
        ref.ref_heats(A, W_gen),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("lam", [0.0, 0.3, 0.6, 1.0])
def test_hybrid_matches_reference(A, lam):
    W_gen = ref.ref_general_w(A.astype(np.float64))
    got = np.asarray(diffusion.hybrid_transfer(A, W_gen.astype(np.float32), lam))
    want = ref.ref_hybrid(A, W_gen, lam)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hybrid_degenerates_to_probs_heats(A):
    """HybridS(1) == ProbS, HybridS(0) == HeatS (const.py:116,122 semantics)."""
    W_gen = np.asarray(diffusion.general_spreading_matrix(A))
    np.testing.assert_allclose(
        np.asarray(diffusion.hybrid_transfer(A, W_gen, 1.0)),
        np.asarray(diffusion.probs_transfer(A, W_gen)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(diffusion.hybrid_transfer(A, W_gen, 0.0)),
        np.asarray(diffusion.heats_transfer(A, W_gen)),
        rtol=1e-6,
    )


def test_fused_resource_pipeline(A):
    lam = 0.4
    W_gen = ref.ref_general_w(A.astype(np.float64))
    want = ref.ref_resource(A, ref.ref_hybrid(A, W_gen, lam))
    got = np.asarray(diffusion.diffusion_scores(A, np.float32(lam)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transpose_quirk(A):
    """transpose_w reproduces the ProbS-movielens / HeatS-douban overrides
    (model/SpreadMethod/recommend.py:88-101)."""
    lam = 0.01
    W_gen = ref.ref_general_w(A.astype(np.float64)).T
    want = ref.ref_resource(A, ref.ref_hybrid(A, W_gen, lam))
    got = np.asarray(diffusion.diffusion_scores(A, np.float32(lam), transpose_w=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
