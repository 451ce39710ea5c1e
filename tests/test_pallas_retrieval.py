"""Fused retrieval kernel vs the reference masked-topk semantics.

Runs in Pallas interpret mode on CPU; the same kernel compiles via Mosaic on
real TPU (exercised by bench.py / the driver).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.pallas.retrieval import fused_topk_retrieval
from lgcnhs_tpu.ops.topk import masked_topk

U, I, D = 50, 300, 16


@pytest.fixture
def problem():
    rng = np.random.default_rng(17)
    ue = rng.standard_normal((U, D)).astype(np.float32)
    ie = rng.standard_normal((I, D)).astype(np.float32)
    seen = rng.random((U, I)) < 0.3
    return jnp.asarray(ue), jnp.asarray(ie), jnp.asarray(seen)


@pytest.mark.parametrize("k", [1, 10])
def test_matches_masked_topk(problem, k):
    ue, ie, seen = problem
    idx, vals = fused_topk_retrieval(ue, ie, seen, k, interpret=True)
    scores = ue @ ie.T
    want = np.asarray(masked_topk(scores, seen, k))
    np.testing.assert_array_equal(np.asarray(idx), want)
    # values are the actual masked scores at those indices
    masked = np.where(np.asarray(seen), -1024.0, np.asarray(scores))
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(masked, want, axis=1),
        rtol=1e-5,
        atol=1e-5,
    )


def test_padded_items_never_recommended(problem):
    ue, ie, seen = problem
    idx, _ = fused_topk_retrieval(ue, ie, seen, 10, interpret=True)
    assert (np.asarray(idx) < I).all()


def test_tie_break_lowest_index():
    ue = jnp.ones((4, 8), jnp.float32)
    ie = jnp.ones((20, 8), jnp.float32)  # all scores equal
    seen = jnp.zeros((4, 20), bool)
    idx, _ = fused_topk_retrieval(ue, ie, seen, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.tile(np.arange(5), (4, 1)))
