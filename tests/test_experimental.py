"""Experimental autoencoder prototypes (reference waste/model parity)."""
import numpy as np
import pytest

from lgcnhs_tpu.models.experimental import (
    autoencoder_scores,
    hybrid_gat_fusion,
    train_autoencoder,
)

U, I, FU, FI = 20, 30, 10, 14


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(2)
    R = (rng.random((U, I)) < 0.2).astype(np.float32)
    Xu = rng.standard_normal((U, FU)).astype(np.float32)
    Xi = rng.standard_normal((I, FI)).astype(np.float32)
    return R, Xu, Xi


@pytest.mark.parametrize("kind", ["gcn", "gat"])
def test_autoencoder_training_reduces_mse(problem, kind):
    R, Xu, Xi = problem
    params, history = train_autoencoder(
        R, Xu, Xi, hidden_dim=16, epochs=150, lr=1e-2, kind=kind
    )
    assert np.isfinite(history).all()
    assert history[-1] < history[0] * 0.9


@pytest.mark.parametrize("kind", ["gcn", "gat"])
def test_scores_shape_finite(problem, kind):
    R, Xu, Xi = problem
    params, _ = train_autoencoder(R, Xu, Xi, hidden_dim=16, epochs=5, kind=kind)
    scores = np.asarray(autoencoder_scores(params, R, Xu, Xi, kind=kind))
    assert scores.shape == (U, I)
    assert np.isfinite(scores).all()


def test_hybrid_gat_fusion(problem):
    R, Xu, Xi = problem
    params, _ = train_autoencoder(R, Xu, Xi, hidden_dim=16, epochs=5, kind="gat")
    fused = np.asarray(hybrid_gat_fusion(params, R, Xu, Xi, lam=0.5))
    assert fused.shape == (U, I)
    assert np.isfinite(fused).all()


def test_unknown_kind_raises(problem):
    R, Xu, Xi = problem
    with pytest.raises(ValueError, match="kind"):
        train_autoencoder(R, Xu, Xi, kind="bogus")
