"""Dual-product propagation kernel (ops/pallas/propagation.py).

Checks the fused (R @ X, R^T @ Y) kernel and its custom VJP against the XLA
dense path (which is itself parity-tested against the reference formulas in
test_propagation.py). Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgcnhs_tpu.ops.pallas.propagation import (
    dual_matmul,
    fits_vmem,
    lightgcn_propagate_pallas,
)
from lgcnhs_tpu.ops.propagation import lightgcn_propagate


@pytest.fixture
def problem():
    rng = np.random.default_rng(3)
    U, I, D = 97, 66, 8  # deliberately unaligned to exercise padding
    R = jnp.asarray(rng.standard_normal((U, I)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((I, D)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((U, D)), jnp.float32)
    return R, X, Y


def test_dual_matmul_matches_both_products(problem):
    R, X, Y = problem
    ou, oi = dual_matmul(R, X, Y, True)
    np.testing.assert_allclose(ou, R @ X, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(oi, R.T @ Y, rtol=1e-5, atol=1e-5)


def test_dual_matmul_vjp_matches_xla(problem):
    R, X, Y = problem

    def f_pallas(X, Y):
        ou, oi = dual_matmul(R, X, Y, True)
        return jnp.sum(ou**2) + jnp.sum(jnp.sin(oi))

    def f_xla(X, Y):
        return jnp.sum((R @ X) ** 2) + jnp.sum(jnp.sin(R.T @ Y))

    g_p = jax.grad(f_pallas, argnums=(0, 1))(X, Y)
    g_x = jax.grad(f_xla, argnums=(0, 1))(X, Y)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_propagate_pallas_matches_dense_path(problem):
    R, X, Y = problem
    eu, ei = Y, X
    a_u, a_i = lightgcn_propagate_pallas(eu, ei, R, 3, False, True)
    b_u, b_i = lightgcn_propagate(eu, ei, R, 3, False)
    np.testing.assert_allclose(a_u, b_u, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a_i, b_i, rtol=1e-4, atol=1e-4)


def test_propagate_pallas_bf16_tracks_f32(problem):
    R, X, Y = problem
    a_u, a_i = lightgcn_propagate_pallas(Y, X, R, 2, True, True)
    b_u, b_i = lightgcn_propagate(Y, X, R, 2, False)
    # bf16 inputs, f32 accumulation: error scales with the layer magnitudes,
    # so compare against the array scale rather than elementwise rtol
    np.testing.assert_allclose(a_u, b_u, atol=0.05 * float(np.abs(b_u).max()))
    np.testing.assert_allclose(a_i, b_i, atol=0.05 * float(np.abs(b_i).max()))


def test_fits_vmem_guard():
    assert fits_vmem(6040, 3706, 64)  # ML-1M scale
    assert fits_vmem(6040, 3706, 64, bf16=True)
    assert not fits_vmem(100_000, 400_000, 64)  # resident state >> VMEM


@pytest.fixture
def binary_problem():
    from lgcnhs_tpu.data.graph import (
        EdgeSet,
        binary_incidence_factors,
        normalized_bipartite,
    )

    rng = np.random.default_rng(9)
    U, I, D = 97, 66, 8
    eu = rng.integers(0, U, 700).astype(np.int32)
    ei = rng.integers(0, I, 700).astype(np.int32)
    es = EdgeSet(eu, ei)
    R_hat = jnp.asarray(normalized_bipartite(U, I, es))
    R8, du, di = binary_incidence_factors(U, I, es)
    X = jnp.asarray(rng.standard_normal((I, D)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((U, D)), jnp.float32)
    return R_hat, jnp.asarray(R8), jnp.asarray(du), jnp.asarray(di), X, Y


def test_binary_factors_reconstruct_r_hat(binary_problem):
    R_hat, R8, du, di, _, _ = binary_problem
    recon = du[:, None] * R8.astype(jnp.float32) * di[None, :]
    np.testing.assert_allclose(recon, R_hat, rtol=1e-6, atol=1e-7)


def test_dual_matmul_int8_matches_float(binary_problem):
    _, R8, _, _, X, Y = binary_problem
    ou, oi = dual_matmul(R8, X, Y, True)
    Rf = R8.astype(jnp.float32)
    np.testing.assert_allclose(ou, Rf @ X, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(oi, Rf.T @ Y, rtol=1e-5, atol=1e-5)


def test_propagate_binary_matches_dense_path(binary_problem):
    from lgcnhs_tpu.ops.pallas.propagation import lightgcn_propagate_pallas_binary

    R_hat, R8, du, di, X, Y = binary_problem
    a_u, a_i = lightgcn_propagate_pallas_binary(Y, X, R8, du, di, 3, False, True)
    b_u, b_i = lightgcn_propagate(Y, X, R_hat, 3, False)
    np.testing.assert_allclose(a_u, b_u, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a_i, b_i, rtol=1e-4, atol=1e-5)


def test_propagate_binary_grads_match_xla(binary_problem):
    from lgcnhs_tpu.ops.pallas.propagation import lightgcn_propagate_pallas_binary

    R_hat, R8, du, di, X, Y = binary_problem

    def f_binary(eu, ei):
        a_u, a_i = lightgcn_propagate_pallas_binary(eu, ei, R8, du, di, 2, False, True)
        return jnp.sum(a_u**2) + jnp.sum(jnp.sin(a_i))

    def f_xla(eu, ei):
        b_u, b_i = lightgcn_propagate(eu, ei, R_hat, 2, False)
        return jnp.sum(b_u**2) + jnp.sum(jnp.sin(b_i))

    g_b = jax.grad(f_binary, argnums=(0, 1))(Y, X)
    g_x = jax.grad(f_xla, argnums=(0, 1))(Y, X)
    for a, b in zip(g_b, g_x):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fits_vmem_binary():
    from lgcnhs_tpu.ops.pallas.propagation import fits_vmem_binary

    assert fits_vmem_binary(6040, 3706, 64)
    assert fits_vmem_binary(6040, 3706, 64, bf16=True)


def test_dual_matmul_rejects_mixed_dtypes():
    """Advisor r4 #1: a mixed-dtype call must raise instead of silently
    truncating the f32 operand under the DEFAULT-precision gate."""
    import jax.numpy as jnp
    import pytest

    from lgcnhs_tpu.ops.pallas.propagation import dual_matmul

    R = jnp.ones((8, 16), jnp.float32)
    Xb = jnp.ones((16, 8), jnp.bfloat16)
    Yb = jnp.ones((8, 8), jnp.bfloat16)
    with pytest.raises(ValueError, match="dtypes must agree"):
        dual_matmul(R, Xb, Yb, True)
    with pytest.raises(ValueError, match="dtypes must agree"):
        dual_matmul(R.astype(jnp.bfloat16), Xb, Yb.astype(jnp.float32), True)
