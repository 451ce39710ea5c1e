"""Resource-diffusion operators (ProbS / HeatS / HybridS).

TPU re-design of ``model/SpreadMethod/model.py:14-99``. The reference computes
dense numpy float64 matmuls on host; here every operator is a jit-compiled XLA
program: the two diffusion passes are chained MXU matmuls and the degree
normalizations are elementwise ops XLA fuses into them. Math is identical:

  W_gen = (A^T / k_user) . A                      (model.py:14-27)
  ProbS:   W = W_gen / k_item[col]                (model.py:30-43)
  HeatS:   W = W_gen / k_item[row]                (model.py:46-60)
  HybridS: W = W_gen / (k_i^(1-l) (x) k_j^l)      (model.py:63-85)
  F = A . W                                       (model.py:88-99)

Zero degrees are clamped to 1 exactly as the reference does. ``0**0 == 1``
under jnp.power matches numpy, so HybridS(l=0/1) degenerates to HeatS/ProbS
identically.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def general_spreading_matrix(A: jnp.ndarray) -> jnp.ndarray:
    """W_gen = (A^T / k_user) . A — item-item transfer mass after user-side
    normalization (``model/SpreadMethod/model.py:14-27``)."""
    k_user = jnp.sum(A, axis=1)
    k_user = jnp.where(k_user == 0, 1.0, k_user)
    An = A / k_user[:, None]
    return jnp.dot(An.T, A, precision=jax.lax.Precision.HIGHEST, preferred_element_type=A.dtype)


@jax.jit
def probs_transfer(A: jnp.ndarray, W_gen: jnp.ndarray) -> jnp.ndarray:
    """Column-normalized mass-conserving spreading
    (``model/SpreadMethod/model.py:30-43``)."""
    k_item = jnp.sum(A, axis=0)
    k_item = jnp.where(k_item == 0, 1.0, k_item)
    return W_gen / k_item[None, :]


@jax.jit
def heats_transfer(A: jnp.ndarray, W_gen: jnp.ndarray) -> jnp.ndarray:
    """Row-normalized heat diffusion (``model/SpreadMethod/model.py:46-60``)."""
    k_item = jnp.sum(A, axis=0)
    k_item = jnp.where(k_item == 0, 1.0, k_item)
    return W_gen / k_item[:, None]


@jax.jit
def hybrid_transfer(A: jnp.ndarray, W_gen: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Outer-product degree blend: W = W_gen / (k_i^(1-l) (x) k_j^l); l=1 is
    ProbS, l=0 is HeatS (``model/SpreadMethod/model.py:63-85``)."""
    k_item = jnp.sum(A, axis=0)
    alpha = jnp.power(k_item, 1.0 - lam)
    beta = jnp.power(k_item, lam)
    denom = alpha[:, None] * beta[None, :]
    denom = jnp.where(denom == 0, 1.0, denom)
    return W_gen / denom


@jax.jit
def resource(A: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """Second diffusion pass F = A . W (``model/SpreadMethod/model.py:88-99``).
    Row u is user u's resource vector over the catalog."""
    return jnp.dot(A, W, precision=jax.lax.Precision.HIGHEST, preferred_element_type=A.dtype)


@jax.jit
def hybrid_resource(A: jnp.ndarray, W_gen: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Fused F = A . HybridS(A, W_gen, l) — the reference's
    ``getHybridSResourceMat`` (``model/SpreadLightGCN/model.py:106-120``) as a
    single XLA program (normalize fuses into the matmul epilogue)."""
    return resource(A, hybrid_transfer(A, W_gen, lam))


@partial(jax.jit, static_argnames=("block", "transpose_w"))
def blocked_diffusion_scores(
    A: jnp.ndarray, lam: jnp.ndarray, block: int = 512, transpose_w: bool = False
) -> jnp.ndarray:
    """F = A . HybridS(W_gen) computed by ITEM-COLUMN BLOCKS so the (I, I)
    transfer matrix never materializes.

    The reference (and the plain ``diffusion_scores``) builds W as a dense
    I x I array (``model/SpreadMethod/model.py:83``) — 40 GB at I=100k. Here
    each block j computes T_j = An^T A[:, j] (I x B), scales it by the degree
    blend, and immediately contracts F[:, j] = A T_j; peak extra memory is one
    I x B block. Wall-clock FLOPs are identical (two chained matmuls), so the
    MXU stays busy; XLA pipelines the lax.map over blocks.
    """
    U, I = A.shape
    if I % block != 0:
        # fall back to the dense path rather than padding the item axis
        # (padding would change degree vectors)
        return diffusion_scores(A, lam, transpose_w=transpose_w)

    k_user = jnp.sum(A, axis=1)
    k_user = jnp.where(k_user == 0, 1.0, k_user)
    An = A / k_user[:, None]

    k_item = jnp.sum(A, axis=0)
    alpha = jnp.power(k_item, 1.0 - lam)  # row scaling of W
    beta = jnp.power(k_item, lam)  # column scaling of W

    def one_block(j):
        cols = jax.lax.dynamic_slice_in_dim(A, j * block, block, axis=1)
        if transpose_w:
            # W_gen^T[:, j] = (An^T A)^T[:, j] = A^T An[:, j]
            An_cols = jax.lax.dynamic_slice_in_dim(An, j * block, block, axis=1)
            T = jnp.dot(A.T, An_cols, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=A.dtype)
        else:
            T = jnp.dot(An.T, cols, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=A.dtype)
        beta_j = jax.lax.dynamic_slice_in_dim(beta, j * block, block)
        denom = alpha[:, None] * beta_j[None, :]
        T = T / jnp.where(denom == 0, 1.0, denom)
        return jnp.dot(A, T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=A.dtype)

    blocks = jax.lax.map(one_block, jnp.arange(I // block))  # (I/B, U, B)
    return jnp.transpose(blocks, (1, 0, 2)).reshape(U, I)


@partial(jax.jit, static_argnames=("transpose_w",))
def diffusion_scores(
    A: jnp.ndarray, lam: jnp.ndarray, transpose_w: bool = False
) -> jnp.ndarray:
    """End-to-end diffusion scoring from the raw interaction matrix.

    ``transpose_w`` reproduces the reference's dataset-specific overrides that
    transpose W_gen before blending (ProbS-on-movielens -> l=0.01 transposed,
    HeatS-on-douban -> l=0.99 transposed;
    ``model/SpreadMethod/recommend.py:87-105``).
    """
    W_gen = general_spreading_matrix(A)
    if transpose_w:
        W_gen = W_gen.T
    return hybrid_resource(A, W_gen, lam)
