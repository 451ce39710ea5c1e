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
def user_factored_diffusion_scores(
    A: jnp.ndarray, lam: jnp.ndarray, transpose_w: bool = False
) -> jnp.ndarray:
    """F = A . HybridS(W_gen, lam) with NO item x item intermediate at all.

    The HybridS blend is a diagonal congruence, W = D1 W_gen D2 with
    D1 = diag(k_item^-(1-lam)) and D2 = diag(k_item^-lam)
    (``model/SpreadMethod/model.py:63-85``), and W_gen = An^T A
    (``model.py:14-27``), so by associativity

        F = A W = (A D1 . An^T) . (A D2)              -- this op
        F = A (D1 W_gen^T D2) = (A D1 . A^T) . (An D2)  -- transpose quirk

    The only large intermediate is the (U, U) user-similarity product:
    2 U^2 I MXU FLOPs vs U I^2 for any W-materializing path, and O(U^2 + U I)
    memory vs O(I^2) — strictly better whenever 2U < I (tall catalogs, e.g.
    Douban's quantile band keeps few users against the full movie catalog,
    ``const.py:233-236``). Bitwise it differs from ``diffusion_scores`` only
    in float summation order; ``diffusion_scores_auto`` therefore selects it
    only in the regime where the dense path cannot run at all.

    Per-factor zero-degree clamping is exact: the reference clamps the
    PRODUCT alpha_i*beta_j (``model.py:83-84``), but a zero-degree item has
    an identically zero W_gen row and column (its A column is zero), so
    W's entries are 0 under either clamping.
    """
    k_user = jnp.sum(A, axis=1)
    k_user = jnp.where(k_user == 0, 1.0, k_user)
    An = A / k_user[:, None]

    k_item = jnp.sum(A, axis=0)
    alpha = jnp.power(k_item, 1.0 - lam)  # W row scaling
    beta = jnp.power(k_item, lam)  # W column scaling
    a_inv = 1.0 / jnp.where(alpha == 0, 1.0, alpha)
    b_inv = 1.0 / jnp.where(beta == 0, 1.0, beta)

    hi = jax.lax.Precision.HIGHEST
    if transpose_w:
        left, right = A * a_inv[None, :], An * b_inv[None, :]
        M = jnp.dot(left, A.T, precision=hi, preferred_element_type=A.dtype)
    else:
        left, right = A * a_inv[None, :], A * b_inv[None, :]
        M = jnp.dot(left, An.T, precision=hi, preferred_element_type=A.dtype)
    return jnp.dot(M, right, precision=hi, preferred_element_type=A.dtype)


# One (I, I) array this large and the dense transfer-matrix path stops being
# viable on a single chip (v5e: 16 GB HBM; 4 GB mirrors the trainer's
# choose_propagation densify bound, train/trainer.py).
DENSE_TRANSFER_BUDGET_BYTES = int(4e9)


def choose_diffusion(
    n_users: int,
    n_items: int,
    itemsize: int = 4,
    budget_bytes: int | None = None,
) -> str:
    """Dispatch rule for ``diffusion_scores_auto``, budgeting EVERY layout's
    full live set — not just the (I, I) operator (round-3 verdict: the old
    rule could pick "factored" into a (U, U)+(U, I) footprint larger than
    the (I, I) it was avoiding):

    - "dense" (the parity path, bit-identical to the reference's operation
      order): peak ~ 2 (I, I) [W_gen + the scaled W] + 3 (U, I) [A, An, F]
    - "factored" (tall catalogs, 2U < I): peak ~ 1 (U, U) + 3 (U, I)
      [the scaled A copies and F; no I^2 anywhere]
    - "blocked" (streams W in (I, block) column blocks): peak ~ 3 (U, I)
    - "sharded": nothing single-chip fits — even three (U, I) arrays blow
      the budget; callers must go to ``parallel.sharding.
      sharded_diffusion_scores`` / the item-sharded sweep on a mesh.

    ``budget_bytes=None`` reads ``DENSE_TRANSFER_BUDGET_BYTES`` at call
    time."""
    if budget_bytes is None:
        budget_bytes = DENSE_TRANSFER_BUDGET_BYTES
    ui = n_users * n_items * itemsize
    ii = n_items * n_items * itemsize
    if 2 * ii + 3 * ui <= budget_bytes:
        return "dense"
    if 2 * n_users < n_items and factored_fits(
        n_users, n_items, itemsize, budget_bytes
    ):
        return "factored"
    if 3 * ui <= budget_bytes:
        return "blocked"
    return "sharded"


def factored_fits(
    n_users: int,
    n_items: int,
    itemsize: int = 4,
    budget_bytes: int | None = None,
) -> bool:
    """True when the W-free factored path's live set (the (U, U) product +
    ~3 (U, I)-class arrays) fits the budget. This is the MEMORY gate alone:
    the algorithm is exact for ANY shape (``user_factored_diffusion_scores``
    is algebra, not approximation) — ``choose_diffusion`` additionally
    applies the 2U < I FLOPs heuristic, but callers that have no other
    single-chip option (e.g. the tall lambda sweep on wide-ish catalogs)
    may run it whenever this gate passes."""
    if budget_bytes is None:
        budget_bytes = DENSE_TRANSFER_BUDGET_BYTES
    return (n_users * n_users + 3 * n_users * n_items) * itemsize <= budget_bytes


def diffusion_scores_auto(
    A: jnp.ndarray, lam: jnp.ndarray, transpose_w: bool = False, block: int = 512
) -> jnp.ndarray:
    """Size-dispatching diffusion scoring: exactly ``diffusion_scores`` in
    the regime every parity test runs in, and the best W-free algorithm
    (``user_factored_diffusion_scores`` / ``blocked_diffusion_scores``) once
    the catalog outgrows a materialized (I, I) transfer matrix. Raises (with
    the mesh route) rather than tracing a guaranteed-OOM program when no
    single-chip layout fits the budget."""
    choice = choose_diffusion(
        A.shape[0], A.shape[1], jnp.asarray(A).dtype.itemsize
    )
    if choice == "dense":
        return diffusion_scores(A, lam, transpose_w=transpose_w)
    if choice == "factored":
        return user_factored_diffusion_scores(A, lam, transpose_w=transpose_w)
    if choice == "blocked":
        return blocked_diffusion_scores(A, lam, block=block, transpose_w=transpose_w)
    raise ValueError(
        f"diffusion at U={A.shape[0]} x I={A.shape[1]} "
        f"({jnp.asarray(A).dtype}) exceeds the single-chip budget "
        f"({DENSE_TRANSFER_BUDGET_BYTES / 1e9:.1f} GB) in every layout — "
        "even the streamed one needs three (U, I)-class arrays resident. "
        "Run on a mesh (parallel.sharding.sharded_diffusion_scores / "
        "cli.find_lambda --mesh), or raise "
        "ops.diffusion.DENSE_TRANSFER_BUDGET_BYTES if the chip's HBM "
        "genuinely fits the footprint."
    )


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
