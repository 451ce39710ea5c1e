"""LightGCN as a functional JAX model.

Re-design of ``model/LightGCN/model.py`` + ``loss.py``. State is a pytree of
two embedding tables; the forward is the factorized bipartite propagation from
``ops/propagation.py``; sampling and loss are pure functions of a PRNG key so
the whole train step jits (and shards) as one XLA program.

Faithfulness notes (SURVEY.md section 7 "hard parts"):
- init N(0, 0.1^2) (``model.py:36-38``) — jax.random stream, so weights differ
  from torch's RNG; parity bar is "within run-to-run variance".
- BPR keeps the reference's exact sign-flipped form
  ``-mean(softplus(pos - neg))`` (``loss.py:39``), NOT canonical
  ``mean(softplus(neg - pos))``; gradient saturates at -sigma(pos-neg),
  reproducing the reference's training dynamics.
- L2 term: epsilon * (||u0||^2 + ||p0||^2 + ||n0||^2) over the BATCH slices of
  the LAYER-0 tables (``loss.py:29``).
- negative sampling: one uniform negative per sampled edge, rejected against
  the user's true positives (torch-geometric ``structured_negative_sampling``
  semantics, ``loss.py:58``), minibatch drawn with replacement
  (``loss.py:64``).
- recommendation-time scoring uses LAYER-0 embeddings, not the propagated
  means (``model/LightGCN/evaluation.py:31-34``, ``recommend.py:83-86``) —
  quirky but load-bearing for parity.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LightGCNParams(NamedTuple):
    user_emb: jnp.ndarray  # (U, D) e_u^0
    item_emb: jnp.ndarray  # (I, D) e_i^0


def init_lightgcn(
    key: jax.Array,
    n_users: int,
    n_items: int,
    embedding_dim: int = 64,
    dtype=jnp.float32,
) -> LightGCNParams:
    """N(0, 0.1^2) init (``model/LightGCN/model.py:32-38``)."""
    ku, ki = jax.random.split(key)
    return LightGCNParams(
        user_emb=(0.1 * jax.random.normal(ku, (n_users, embedding_dim))).astype(dtype),
        item_emb=(0.1 * jax.random.normal(ki, (n_items, embedding_dim))).astype(dtype),
    )


def init_lightgcn_opti(
    key: jax.Array,
    user_features: jnp.ndarray,  # (U, Fu)
    item_features: jnp.ndarray,  # (I, Fi)
    embedding_dim: int = 64,
    dtype=jnp.float32,
) -> LightGCNParams:
    """Feature-projection init — the LightGCNOpti delta
    (``model/LightGCNOpti/model.py:35-49``): a one-shot dense projection of
    the side features seeds the tables. In the reference the projection
    layers are re-leafed by ``nn.Parameter(...)`` and never receive gradients,
    i.e. they are a random projection applied once at init; we implement
    exactly that (random W, b like torch Linear default init) without
    registering dead parameters."""
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def torch_linear(kw, kb, x):
        fan_in = x.shape[1]
        bound = 1.0 / jnp.sqrt(fan_in)
        W = jax.random.uniform(kw, (fan_in, embedding_dim), minval=-bound, maxval=bound)
        b = jax.random.uniform(kb, (embedding_dim,), minval=-bound, maxval=bound)
        return x @ W + b

    return LightGCNParams(
        user_emb=torch_linear(k1, k2, user_features).astype(dtype),
        item_emb=torch_linear(k3, k4, item_features).astype(dtype),
    )


@partial(jax.jit, static_argnames=("n_layers",))
def lightgcn_forward(
    params: LightGCNParams, R_hat: jnp.ndarray, n_layers: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(e_u^final, e_i^final): mean over propagation layers 0..K
    (``model/LightGCN/model.py:40-74``)."""
    from lgcnhs_tpu.ops.propagation import lightgcn_propagate

    return lightgcn_propagate(params.user_emb, params.item_emb, R_hat, n_layers)


def bpr_loss(
    users_final: jnp.ndarray,
    users_0: jnp.ndarray,
    pos_final: jnp.ndarray,
    pos_0: jnp.ndarray,
    neg_final: jnp.ndarray,
    neg_0: jnp.ndarray,
    epsilon: float,
) -> jnp.ndarray:
    """Reference BPR (``model/LightGCN/loss.py:12-44``), sign flip included."""
    reg = epsilon * (
        jnp.sum(users_0 * users_0) + jnp.sum(pos_0 * pos_0) + jnp.sum(neg_0 * neg_0)
    )
    pos_scores = jnp.sum(users_final * pos_final, axis=-1)
    neg_scores = jnp.sum(users_final * neg_final, axis=-1)
    bpr = -jnp.mean(jax.nn.softplus(pos_scores - neg_scores))
    return bpr + reg


@partial(jax.jit, static_argnames=("batch_size", "n_items", "n_retries"))
def sample_bpr_batch(
    key: jax.Array,
    edge_users: jnp.ndarray,  # (E,)
    edge_items: jnp.ndarray,  # (E,)
    pos_mask: jnp.ndarray,  # (U, I) bool — true positives for rejection
    batch_size: int,
    n_items: int,
    n_retries: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(users, pos_items, neg_items) triples.

    Uniform edges with replacement (``loss.py:64``) + per-edge uniform
    negatives rejected against the user's positives (structured negative
    sampling, ``loss.py:58``).

    All ``n_retries`` candidate rounds are drawn and membership-tested in ONE
    gather (no sequential rejection loop — profiled 2.2 ms -> <1 ms at ML-1M
    scale); each sample takes its first non-colliding candidate. At density
    rho the residual collision probability is rho^n_retries (~1e-12 at
    ML-100K densities), matching the reference's loop-until-clean guarantee
    to numerical noise.
    """
    k_edge, k_neg = jax.random.split(key)
    n_edges = edge_users.shape[0]
    idx = jax.random.randint(k_edge, (batch_size,), 0, n_edges)
    users = edge_users[idx]
    pos_items = edge_items[idx]

    cands = jax.random.randint(k_neg, (n_retries, batch_size), 0, n_items)
    # gather each batch user's positive ROW once, then index candidates
    # within the rows — a contiguous (B, I) row gather + small
    # take_along_axis, much cheaper on TPU than 2D scattered-element gather
    pos_rows = pos_mask[users]  # (B, I)
    collide = jnp.take_along_axis(pos_rows, cands.T, axis=1).T  # (R, B)
    first_ok = jnp.argmax(~collide, axis=0)  # first non-colliding round
    negs = jnp.take_along_axis(cands, first_ok[None, :], axis=0)[0]
    return users, pos_items, negs


@partial(jax.jit, static_argnames=("n_items", "n_retries", "reject_user_ids"))
def sample_negatives_for_edges(
    key: jax.Array,
    edge_users: jnp.ndarray,  # (E,)
    edge_items: jnp.ndarray,  # (E,)
    pos_mask: jnp.ndarray,  # (U, I) bool — this split's positives, for rejection
    n_items: int,
    n_retries: int = 8,
    reject_user_ids: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(users, pos_items, neg_items) covering EVERY edge exactly once, in
    edge order, with one rejected negative per edge.

    This is the reference's ``calValLoss`` sampling
    (``model/LightGCN/evaluation.py:68-77``): ``structured_negative_sampling``
    enumerates the full edge list — there is NO minibatch resample — and
    draws one uniform candidate per edge, rejected against that split's
    positive pairs. Distinct from ``sample_bpr_batch``, which first draws
    ``batch_size`` edges with replacement (``loss.py:64``).

    Rejection uses the same one-shot ``n_retries``-round candidate draw as
    ``sample_bpr_batch`` (residual collision probability rho^n_retries).
    Known deviation (docs/PARITY.md "Known deviations"): candidates are drawn
    from ``[0, n_items)`` whereas torch-geometric's range is bounded by the
    max node id present in the split's edge matrix (``loss.py:58`` /
    ``evaluation.py:71-72``).

    ``reject_user_ids=True`` additionally rejects candidates whose item id
    EQUALS the edge's user id — ``calValLoss`` passes
    ``contains_neg_self_loops=False`` (``evaluation.py:71``), which in the
    bipartite r_mat id space forbids exactly that value coincidence (the
    train-side ``sampleMiniBatch`` uses the default True and has no such
    rejection). Only the ``hparams.neg_range='reference'`` wiring sets it.
    """
    E = edge_users.shape[0]
    cands = jax.random.randint(key, (n_retries, E), 0, n_items)
    pos_rows = pos_mask[edge_users]  # (E, I)
    collide = jnp.take_along_axis(pos_rows, cands.T, axis=1).T  # (R, E)
    if reject_user_ids:
        collide = collide | (cands == edge_users[None, :])
    first_ok = jnp.argmax(~collide, axis=0)
    negs = jnp.take_along_axis(cands, first_ok[None, :], axis=0)[0]
    return edge_users, edge_items, negs


@jax.jit
def layer0_scores(params: LightGCNParams) -> jnp.ndarray:
    """Full preference matrix from the LAYER-0 tables — the reference's
    recommendation scoring (``model/LightGCN/evaluation.py:31-34``)."""
    return jnp.dot(
        params.user_emb, params.item_emb.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=params.user_emb.dtype
    )
