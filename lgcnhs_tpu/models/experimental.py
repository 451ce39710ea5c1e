"""Experimental model prototypes (reference ``waste/model/``).

The reference author explored three feature-autoencoder recommenders before
settling on LightGCN, kept as dead code (SURVEY.md section 2.10). They are provided
here as working, tested capabilities:

- ``GCNAutoencoder`` — 2-layer GCN over the joint user-item graph trained to
  reconstruct node features with MSE (``waste/model/GNN.py:20-199``: GCNConv
  stack, relu, Adam, MSE-to-input objective)
- ``GATAutoencoder`` — bipartite graph-attention autoencoder
  (``waste/model/HeteroGAT.py:21-224``: HeteroConv(GATConv) both directions)
- ``hybrid_gat_fusion`` — GAT scores fused with HybridS diffusion, the
  precursor of the LGCNHS fusion (``waste/model/HybridSHeteroGAT.py``)

TPU-native: dense joint/bipartite adjacency matmuls on the MXU, attention as
masked softmax over the incidence, one jitted train step.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class MLPGraphParams(NamedTuple):
    W1: jnp.ndarray
    b1: jnp.ndarray
    W2: jnp.ndarray
    b2: jnp.ndarray
    # attention vectors (GAT only; zeros for GCN)
    a1: jnp.ndarray
    a2: jnp.ndarray


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    scale = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale)


def init_autoencoder(
    key: jax.Array, feature_dim: int, hidden_dim: int
) -> MLPGraphParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return MLPGraphParams(
        W1=_glorot(k1, (feature_dim, hidden_dim)),
        b1=jnp.zeros(hidden_dim),
        W2=_glorot(k2, (hidden_dim, feature_dim)),
        b2=jnp.zeros(feature_dim),
        a1=_glorot(k3, (2 * hidden_dim, 1))[:, 0],
        a2=_glorot(k4, (2 * feature_dim, 1))[:, 0],
    )


def joint_normalized_adj(R: jnp.ndarray, self_loops: bool = True) -> jnp.ndarray:
    """(U+I)x(U+I) symmetric-normalized joint adjacency, self-loops included
    (torch-geometric GCNConv default, used by ``waste/model/GNN.py``)."""
    U, I = R.shape
    N = U + I
    A = jnp.zeros((N, N), R.dtype)
    A = A.at[:U, U:].set(R).at[U:, :U].set(R.T)
    if self_loops:
        A = A + jnp.eye(N, dtype=R.dtype)
    deg = jnp.sum(A, axis=1)
    inv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    return A * inv[:, None] * inv[None, :]


@jax.jit
def gcn_autoencoder_forward(
    params: MLPGraphParams, A_hat: jnp.ndarray, X: jnp.ndarray
) -> jnp.ndarray:
    """relu(A_hat X W1) -> A_hat H W2 (``waste/model/GNN.py:39-44``)."""
    H = jax.nn.relu(A_hat @ (X @ params.W1) + params.b1)
    return A_hat @ (H @ params.W2) + params.b2


def _gat_layer(x_dst, x_src, R_mask, W, b, a):
    """Single-head GAT message pass src->dst over a bipartite mask.
    Attention logits a^T [Wh_dst || Wh_src] with LeakyReLU, softmax over the
    dst row's neighbors (GATConv semantics)."""
    h_dst = x_dst @ W + b
    h_src = x_src @ W + b
    d = h_dst.shape[1]
    logits = (
        (h_dst @ a[:d])[:, None] + (h_src @ a[d:])[None, :]
    )
    logits = jax.nn.leaky_relu(logits, 0.2)
    logits = jnp.where(R_mask > 0, logits, -jnp.inf)
    # rows with no neighbors: softmax of all -inf -> nan; zero them
    att = jax.nn.softmax(logits, axis=1)
    att = jnp.where(jnp.isnan(att), 0.0, att)
    return att @ h_src


@jax.jit
def gat_autoencoder_forward(
    params: MLPGraphParams,
    R: jnp.ndarray,  # (U, I) 0/1 incidence
    Xu: jnp.ndarray,
    Xi: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two attention layers each direction, relu between — the HeteroConv
    GATConv stack of ``waste/model/HeteroGAT.py``."""
    Hu = jax.nn.relu(_gat_layer(Xu, Xi, R, params.W1, params.b1, params.a1))
    Hi = jax.nn.relu(_gat_layer(Xi, Xu, R.T, params.W1, params.b1, params.a1))
    Zu = _gat_layer(Hu, Hi, R, params.W2, params.b2, params.a2)
    Zi = _gat_layer(Hi, Hu, R.T, params.W2, params.b2, params.a2)
    return Zu, Zi


def train_autoencoder(
    R: np.ndarray,  # (U, I) interaction matrix
    Xu: np.ndarray,
    Xi: np.ndarray,
    hidden_dim: int = 64,
    lr: float = 1e-3,
    epochs: int = 100,
    seed: int = 42,
    kind: str = "gcn",
) -> Tuple[MLPGraphParams, list]:
    """MSE feature-reconstruction training (``waste/model/GNN.py:74-115``)."""
    if Xu.shape[1] != Xi.shape[1]:
        # joint graph needs one feature space; zero-pad the narrower side
        width = max(Xu.shape[1], Xi.shape[1])
        Xu = np.pad(Xu, ((0, 0), (0, width - Xu.shape[1])))
        Xi = np.pad(Xi, ((0, 0), (0, width - Xi.shape[1])))
    U, I = R.shape
    X = jnp.asarray(np.vstack([Xu, Xi]), jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    params = init_autoencoder(jax.random.PRNGKey(seed), X.shape[1], hidden_dim)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    if kind == "gcn":
        A_hat = joint_normalized_adj(R)

        def loss_fn(p):
            out = gcn_autoencoder_forward(p, A_hat, X)
            return jnp.mean((out - X) ** 2)

    elif kind == "gat":
        Xu_j, Xi_j = X[:U], X[U:]

        def loss_fn(p):
            Zu, Zi = gat_autoencoder_forward(p, R, Xu_j, Xi_j)
            return jnp.mean((Zu - Xu_j) ** 2) + jnp.mean((Zi - Xi_j) ** 2)

    else:
        raise ValueError(f"kind must be 'gcn' or 'gat', got {kind!r}")

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    history = []
    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state)
        history.append(float(loss))
    return params, history


def autoencoder_scores(
    params: MLPGraphParams, R: np.ndarray, Xu: np.ndarray, Xi: np.ndarray,
    kind: str = "gcn",
) -> jnp.ndarray:
    """User x item preference scores = dot of reconstructed node embeddings
    (``waste/model/GNN.py:118-160`` flavor)."""
    if Xu.shape[1] != Xi.shape[1]:
        width = max(Xu.shape[1], Xi.shape[1])
        Xu = np.pad(Xu, ((0, 0), (0, width - Xu.shape[1])))
        Xi = np.pad(Xi, ((0, 0), (0, width - Xi.shape[1])))
    U = Xu.shape[0]
    X = jnp.asarray(np.vstack([Xu, Xi]), jnp.float32)
    Rj = jnp.asarray(R, jnp.float32)
    if kind == "gcn":
        Z = gcn_autoencoder_forward(params, joint_normalized_adj(Rj), X)
        Zu, Zi = Z[:U], Z[U:]
    else:
        Zu, Zi = gat_autoencoder_forward(params, Rj, X[:U], X[U:])
    return jnp.dot(Zu, Zi.T, preferred_element_type=jnp.float32)


def hybrid_gat_fusion(
    params: MLPGraphParams, R: np.ndarray, Xu: np.ndarray, Xi: np.ndarray,
    lam: float,
) -> jnp.ndarray:
    """GAT preference scores Hadamard-fused with HybridS diffusion — the
    LGCNHS precursor (``waste/model/HybridSHeteroGAT.py``)."""
    from lgcnhs_tpu.ops.diffusion import diffusion_scores

    G = autoencoder_scores(params, R, Xu, Xi, kind="gat")
    F = diffusion_scores(jnp.asarray(R, jnp.float32), jnp.float32(lam))
    return G * F
