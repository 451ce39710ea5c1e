"""TPU-native Word2Vec (skip-gram with negative sampling) in JAX.

The reference trains a fresh gensim Word2Vec per text column (window 5,
min_count 1) and mean-pools token vectors per document
(``processing/handleFeature.py:206-238``). gensim is a CPU C/cython codepath
and is not available in this image; this module supplies the same capability
as a JAX program: the whole training run — pair batching, unigram^0.75
negative sampling, SGNS loss, Adam with linear LR decay — is one jitted
``lax.scan`` so it runs on TPU (or CPU) without host round-trips per step.

Matches word2vec semantics rather than gensim's exact RNG:
- reduced-window sampling: each center position draws b ~ U[1, window] and
  uses contexts within b (what gensim does, ``word2vec.c`` lineage)
- negative-sampling distribution: unigram counts ** 0.75
- input matrix init U(-0.5/dim, 0.5/dim), output matrix zeros
- learning rate decays linearly from ``lr`` to ``min_lr`` over all steps
  (optimizer is Adam, not per-pair SGD — see comment in ``train_word2vec``)
- document vector = mean of its tokens' INPUT vectors (gensim ``model.wv``)
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np


class Word2VecModel(NamedTuple):
    """Trained token vectors: ``vocab`` maps token -> row of ``vectors``."""

    vocab: Dict[str, int]
    vectors: np.ndarray  # (V, dim) float32 input-side vectors


def build_vocab(
    token_docs: Sequence[Sequence[str]], min_count: int = 1
) -> Tuple[Dict[str, int], np.ndarray]:
    """Vocabulary in descending-frequency order plus the count vector."""
    counts: Dict[str, int] = {}
    for doc in token_docs:
        for t in doc:
            counts[t] = counts.get(t, 0) + 1
    items = sorted(
        ((t, c) for t, c in counts.items() if c >= min_count),
        key=lambda tc: (-tc[1], tc[0]),
    )
    vocab = {t: i for i, (t, _) in enumerate(items)}
    freq = np.array([c for _, c in items], dtype=np.float64)
    return vocab, freq


def _skipgram_pairs(
    token_docs: Sequence[Sequence[str]],
    vocab: Dict[str, int],
    window: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """(center, context) id pairs with per-position reduced windows."""
    centers: List[int] = []
    contexts: List[int] = []
    for doc in token_docs:
        ids = [vocab[t] for t in doc if t in vocab]
        n = len(ids)
        if n < 2:
            continue
        b = rng.integers(1, window + 1, size=n)
        for i in range(n):
            lo = max(0, i - int(b[i]))
            hi = min(n, i + int(b[i]) + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(ids[i])
                    contexts.append(ids[j])
    return (
        np.asarray(centers, dtype=np.int32),
        np.asarray(contexts, dtype=np.int32),
    )


def train_word2vec(
    token_docs: Sequence[Sequence[str]],
    dim: int,
    *,
    window: int = 5,
    min_count: int = 1,
    negative: int = 5,
    epochs: int = 5,
    lr: float = 5e-3,
    min_lr: float = 1e-4,
    batch_size: int = 1024,
    seed: int = 42,
) -> Word2VecModel:
    """Train SGNS vectors on tokenized documents.

    Host side builds the vocab and the (center, context) pair list; the
    device side runs every optimization step inside one compiled
    ``lax.scan`` (negatives drawn per step with ``jax.random.categorical``
    over the unigram^0.75 logits).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    vocab, freq = build_vocab(token_docs, min_count)
    V = len(vocab)
    if V == 0:
        return Word2VecModel(vocab, np.zeros((0, dim), dtype=np.float32))

    centers, contexts = _skipgram_pairs(token_docs, vocab, window, rng)
    w_in0 = rng.uniform(-0.5 / dim, 0.5 / dim, size=(V, dim)).astype(np.float32)
    if centers.size == 0:
        return Word2VecModel(vocab, w_in0)

    # epoch-shuffled pair stream, padded by wrap-around to a whole number of
    # static-shape batches so the scan has a fixed trip count
    order = np.concatenate(
        [rng.permutation(centers.size) for _ in range(epochs)]
    )
    n_steps = max(1, int(np.ceil(order.size / batch_size)))
    order = np.resize(order, n_steps * batch_size)
    batch_c = jnp.asarray(centers[order].reshape(n_steps, batch_size))
    batch_o = jnp.asarray(contexts[order].reshape(n_steps, batch_size))

    noise_logits = jnp.asarray(0.75 * np.log(freq), dtype=jnp.float32)

    def loss_fn(params, c, o, neg):
        w_in, w_out = params
        u = w_in[c]  # (B, D)
        pos = jnp.einsum("bd,bd->b", u, w_out[o])
        negs = jnp.einsum("bd,bkd->bk", u, w_out[neg])
        return -(
            jnp.mean(jax.nn.log_sigmoid(pos))
            + jnp.mean(jnp.sum(jax.nn.log_sigmoid(-negs), axis=1))
        )

    grad_fn = jax.grad(loss_fn)
    # Adam rather than word2vec's per-pair SGD: batched pair streams have
    # highly skewed per-row multiplicity (hot tokens appear many times per
    # batch), which makes accumulated raw-SGD steps diverge; Adam's
    # per-parameter scaling is robust to it at any corpus size.
    import optax

    optimizer = optax.adam(
        learning_rate=optax.linear_schedule(lr, min_lr, n_steps)
    )

    def step(carry, inputs):
        params, opt_state, key = carry
        c, o = inputs
        key, sub = jax.random.split(key)
        neg = jax.random.categorical(
            sub, noise_logits, shape=(c.shape[0], negative)
        ).astype(jnp.int32)
        grads = grad_fn(params, c, o, neg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, key), None

    @jax.jit
    def run(w_in, w_out, key):
        params = (w_in, w_out)
        (params, _, _), _ = jax.lax.scan(
            step, (params, optimizer.init(params), key), (batch_c, batch_o)
        )
        return params[0]

    w_in = run(
        jnp.asarray(w_in0),
        jnp.zeros((V, dim), dtype=jnp.float32),
        jax.random.PRNGKey(seed),
    )
    return Word2VecModel(vocab, np.asarray(w_in))


def document_vectors(
    model: Word2VecModel, token_docs: Sequence[Sequence[str]], dim: int
) -> np.ndarray:
    """Mean-pooled token vectors per document, zeros when no token is in
    vocabulary (contract of ``getWord2Vec``, ``handleFeature.py:225-238``)."""
    out = np.zeros((len(token_docs), dim), dtype=np.float32)
    for i, doc in enumerate(token_docs):
        ids = [model.vocab[t] for t in doc if t in model.vocab]
        if ids:
            out[i] = model.vectors[ids].mean(axis=0)
    return out
