"""TPU-native SGNS word2vec trainer (data/word2vec.py).

The reference delegates to gensim (``processing/handleFeature.py:206-238``);
these tests check our JAX trainer delivers the same capability: trained
co-occurrence structure, deterministic under seed, gensim-contract document
pooling (zeros for empty/OOV docs).
"""
import numpy as np
import pytest

from lgcnhs_tpu.data.features import preprocess_text, text_embeddings
from lgcnhs_tpu.data.word2vec import (
    Word2VecModel,
    build_vocab,
    document_vectors,
    train_word2vec,
)


def _corpus(n_docs=300, seed=0):
    """Two disjoint topic clusters: {apple, banana, fruit} and
    {circuit, voltage, wire}; co-occurrence only within a cluster."""
    rng = np.random.default_rng(seed)
    a = ["apple", "banana", "fruit"]
    b = ["circuit", "voltage", "wire"]
    docs = []
    for _ in range(n_docs):
        words = a if rng.random() < 0.5 else b
        docs.append(list(rng.choice(words, size=6)))
    return docs


def _cos(u, v):
    return float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-12))


def test_vocab_frequency_order_and_min_count():
    vocab, freq = build_vocab([["a", "b", "a"], ["a", "c"]], min_count=1)
    assert vocab["a"] == 0 and freq[0] == 3
    vocab2, freq2 = build_vocab([["a", "b", "a"], ["a", "c"]], min_count=2)
    assert list(vocab2) == ["a"] and freq2.tolist() == [3.0]


def test_sgns_learns_cooccurrence_clusters():
    docs = _corpus()
    model = train_word2vec(docs, dim=16, epochs=3, batch_size=512, seed=1)
    v = {t: model.vectors[i] for t, i in model.vocab.items()}
    within = _cos(v["apple"], v["banana"])
    across = _cos(v["apple"], v["voltage"])
    assert within > across + 0.2, (within, across)


def test_sgns_deterministic_under_seed():
    docs = _corpus(n_docs=50)
    m1 = train_word2vec(docs, dim=8, epochs=2, seed=7)
    m2 = train_word2vec(docs, dim=8, epochs=2, seed=7)
    assert m1.vocab == m2.vocab
    np.testing.assert_array_equal(m1.vectors, m2.vectors)


def test_empty_and_degenerate_corpora():
    m = train_word2vec([], dim=4)
    assert m.vectors.shape == (0, 4)
    # single-token docs produce no pairs -> init vectors returned
    m = train_word2vec([["solo"], ["solo"]], dim=4)
    assert m.vectors.shape == (1, 4)
    assert np.isfinite(m.vectors).all()


def test_document_vectors_contract():
    model = Word2VecModel(
        vocab={"a": 0, "b": 1},
        vectors=np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32),
    )
    docs = [["a", "b"], [], ["zzz"], ["a"]]
    out = document_vectors(model, docs, 2)
    np.testing.assert_allclose(out[0], [0.5, 0.5])
    np.testing.assert_array_equal(out[1], 0)  # empty doc -> zeros
    np.testing.assert_array_equal(out[2], 0)  # OOV-only doc -> zeros
    np.testing.assert_allclose(out[3], [1.0, 0.0])


def test_text_embeddings_sgns_method():
    docs = ["Toy Story", "Toy Soldiers", "Heat Wave", ""]
    out = text_embeddings(docs, dim=5, method="sgns")
    assert out.shape == (4, 5)
    assert np.isfinite(out).all()
    assert not out[:3].any(axis=1).all() or out[:3].any()  # non-degenerate
    np.testing.assert_array_equal(out[3], 0)


def test_text_embeddings_rejects_unknown_method():
    with pytest.raises(ValueError):
        text_embeddings(["x"], dim=2, method="nope")


def test_text_embeddings_auto_falls_back_without_gensim():
    # in this image gensim is absent; auto must transparently produce
    # trained vectors with the documented shape contract
    docs = ["alpha beta", "alpha beta", "gamma delta"]
    out = text_embeddings(docs, dim=3, method="auto")
    assert out.shape == (3, 3)
    assert np.isfinite(out).all()


def test_preprocess_feeds_trainer():
    toks = preprocess_text("The Quick, Brown Fox 1995!")
    assert "the" not in toks and "1995" not in toks
    assert "quick" in toks and "fox" in toks
