"""Feature engineering utilities.

Re-design of ``processing/handleFeature.py``: bucketing maps, text
preprocessing and Word2Vec-style text embeddings. The reference trains a fresh
gensim Word2Vec per text column and mean-pools token vectors
(``handleFeature.py:206-238``). Embedder selection (``method=``):

- ``"auto"`` (default): gensim if importable (reference-faithful RNG), else
  the in-repo TPU-native JAX skip-gram trainer (`data/word2vec.py`) with the
  same (window 5, min_count 1) settings — real trained co-occurrence vectors,
  no external dependency.
- ``"sgns"``: force the JAX trainer.
- ``"hash"``: seeded feature-hashing vectors (deterministic random vector per
  token, mean-pooled) — no training, useful for fast tests; same contract:
  one fixed-size vector per document, zeros when empty.
"""
from __future__ import annotations

import hashlib
import re
import string
from typing import Dict, List, Sequence

import numpy as np

# ---- bucketing maps (processing/handleFeature.py:17-59,147-164) ----


def age_bucket(age: int) -> int:
    """Reference ``ageMap`` (``handleFeature.py:17-36``), 0-based: seven
    buckets at 1-7, 8-16, 17-29, 30-39, 40-49, 50-59, >=60. The reference
    falls off the end and returns None for age < 1; we clamp to the first
    bucket (documented deviation — ML-100K has no such ages)."""
    if age <= 7:
        return 0
    if age <= 16:
        return 1
    if age <= 29:
        return 2
    if age <= 39:
        return 3
    if age <= 49:
        return 4
    if age <= 59:
        return 5
    return 6


def year_bucket(year: int) -> int:
    """Reference ``yearMap`` (``handleFeature.py:39-59``): 0 for missing
    (callers map unparseable years to 0 like the reference's "nan"), then
    <1970 -> 1, one bucket per decade through the 2000s, >=2010 -> 6."""
    if year < 1970:
        return 1
    if year < 1980:
        return 2
    if year < 1990:
        return 3
    if year < 2000:
        return 4
    if year < 2010:
        return 5
    return 6


def duration_bucket(minutes: float) -> int:
    """Reference ``durationMap`` (``handleFeature.py:147-164``), 0-based:
    six buckets at [0,30], (30,60], (60,90], (90,120], (120,150], >150.
    The reference returns None for negative durations; we clamp to the
    first bucket."""
    if minutes <= 30:
        return 0
    if minutes <= 60:
        return 1
    if minutes <= 90:
        return 2
    if minutes <= 120:
        return 3
    if minutes <= 150:
        return 4
    return 5


def one_hot(index: int, size: int) -> List[int]:
    v = [0] * size
    if 0 <= index < size:
        v[index] = 1
    return v


# ---- text preprocessing (handleFeature.py:167-203) ----

_PUNCT_DIGITS = str.maketrans("", "", string.punctuation + string.digits)
_STOPWORDS = frozenset(
    """a an the and or but if while is are was were be been being to of in on
    for with at by from as this that these those it its he she they them his
    her their we you i me my our your not no do does did done have has had
    having will would can could shall should may might must about into over
    under again further then once here there all any both each few more most
    other some such only own same so than too very s t don now""".split()
)


def preprocess_text(text: str) -> List[str]:
    """Strip punctuation/digits -> lowercase -> tokenize -> stopword removal
    (reference also jieba-segments Chinese and WordNet-lemmatizes,
    ``handleFeature.py:167-203``; lemmatization is skipped in the fallback —
    hash embeddings are insensitive to it)."""
    if not isinstance(text, str):
        return []
    text = text.translate(_PUNCT_DIGITS).lower()
    tokens = re.findall(r"[\w一-鿿]+", text)
    return [t for t in tokens if t not in _STOPWORDS]


# ---- text embeddings (handleFeature.py:206-238) ----


def _hash_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic unit-variance vector per token via blake2 seeding."""
    seed = int.from_bytes(hashlib.blake2s(token.encode("utf-8")).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def text_embeddings(
    documents: Sequence[str], dim: int, seed: int = 42, method: str = "auto"
) -> np.ndarray:
    """One mean-pooled vector per document, zero vector when empty
    (contract of ``getWord2Vec``, ``handleFeature.py:206-238``).
    ``method``: "auto" | "gensim" | "sgns" | "hash" (see module docstring)."""
    token_docs = [preprocess_text(d) for d in documents]

    if method in ("auto", "gensim"):
        try:  # gensim path (reference-faithful)
            from gensim.models import Word2Vec  # type: ignore

            model = Word2Vec(
                sentences=[t or [""] for t in token_docs],
                vector_size=dim,
                window=5,
                min_count=1,
                workers=4,
                seed=seed,
            )
            out = np.zeros((len(token_docs), dim), dtype=np.float32)
            for i, toks in enumerate(token_docs):
                vecs = [model.wv[t] for t in toks if t in model.wv]
                if vecs:
                    out[i] = np.mean(vecs, axis=0)
            return out
        except ImportError:
            if method == "gensim":
                raise
            method = "sgns"

    if method == "sgns":  # TPU-native JAX skip-gram trainer
        from lgcnhs_tpu.data.word2vec import document_vectors, train_word2vec

        model = train_word2vec(
            token_docs, dim, window=5, min_count=1, seed=seed
        )
        return document_vectors(model, token_docs, dim)

    if method != "hash":
        raise ValueError(f"unknown text embedding method {method!r}")
    cache: Dict[str, np.ndarray] = {}
    out = np.zeros((len(token_docs), dim), dtype=np.float32)
    for i, toks in enumerate(token_docs):
        if not toks:
            continue
        vecs = []
        for t in toks:
            if t not in cache:
                cache[t] = _hash_vector(t, dim)
            vecs.append(cache[t])
        out[i] = np.mean(vecs, axis=0)
    return out


def multi_hot(values: Sequence[Sequence[str]], vocabulary: Sequence[str]) -> np.ndarray:
    """MultiLabelBinarizer equivalent (``processing/handleDouban.py`` genre/
    language/region multi-hots)."""
    index = {v: j for j, v in enumerate(vocabulary)}
    out = np.zeros((len(values), len(vocabulary)), dtype=np.float32)
    for i, vals in enumerate(values):
        for v in vals:
            j = index.get(v)
            if j is not None:
                out[i, j] = 1.0
    return out
