"""Deterministic hash embedding (sandbox stand-in for the reference's
embedding service).

The reference embeds text via an HTTP embedding model with retries and a
file cache (/root/reference/src/temporal_kg_rag/embeddings/generator.py:20-249,
cache.py:15-235). No model or network exists here, so the engine's
embedding stage is a deterministic hashed character-n-gram vectorizer:
L2-normalized counts of char 3-grams hashed into ``dim`` buckets. It
preserves the property the dedup cascade needs — near-identical surface
forms get cosine ~1 — while being a pure function (idempotent under Ray
retries, no cache needed).

A real model drops in by replacing ``embed_texts`` inside the actor stage
(stages/embed.py) — the pipeline shape (actor pool, micro-batches) is
unchanged.
"""

from __future__ import annotations

import numpy as np

from .hashing import char_ngrams, stable_hash64


# gram -> stable_hash64(gram) memo. The char-n-gram alphabet of a corpus
# is small and heavy-tailed (tens of thousands of distinct 3-grams across
# billions of occurrences), so each worker process pays the MD5 exactly
# once per distinct gram and every later occurrence is a dict hit
# (~20x on the embedding kernel, measured 0.39 -> ~5 Mchar/s). Bounded so
# adversarial unicode soup can't grow it without limit; past the cap the
# kernel computes uncached (same values, just slower).
_GRAM_HASH_CACHE: dict[str, int] = {}
_GRAM_HASH_CACHE_MAX = 1 << 20


def _gram_hash(gram: str) -> int:
    h = _GRAM_HASH_CACHE.get(gram)
    if h is None:
        h = stable_hash64(gram)
        if len(_GRAM_HASH_CACHE) < _GRAM_HASH_CACHE_MAX:
            _GRAM_HASH_CACHE[gram] = h
    return h


def embed_text(text: str, dim: int = 256, ngram: int = 3) -> np.ndarray:
    grams = char_ngrams(text, ngram)
    if not grams:
        return np.zeros(dim, dtype=np.float32)
    gh = _gram_hash
    idx = np.fromiter((gh(g) % dim for g in grams), dtype=np.int64,
                      count=len(grams))
    # integer counts are exactly representable in float32, so this equals
    # the historical += 1.0 accumulation bit-for-bit
    vec = np.bincount(idx, minlength=dim).astype(np.float32)
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return vec


def embed_texts(texts: list[str], dim: int = 256, ngram: int = 3) -> np.ndarray:
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_text(t, dim, ngram)
    return out


def cosine(v1: np.ndarray, v2: np.ndarray) -> float:
    """Cosine similarity (reference entity_deduplication.py:558-571)."""
    n1 = float(np.linalg.norm(v1))
    n2 = float(np.linalg.norm(v2))
    if n1 == 0 or n2 == 0:
        return 0.0
    return float(np.dot(v1, v2) / (n1 * n2))
