"""Embedding generation stage (A3).

The reference embeds chunk texts via an HTTP embedding model with
client-side micro-batching, tenacity retries and a file cache
(/root/reference/src/temporal_kg_rag/embeddings/generator.py:20-249,
cache.py:15-235; batch size default 10, settings.py:85-87). Rebuilt as an
actor-pool ``map_batches`` stage:

- the "model" is pinned per actor in ``__init__`` (here the deterministic
  hashed char-n-gram embedder, functions/embed.py; a real encoder drops in
  by overriding ``_encode``),
- micro-batching is the map_batches batch size,
- retries are Ray task retries (the stage is a pure function of its rows,
  so retries are idempotent — this REPLACES the reference's file cache,
  whose only purpose was idempotent re-embedding),
- empty texts get zero vectors (generator.py:156-209's empty-text index
  bookkeeping collapses to a vectorized mask).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import embed_texts


class EmbeddingStage:
    """text column -> fixed-dim float32 list column."""

    def __init__(self, text_col: str = "text", out_col: str = "embedding",
                 cfg: EngineConfig = DEFAULT_CONFIG):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = cfg.embed_dim
        self.ngram = cfg.embed_ngram

    def _encode(self, texts: list[str]) -> np.ndarray:
        return embed_texts(texts, self.dim, self.ngram)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        nonempty = [t if t and t.strip() else "" for t in texts]
        vecs = self._encode(nonempty).astype(np.float32, copy=False)
        # empty texts -> zero vector (reference returns zeros for empties)
        empty_mask = np.fromiter((not t for t in nonempty), dtype=bool,
                                 count=len(nonempty))
        if empty_mask.any():
            vecs[empty_mask] = 0.0
        # zero-copy list<float32> from the flat buffer: offsets + values,
        # no per-row Python list boxing (the old
        # pa.array([v.tolist() ...]) boxed every float of every vector
        # and dominated the dense-leg wall time)
        # offsets step by the ENCODER'S actual width, not cfg.embed_dim
        # — an _encode override returning a different dim (the documented
        # real-model seam) must not silently misalign rows
        n, dim = vecs.shape
        flat = pa.array(np.ascontiguousarray(vecs).reshape(-1),
                        type=pa.float32())
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, dim, dtype=np.int32),
            type=pa.int32())
        return batch.append_column(
            self.out_col, pa.ListArray.from_arrays(offsets, flat))


def embed_documents(ds, text_col: str = "text",
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency=(1, 8), batch_size: int = 256):
    """Actor-pool embedding over any Dataset with a text column."""
    return ds.map_batches(
        EmbeddingStage,
        fn_constructor_kwargs={"text_col": text_col, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
