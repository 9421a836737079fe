"""Similarity search over an embedding column (scale addition).

The reference's vector search is a Neo4j vector-index top-k
(/root/reference/src/temporal_kg_rag/retrieval/vector_search.py:33-126);
rebuilt here as batch jobs over a Dataset with ``embedding: list<float>``:

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (zero-copy Arrow -> numpy), then a global top-k. This is
  the exact baseline.
- LSH-bucketed ANN (random-hyperplane signs): candidates share a bucket
  with the query; exact rescoring inside buckets. The scale path — the
  shuffle is keyed by uniform hash buckets.

All cosine math in float64 so results match a DuckDB double-precision
oracle bit-for-bit (modulo rounding at 1e-12, handled by ROUND in both).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..functions.rounding import round_half_away


def _to_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_scores(ds, query_vec: np.ndarray, id_col: str = "vec_id",
                  emb_col: str = "embedding", round_to: int = 6):
    """Dataset of (id, cosine) for every row — vectorized per batch.

    cosine = dot(a, q) / (|a| * |q|), computed exactly like DuckDB's
    ``list_cosine_similarity`` (double precision).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def score(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[emb_col])
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        denom = norms * qn
        denom[denom == 0] = np.inf
        cos = round_half_away(dots / denom, round_to)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(cos, pa.float64())],
            names=[id_col, "cosine"],
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


def knn_brute_force(ds, query_vec: np.ndarray, k: int = 10,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Global top-k by cosine (desc), deterministic id tiebreak."""
    scored = cosine_scores(ds, query_vec, id_col, emb_col)
    return scored.sort(["cosine", id_col], descending=[True, False]).limit(k)


def neardup_pairs_cosine(ds, threshold: float = 0.95, limit_ids: int = 500,
                         id_col: str = "vec_id", emb_col: str = "embedding"):
    """Pairs (a < b) with cosine >= threshold among the first ``limit_ids``
    vectors — the embedding-cosine near-dup check, bounded for testing.
    Returns pandas (a, b, cosine)."""
    import pyarrow.compute as pc

    sub = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t[id_col], pa.scalar(limit_ids))),
            batch_format="pyarrow",
        )
        .select_columns([id_col, emb_col])
        .take_all()
    )
    ids = np.array([r[id_col] for r in sub])
    m = _norm_rows(np.array([r[emb_col] for r in sub], dtype=np.float64))
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    sims = m @ m.T
    a_ix, b_ix = np.where(np.triu(sims >= threshold, k=1))
    return pd.DataFrame({
        "a": ids[a_ix],
        "b": ids[b_ix],
        "cosine": round_half_away(sims[a_ix, b_ix], 6),
    }).sort_values(["a", "b"], ignore_index=True)


class LshAnnIndexStage:
    """Random-hyperplane LSH bucketing: each vector -> (bucket, id).

    Hyperplanes are derived from stable hashes (deterministic across
    processes). ANN query = compute the query's bucket, rescore exactly
    within it; multi-probe by flipping one bit raises recall.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7):
        rng = np.random.RandomState(
            stable_hash64(f"lsh-{seed}") % (2 ** 32)
        )
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return signs.astype(np.int64) @ weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        buckets = self.bucket_of(m)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def ann_lsh_topk(ds, query_vec: np.ndarray, k: int = 10, dim: int | None = None,
                 n_planes: int = 8, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
    """Approximate top-k: LSH bucket + one-bit multi-probe, exact rescore.

    Returns pandas (id, cosine). Recall measured against brute force in
    tests; the pattern is the 100 TB path (bucket groupby instead of a full
    scan per query).
    """
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    if dim is None:
        dim = len(q)
    index = LshAnnIndexStage(dim, n_planes)
    bucketed = ds.map_batches(index, batch_format="pyarrow", batch_size=4096)
    q_bucket = int(index.bucket_of(q[None, :])[0])
    probes = [q_bucket] + [q_bucket ^ (1 << b) for b in range(n_planes)]
    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"],
                                    value_set=pa.array(probes, pa.int64()))),
        batch_format="pyarrow",
    )
    top = knn_brute_force(cand, q, k, id_col, emb_col).to_pandas()
    return top
