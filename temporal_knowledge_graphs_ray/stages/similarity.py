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
    """Multi-table random-hyperplane LSH: each vector -> one bucket id per
    table (standard L-tables-of-k-planes construction; recall grows with L
    because a near neighbor only needs to collide in ONE table).

    Hyperplanes are derived from stable hashes (deterministic across
    processes). The stage emits a list column ``buckets`` (one per table);
    the ANN query unions its buckets' members and rescores exactly.
    """

    def __init__(self, dim: int, n_planes: int = 6, n_tables: int = 8,
                 seed: int = 7):
        rng = np.random.RandomState(
            stable_hash64(f"lsh-{seed}") % (2 ** 32)
        )
        self.n_tables = n_tables
        self.n_planes = n_planes
        self.planes = rng.standard_normal((n_tables, n_planes, dim))

    def buckets_of(self, vecs: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 bucket ids, table index folded in."""
        weights = (1 << np.arange(self.n_planes)).astype(np.int64)
        out = np.empty((len(vecs), self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            signs = (vecs @ self.planes[t].T) > 0
            out[:, t] = (signs.astype(np.int64) @ weights
                         + (t << (self.n_planes + 1)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        buckets = self.buckets_of(m)
        return batch.append_column(
            "buckets", pa.array(buckets.tolist(), pa.list_(pa.int64())))


def ann_lsh_topk(ds, query_vec: np.ndarray, k: int = 10, dim: int | None = None,
                 n_planes: int = 6, n_tables: int = 16,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
    """Approximate top-k: union of the query's buckets across L tables,
    exact rescore of the candidates.

    Returns pandas (id, cosine). Recall measured against brute force in
    tests; the pattern is the 100 TB path (bucket groupby instead of a full
    scan per query). Note: the synthetic benchmark embeddings are uniform
    random — an LSH worst case (neighbors barely closer than random
    points); clustered real embeddings bucket far better at the same L/k.
    """
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    if dim is None:
        dim = len(q)
    index = LshAnnIndexStage(dim, n_planes, n_tables)
    bucketed = ds.map_batches(index, batch_format="pyarrow", batch_size=4096)
    q_buckets = pa.array(index.buckets_of(q[None, :])[0].tolist(),
                         pa.int64())

    def cand_filter(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["buckets"])
        hit = pc.is_in(flat, value_set=q_buckets)
        # row matches if ANY of its table buckets matches the query's
        lengths = pc.list_value_length(t["buckets"]).to_numpy()
        hits = hit.to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        pos = 0
        for i, ln in enumerate(lengths):
            keep[i] = hits[pos:pos + ln].any()
            pos += ln
        return t.filter(pa.array(keep)).drop_columns(["buckets"])

    cand = bucketed.map_batches(cand_filter, batch_format="pyarrow")
    top = knn_brute_force(cand, q, k, id_col, emb_col).to_pandas()
    return top
