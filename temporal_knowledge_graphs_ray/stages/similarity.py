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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..functions.rounding import round_half_away


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (rows, dim) float64 matrix.

    Fast path: uniform-length, null-free list arrays (every embedding
    column in practice) flatten zero-copy and reshape — ~9x faster than
    the row-wise ``to_pylist`` materialization, which matters because
    every cosine/kNN/k-means kernel converts each batch through here.
    Ragged/null/fixed-size-list inputs fall back to the exact original
    conversion."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        widths = np.diff(arr.offsets.to_numpy())
        if (len(widths) and arr.null_count == 0 and widths[0] > 0
                and (widths == widths[0]).all()):
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            if flat.size == len(arr) * widths[0]:
                return flat.astype(np.float64).reshape(
                    len(arr), widths[0])
    except AttributeError:
        pass
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
    """Global top-k by cosine (desc), deterministic id tiebreak; the
    per-block partial top-k keeps the wide sort at k x blocks rows."""
    from .topk import topk_rows

    scored = cosine_scores(ds, query_vec, id_col, emb_col)
    return topk_rows(scored, ["cosine", id_col], [True, False], k)


def knn_brute_force_many(ds, query_mat: np.ndarray, k: int = 10,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         round_to: int = 6):
    """Per-query exact top-k for a BATCH of query vectors in ONE
    corpus scan: each block computes the (rows × queries) cosine
    matrix with one matmul and keeps its per-query top-k (any global
    top-k row is in its block's per-query top-k), so the grouped
    selection sees only k × queries × blocks rows. Returns
    (qi, id, cosine) ordered (qi asc, cosine desc, id asc) — the
    batched-serving analogue of ``knn_brute_force`` (identity-tested
    against it per query)."""
    import pandas as pd

    from ..functions.rounding import round_half_away
    from .topk import group_topk_rows

    q = np.asarray(query_mat, dtype=np.float64)
    if q.ndim != 2:
        raise ValueError("query_mat must be (n_queries, dim)")
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = np.inf
    n_q = q.shape[0]

    def score(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[emb_col])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = np.inf
        cos = round_half_away(
            (m @ q.T) / np.outer(norms, qn), round_to)
        ids = batch[id_col].to_pandas()
        df = pd.DataFrame({
            "qi": np.repeat(np.arange(n_q, dtype=np.int64), len(ids)),
            "id": np.tile(ids.to_numpy(), n_q),
            "cosine": cos.T.reshape(-1)})
        # per-block per-query top-k before anything moves
        df = (df.sort_values(["qi", "cosine", "id"],
                             ascending=[True, False, True],
                             kind="mergesort")
              .groupby("qi", sort=False).head(k))
        return pa.Table.from_arrays(
            [pa.array(df["qi"].to_numpy()),
             pa.array(df["id"], batch[id_col].type),
             pa.array(df["cosine"].to_numpy(), pa.float64())],
            names=["qi", id_col, "cosine"])

    scored = ds.map_batches(score, batch_format="pyarrow",
                            batch_size=4096)
    top = group_topk_rows(scored, "qi", ["cosine", id_col],
                          [True, False], k).to_pandas()
    if top.empty:
        # empty corpus: to_pandas drops the schema — return the typed
        # empty frame the single-query knn_brute_force path returns
        return pd.DataFrame({"qi": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return (top.sort_values(["qi", "cosine", id_col],
                            ascending=[True, False, True],
                            ignore_index=True)
            [["qi", id_col, "cosine"]])


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
    if not sub:  # nothing under limit_ids (or empty input)
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
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


class AnnIndex:
    """PERSISTED multi-table LSH index: the bucketed table is computed
    once (one pass over the corpus) and reused across queries — queries
    scan the materialized index, never re-bucket the corpus. ``save`` /
    ``load`` round-trip the index through partitioned Parquet so a later
    job (or a resumed run) skips the build entirely.

    The candidate test is fully vectorized: each row carries exactly
    ``n_tables`` bucket ids, so the flat is_in mask reshapes to
    (rows, n_tables) and ANY-reduces along axis 1 — no per-row Python.
    """

    def __init__(self, ds, dim: int, n_planes: int = 6, n_tables: int = 16,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 seed: int = 7):
        self.stage = LshAnnIndexStage(dim, n_planes, n_tables, seed)
        self.n_tables = n_tables
        self.id_col = id_col
        self.emb_col = emb_col
        self.dim = dim
        self.bucketed = (
            ds.map_batches(self.stage, batch_format="pyarrow",
                           batch_size=4096)
            .materialize() if ds is not None else None
        )

    def save(self, path: str) -> None:
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)
        self.bucketed.write_parquet(path)

    @classmethod
    def load(cls, path: str, dim: int, n_planes: int = 6,
             n_tables: int = 16, id_col: str = "vec_id",
             emb_col: str = "embedding", seed: int = 7) -> "AnnIndex":
        import ray.data as rd

        idx = cls(None, dim, n_planes, n_tables, id_col, emb_col, seed)
        idx.bucketed = rd.read_parquet(path)
        return idx

    def _candidates(self, q_buckets_2d: np.ndarray):
        """Dataset of rows colliding with ANY query in >= 1 table,
        plus a per-row bitmask of WHICH queries matched."""
        import pyarrow.compute as pc

        n_q = len(q_buckets_2d)
        want = pa.array(sorted({int(b) for row in q_buckets_2d
                                for b in row}), pa.int64())
        bucket_to_queries: dict[int, int] = {}
        for qi, row in enumerate(q_buckets_2d):
            for b in row:
                bucket_to_queries[int(b)] = (
                    bucket_to_queries.get(int(b), 0) | (1 << qi))

        n_tables = self.n_tables

        def cand_filter(t: pa.Table) -> pa.Table:
            flat = pc.list_flatten(t["buckets"])
            hits = pc.is_in(flat, value_set=want).to_numpy(
                zero_copy_only=False).reshape(len(t), n_tables)
            keep = hits.any(axis=1)
            if not keep.any():
                return (t.filter(pa.array(keep))
                        .drop_columns(["buckets"])
                        .append_column("qmask",
                                       pa.array([], pa.int64())))
            kept = t.filter(pa.array(keep))
            if n_q == 1:
                masks = np.ones(len(kept), dtype=np.int64)
            else:
                flat_kept = pc.list_flatten(kept["buckets"]).to_numpy(
                    zero_copy_only=False).reshape(len(kept), n_tables)
                masks = np.zeros(len(kept), dtype=np.int64)
                for b, qm in bucket_to_queries.items():
                    masks |= np.where((flat_kept == b).any(axis=1), qm, 0)
            return (kept.drop_columns(["buckets"])
                    .append_column("qmask", pa.array(masks, pa.int64())))

        return self.bucketed.map_batches(cand_filter,
                                         batch_format="pyarrow")

    def topk(self, query_vec: np.ndarray, k: int = 10) -> pd.DataFrame:
        q = np.asarray(query_vec, dtype=np.float64)
        cand = self._candidates(self.stage.buckets_of(q[None, :]))
        cand = cand.drop_columns(["qmask"])
        return knn_brute_force(cand, q, k, self.id_col,
                               self.emb_col).to_pandas()

    # query-membership bitmasks are int64: at most 63 queries per scan
    # (bit 63 would overflow); larger batches are chunked transparently
    _MAX_QUERIES_PER_SCAN = 63

    def topk_many(self, query_vecs: np.ndarray,
                  k: int = 10) -> pd.DataFrame:
        """Batched queries in ONE index scan (the serving-at-scale shape):
        returns (query_ix, id, cosine) for the top-k of each query.
        Batches beyond 63 queries run as multiple scans (the per-row
        query-membership mask is an int64 bitfield)."""
        qs = np.asarray(query_vecs, dtype=np.float64)
        maxq = self._MAX_QUERIES_PER_SCAN
        if len(qs) > maxq:
            frames = []
            for start in range(0, len(qs), maxq):
                sub = self.topk_many(qs[start:start + maxq], k)
                if len(sub):
                    sub["query_ix"] = sub["query_ix"] + start
                    frames.append(sub)
            if not frames:
                return pd.DataFrame({"query_ix": [], self.id_col: [],
                                     "cosine": []})
            return pd.concat(frames, ignore_index=True)
        cand = (self._candidates(self.stage.buckets_of(qs))
                .select_columns([self.id_col, self.emb_col, "qmask"])
                .take_all())
        if not cand:
            return pd.DataFrame({"query_ix": [], self.id_col: [],
                                 "cosine": []})
        ids = np.array([r[self.id_col] for r in cand])
        m = _norm_rows(np.array([r[self.emb_col] for r in cand],
                                dtype=np.float64))
        masks = np.array([r["qmask"] for r in cand], dtype=np.int64)
        out = []
        qn = _norm_rows(qs)
        for qi in range(len(qs)):
            sel = (masks & (1 << qi)) != 0
            if not sel.any():
                continue
            cos = round_half_away(m[sel] @ qn[qi], 6)
            sub = pd.DataFrame({self.id_col: ids[sel], "cosine": cos})
            sub = sub.sort_values(["cosine", self.id_col],
                                  ascending=[False, True]).head(k)
            sub.insert(0, "query_ix", qi)
            out.append(sub)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"query_ix": [], self.id_col: [], "cosine": []})


def neardup_pairs_lsh(ds, threshold: float = 0.9, n_planes: int = 8,
                      n_tables: int = 16, id_col: str = "vec_id",
                      emb_col: str = "embedding",
                      dim: int | None = None) -> pd.DataFrame:
    """Embedding-cosine near-dup at SCALE: LSH-bucketed candidate pairs +
    distributed exact-cosine verification — the production path where the
    bounded all-pairs ``neardup_pairs_cosine`` is the exactness oracle.

    Same shape as the MinHash pipeline: vectors explode to (id, table,
    bucket) rows, pairs sharing any bucket become candidates (bucketed
    pair-gen with the hot-bucket cap), embeddings join the pair halves
    worker-side (serialized float64 bytes, bit-exact vs the all-pairs
    oracle — list columns don't survive the group stages), and each pair
    verifies cosine >= threshold. The driver only holds candidate IDs.
    Detection probability at cosine 0.9 with 8 planes x 16 tables is
    ~0.996 per true pair among SURVIVING candidates; raise n_tables for
    tighter recall. Caveat: a dense cluster putting > _MAX_BAND_GROUP
    rows into one (table, bucket) switches to the linear star expansion
    (every member pairs with the bucket's min id — the bucketed
    pair-gen's quadratic-blowup guard), so within such clusters only
    hub pairs are enumerated; tune n_planes up (smaller buckets) if
    dense clusters are expected and full pair enumeration matters.
    """
    import pyarrow.compute as pc

    from .dedup import _candidate_pairs_from_bands

    if dim is None:
        first = ds.take(1)
        if not first:  # empty input: no pairs
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        dim = len(first[0][emb_col])
    stage = LshAnnIndexStage(dim, n_planes, n_tables)

    def band_rows(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[emb_col])
        buckets = stage.buckets_of(m)  # (n, n_tables)
        n, L = buckets.shape
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), L)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(np.tile(np.arange(L, dtype=np.int32), n)),
             pa.array(buckets.reshape(-1), pa.int64())],
            names=[id_col, "band_index", "band_hash"],
        )

    cand = (
        _candidate_pairs_from_bands(
            ds.map_batches(band_rows, batch_format="pyarrow",
                           batch_size=4096), id_col)
        .groupby(["a", "b"]).count().select_columns(["a", "b"])
    ).materialize()
    cand_ids = set()
    for batch in cand.iter_batches(batch_format="pyarrow"):
        cand_ids.update(batch["a"].to_pylist())
        cand_ids.update(batch["b"].to_pylist())
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    if not cand_ids:
        return empty
    needed = pa.array(sorted(cand_ids), pa.int64())

    def vec_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[id_col], value_set=needed))
        m = _to_matrix(t[emb_col])  # float64 already
        return pa.Table.from_arrays(
            [t[id_col].cast(pa.int64()).combine_chunks(),
             pa.array([-1] * len(t), pa.int64()),
             pa.array([-1] * len(t), pa.int64()),
             pa.array([row.tobytes() for row in m], pa.binary())],
            names=["doc", "pa", "pb", "vec"],
        )

    def half_rows(t: pa.Table) -> pa.Table:
        a = t["a"].cast(pa.int64()).combine_chunks()
        b = t["b"].cast(pa.int64()).combine_chunks()
        doc = pa.concat_arrays([a, b])
        return pa.Table.from_arrays(
            [doc, pa.concat_arrays([a, a]), pa.concat_arrays([b, b]),
             pa.array([None] * len(doc), pa.binary())],
            names=["doc", "pa", "pb", "vec"],
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        vecs = dict(zip(g[g["pa"] < 0]["doc"], g[g["pa"] < 0]["vec"]))
        halves = g[g["pa"] >= 0].copy()
        halves["vec"] = halves["doc"].map(vecs)
        halves = halves[halves["vec"].notna()]
        return halves[["pa", "pb", "doc", "vec"]]

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (a, b), grp in g.groupby(["pa", "pb"], sort=False):
            if len(grp) != 2:
                continue
            v1, v2 = (np.frombuffer(x, dtype=np.float64)
                      for x in grp["vec"])
            n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
            if n1 == 0 or n2 == 0:
                continue
            cos = float(v1 @ v2) / float(n1 * n2)
            if cos >= threshold:
                rows.append({"a": int(a), "b": int(b),
                             "cosine": float(round_half_away(
                                 np.array([cos]), 6)[0])})
        return pd.DataFrame(rows, columns=["a", "b", "cosine"])

    def bucket_by(col: str, n: int = 64):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.append_column(
                "bucket",
                _pc.cast(_pc.bit_wise_and(t[col].cast(pa.int64()),
                                          pa.scalar(n - 1, pa.int64())),
                         pa.int32()))

        return fn

    joined = (
        ds.map_batches(vec_rows, batch_format="pyarrow")
        .union(cand.map_batches(half_rows, batch_format="pyarrow"))
        .map_batches(bucket_by("doc"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
    )
    out = (
        joined.map_batches(bucket_by("pa"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return empty
    return out.sort_values(["a", "b"], ignore_index=True)


def _train_coarse(x: np.ndarray, n_lists: int, iters: int,
                  rng: np.random.RandomState) -> np.ndarray:
    """The shared IVF coarse-quantizer recipe: deterministic-seeded
    Lloyd iterations with argmax-cosine assignment and renormalized
    means, over a row-normalized sample. Used by both IvfIndex and
    IvfPqIndex so the k-means recipe cannot silently diverge."""
    k_eff = min(n_lists, len(x))
    cent = x[rng.choice(len(x), size=k_eff, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(k_eff):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfIndex:
    """IVF-Flat ANN: deterministic k-means coarse quantizer + inverted
    lists — the data-DEPENDENT counterpart to the LSH index (clustered
    real embeddings partition far better by learned centroids than by
    random hyperplanes).

    - train: Lloyd iterations in numpy over a driver-side sample
      (deterministic seed, no wall clock) — the classic IVF recipe;
    - assign: one ``map_batches`` pass appends ``list_id`` (argmax cosine
      against the broadcast centroid matrix), materialized/persistable;
    - query: probe the ``nprobe`` nearest lists, exact rescore inside.
    """

    def __init__(self, ds, dim: int, n_lists: int = 16,
                 train_sample: int = 2048, iters: int = 10, seed: int = 11,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.dim = dim
        self.n_lists = n_lists
        self.id_col = id_col
        self.emb_col = emb_col
        if ds is None:
            self.centroids = None
            self.assigned = None
            return
        sample = ds.limit(train_sample).take_all()
        if not sample:
            raise ValueError(
                "IvfIndex: training dataset is empty — nothing to "
                "quantize (filtered-out or zero-row input?)")
        m = _norm_rows(np.array([r[emb_col] for r in sample],
                                dtype=np.float64))
        rng = np.random.RandomState(stable_hash64(f"ivf-{seed}") % (2**32))
        self.centroids = _train_coarse(m, n_lists, iters, rng)
        self.assigned = ds.map_batches(
            self._assign_stage(), batch_format="pyarrow",
            batch_size=4096).materialize()

    def _assign_stage(self):
        cent = self.centroids
        emb_col, id_col = self.emb_col, self.id_col

        def fn(t: pa.Table) -> pa.Table:
            m = _norm_rows(_to_matrix(t[emb_col]))
            lists = (m @ cent.T).argmax(axis=1).astype(np.int32)
            return t.append_column("list_id", pa.array(lists))

        return fn

    def add(self, ds, save_path: str | None = None) -> int:
        """Index new vectors WITHOUT retraining: the coarse quantizer is
        frozen at train time (standard IVF growth — FAISS ``add``), so
        ingesting a new corpus increment is ONE assign pass unioned into
        the inverted lists; queries see the union immediately. With
        ``save_path`` (a dir previously written by :meth:`save`) the new
        rows are ALSO appended to the on-disk lists as fresh files in
        their ``list_id=`` partitions — existing files are untouched, so
        a 10^12-vector saved index grows by increment size, not by a
        full rewrite. Returns the number of vectors added."""
        if self.centroids is None:
            raise ValueError("IvfIndex.add: index has no trained "
                             "centroids (construct or load it first)")
        new = ds.map_batches(self._assign_stage(),
                             batch_format="pyarrow",
                             batch_size=4096).materialize()
        n_new = new.count()
        self.assigned = self.assigned.union(new)
        if save_path is not None:
            from .blocks import coalesce_blocks

            coalesce_blocks(new).write_parquet(
                os.path.join(save_path, "lists"),
                partition_cols=["list_id"])
        return n_new

    def save(self, path: str) -> None:
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)
        from .blocks import coalesce_blocks

        coalesce_blocks(self.assigned).write_parquet(
            os.path.join(path, "lists"), partition_cols=["list_id"])
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"centroid": pa.array(
                [c.tolist() for c in self.centroids],
                pa.list_(pa.float64()))}),
            os.path.join(path, "centroids.parquet"))

    @classmethod
    def load(cls, path: str, id_col: str = "vec_id",
             emb_col: str = "embedding") -> "IvfIndex":
        import pyarrow.parquet as pq
        import ray.data as rd

        idx = cls(None, 0, id_col=id_col, emb_col=emb_col)
        idx.centroids = np.array(
            pq.read_table(os.path.join(path, "centroids.parquet"))
            ["centroid"].to_pylist(), dtype=np.float64)
        idx.dim = idx.centroids.shape[1]
        idx.n_lists = len(idx.centroids)
        idx.assigned = rd.read_parquet(os.path.join(path, "lists"))
        return idx

    def topk(self, query_vec: np.ndarray, k: int = 10,
             nprobe: int = 4) -> pd.DataFrame:
        import pyarrow.compute as pc

        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ qn))
        probe = pa.array(sorted(int(x) for x in order[:nprobe]),
                         pa.int32())

        def in_lists(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["list_id"].cast(pa.int32()),
                                     value_set=probe))

        cand = self.assigned.map_batches(in_lists, batch_format="pyarrow")
        return knn_brute_force(cand, q, k, self.id_col,
                               self.emb_col).to_pandas()


class IvfPqIndex:
    """IVF-PQ ANN: the IVF coarse quantizer plus PRODUCT-QUANTIZED
    residuals (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011) — the memory-bounded scale path. Each vector
    stores ``m`` uint8 codes instead of ``dim`` float64s (e.g. 8 bytes
    vs 512: 64x), which is what makes a 10^12-vector index hold in a
    cluster's aggregate RAM; queries score candidates via ADC lookup
    tables (nprobe x m x ks floats, built per query) and an exact
    cosine REFINE pass over the top-``refine`` ADC candidates restores
    recall.

    Train is the IVF recipe (driver-side deterministic sample; coarse
    k-means, then per-subspace k-means over residuals). Encode is one
    ``map_batches`` pass appending (list_id, code). At this sandbox's
    scale the raw embedding column rides along for the refine step; at
    100 TB you drop it from the index partitions and refine against the
    corpus Parquet instead (codes + ids are the only hot state).
    """

    def __init__(self, ds, dim: int, n_lists: int = 16, m: int = 8,
                 ks: int = 16, train_sample: int = 2048, iters: int = 10,
                 seed: int = 11, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        self.dim = dim
        self.n_lists = n_lists
        self.m = m
        self.ks = ks
        self.id_col = id_col
        self.emb_col = emb_col
        if ds is None:
            self.centroids = None
            self.codebooks = None
            self.assigned = None
            return
        if dim % m:
            raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
        if ks > 256:
            raise ValueError(
                f"ks={ks} > 256: PQ codes are uint8 — larger codebooks "
                "would silently wrap in the cast and corrupt the index")
        sample = ds.limit(train_sample).take_all()
        if not sample:
            raise ValueError("IvfPqIndex: training dataset is empty")
        x = _norm_rows(np.array([r[emb_col] for r in sample],
                                dtype=np.float64))
        rng = np.random.RandomState(stable_hash64(f"ivfpq-{seed}")
                                    % (2 ** 32))
        cent = _train_coarse(x, n_lists, iters, rng)
        self.centroids = cent
        self.n_lists = len(cent)
        # PQ codebooks over RESIDUALS (x - coarse centroid), L2 k-means
        # per subspace — the classic IVF-PQ pairing
        res = x - cent[(x @ cent.T).argmax(axis=1)]
        d_sub = dim // m
        ks_eff = min(ks, len(x))
        books = np.empty((m, ks_eff, d_sub), dtype=np.float64)
        for j in range(m):
            sub = res[:, j * d_sub:(j + 1) * d_sub]
            cb = sub[rng.choice(len(sub), size=ks_eff, replace=False)].copy()
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for c in range(ks_eff):
                    members = sub[a == c]
                    if len(members):
                        cb[c] = members.mean(axis=0)
            books[j] = cb
        self.codebooks = books
        self.ks = ks_eff
        self.assigned = ds.map_batches(
            self._encode_stage(), batch_format="pyarrow",
            batch_size=4096).materialize()

    def _encode_stage(self):
        cent, books = self.centroids, self.codebooks
        m, dim = self.m, self.dim
        d_sub = dim // m
        emb_col = self.emb_col

        def fn(t: pa.Table) -> pa.Table:
            x = _norm_rows(_to_matrix(t[emb_col]))
            lists = (x @ cent.T).argmax(axis=1).astype(np.int32)
            res = x - cent[lists]
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                sub = res[:, j * d_sub:(j + 1) * d_sub]
                # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2; argmin over c
                # needs only the last two terms
                d2 = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            return (t.append_column("list_id", pa.array(lists))
                    .append_column("code", pa.array(
                        [c.tobytes() for c in codes], pa.binary())))

        return fn

    def add(self, ds, save_path: str | None = None) -> int:
        """Grow the index without retraining: coarse centroids AND PQ
        codebooks are frozen at train time (FAISS ``add`` semantics),
        so a corpus increment is ONE encode pass unioned into the
        lists. With ``save_path`` (a dir from :meth:`save`) the new
        codes also land as fresh files in their ``list_id=``
        partitions — append-only on-disk growth, no rewrite of the
        existing 10^12-vector lists. Returns the row count added."""
        if self.centroids is None:
            raise ValueError("IvfPqIndex.add: index has no trained "
                             "centroids (construct or load it first)")
        new = ds.map_batches(self._encode_stage(),
                             batch_format="pyarrow",
                             batch_size=4096).materialize()
        n_new = new.count()
        self.assigned = self.assigned.union(new)
        if save_path is not None:
            from .blocks import coalesce_blocks

            coalesce_blocks(new).write_parquet(
                os.path.join(save_path, "lists"),
                partition_cols=["list_id"])
        return n_new

    def save(self, path: str) -> None:
        import shutil as _sh

        import pyarrow.parquet as pq

        _sh.rmtree(path, ignore_errors=True)
        from .blocks import coalesce_blocks

        coalesce_blocks(self.assigned).write_parquet(
            os.path.join(path, "lists"), partition_cols=["list_id"])
        pq.write_table(
            pa.table({"centroid": pa.array(
                [c.tolist() for c in self.centroids],
                pa.list_(pa.float64()))}),
            os.path.join(path, "centroids.parquet"))
        pq.write_table(
            pa.table({
                "subspace": pa.array(
                    [j for j in range(self.m) for _ in range(self.ks)],
                    pa.int32()),
                "code": pa.array(
                    list(range(self.ks)) * self.m, pa.int32()),
                "vec": pa.array(
                    [self.codebooks[j][c].tolist()
                     for j in range(self.m) for c in range(self.ks)],
                    pa.list_(pa.float64())),
            }),
            os.path.join(path, "codebooks.parquet"))

    @classmethod
    def load(cls, path: str, id_col: str = "vec_id",
             emb_col: str = "embedding") -> "IvfPqIndex":
        import pyarrow.parquet as pq
        import ray.data as rd

        idx = cls(None, 0, id_col=id_col, emb_col=emb_col)
        idx.centroids = np.array(
            pq.read_table(os.path.join(path, "centroids.parquet"))
            ["centroid"].to_pylist(), dtype=np.float64)
        idx.dim = idx.centroids.shape[1]
        idx.n_lists = len(idx.centroids)
        cb = pq.read_table(os.path.join(path, "codebooks.parquet"))
        sub = np.array(cb["subspace"].to_pylist())
        code = np.array(cb["code"].to_pylist())
        vecs = np.array(cb["vec"].to_pylist(), dtype=np.float64)
        idx.m = int(sub.max()) + 1
        idx.ks = int(code.max()) + 1
        d_sub = vecs.shape[1]
        books = np.empty((idx.m, idx.ks, d_sub), dtype=np.float64)
        books[sub, code] = vecs
        idx.codebooks = books
        idx.assigned = rd.read_parquet(os.path.join(path, "lists"))
        return idx

    def topk(self, query_vec: np.ndarray, k: int = 10, nprobe: int = 4,
             refine: int = 64) -> pd.DataFrame:
        """ADC scan over the probed lists (per-batch partial top-
        ``refine``), exact cosine refine of the merged candidates, final
        top-k with id tiebreak. Driver state: nprobe tables + at most
        ``refine`` rows per batch."""
        import pyarrow.compute as pc

        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ qn))
        probe_ids = sorted(int(x) for x in order[:nprobe])
        probe = pa.array(probe_ids, pa.int32())
        d_sub = self.dim // self.m
        # ADC tables per probed list: T[l][j][c] = (q - c_l)_j . book_j[c]
        # plus the constant q . c_l term
        tables = {}
        base = {}
        for li in probe_ids:
            r = qn - self.centroids[li]
            tables[li] = np.stack([
                self.codebooks[j] @ r[j * d_sub:(j + 1) * d_sub]
                for j in range(self.m)])  # (m, ks)
            base[li] = float(qn @ self.centroids[li])
        id_col, emb_col = self.id_col, self.emb_col
        m = self.m
        refine = max(refine, k)

        def adc_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["list_id"].cast(pa.int32()),
                                  value_set=probe))
            if not t.num_rows:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "adc": pa.array([], pa.float64())})
            lists = t["list_id"].to_numpy(zero_copy_only=False)
            codes = np.frombuffer(
                b"".join(t["code"].to_pylist()),
                dtype=np.uint8).reshape(-1, m)
            scores = np.empty(len(lists), dtype=np.float64)
            for li in np.unique(lists):
                sel = lists == li
                tab = tables[int(li)]
                scores[sel] = base[int(li)] + tab[
                    np.arange(m), codes[sel]].sum(axis=1)
            # (score desc, id asc) tiebreak: equal ADC scores (identical
            # PQ codes) straddling the cut must not make the refine set
            # depend on row order within the batch (layout invariance)
            ids_np = t[id_col].to_numpy(zero_copy_only=False).astype(
                np.int64)
            top = np.lexsort((ids_np, -scores))[:refine]
            return pa.table({
                id_col: t[id_col].take(pa.array(top)).cast(pa.int64()),
                "adc": pa.array(scores[top], pa.float64()),
            })

        cand = (self.assigned.map_batches(adc_partial,
                                          batch_format="pyarrow")
                .to_pandas())
        if cand.empty:
            return pd.DataFrame({self.id_col: pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        keep = cand.sort_values(["adc", id_col],
                                ascending=[False, True]).head(refine)
        needed = pa.array(sorted(int(x) for x in keep[id_col]), pa.int64())

        def fetch(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t[id_col].cast(pa.int64()),
                                  value_set=needed))
            return t.select([id_col, emb_col])

        rows = self.assigned.map_batches(
            fetch, batch_format="pyarrow").take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        vecs = _norm_rows(np.array([r[emb_col] for r in rows],
                                   dtype=np.float64))
        cos = round_half_away(vecs @ qn, 6)
        out = pd.DataFrame({self.id_col: ids, "cosine": cos})
        return (out.sort_values(["cosine", self.id_col],
                                ascending=[False, True],
                                ignore_index=True).head(k))


def ann_lsh_topk(ds, query_vec: np.ndarray, k: int = 10, dim: int | None = None,
                 n_planes: int = 6, n_tables: int = 16,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 seed: int = 7):
    """Approximate top-k via a transient AnnIndex (single-query
    convenience; build the index once with ``AnnIndex`` for repeated
    queries).

    Returns pandas (id, cosine). Recall measured against brute force in
    tests; the pattern is the 100 TB path (bucket groupby instead of a full
    scan per query). Note: the synthetic benchmark embeddings are uniform
    random — an LSH worst case (neighbors barely closer than random
    points); clustered real embeddings bucket far better at the same L/k.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    if dim is None:
        dim = len(q)
    return AnnIndex(ds, dim, n_planes, n_tables, id_col, emb_col,
                    seed=seed).topk(q, k)
