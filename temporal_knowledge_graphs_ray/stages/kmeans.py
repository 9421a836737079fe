"""Distributed spherical k-means + SemDeDup-style semantic dedup
(scale additions — the reference has no clustering surface; its nearest
analogue is the Neo4j vector index, schema.py:154-198. Both operators
here follow the public SemDeDup recipe [Abbas et al. 2023]: cluster the
embedding space, then prune near-duplicates WITHIN each cluster so the
quadratic step never sees the whole corpus).

Contrast with ``similarity.IvfIndex``: IVF trains its coarse quantizer
on a bounded driver-side sample (the classic index recipe). ``kmeans_fit``
is the full-corpus counterpart — every Lloyd iteration is one streaming
``map_batches`` pass with a map-side per-cluster combine, so the shuffle
carries at most (blocks x k) partial rows and the driver only ever holds
the (k x dim) centroid matrix it re-broadcasts via ``ray.put``.

Determinism: init is the k rows with the smallest ``hash64_vec(id)``
(KMV bottom-k — partition-layout-invariant), iteration count is fixed
unless the centroid shift undercuts ``tol``. Output is bit-identical for
a fixed block layout; across different layouts per-cluster float sums
reassociate, so invariance is numeric (~1e-12), not bit-level — the
tests pin assignments exactly and centroids to 1e-9.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_vec
from .similarity import _norm_rows, _to_matrix

logger = logging.getLogger(__name__)


def _init_centroids(ds, k: int, id_col: str, emb_col: str,
                    seed: int) -> np.ndarray:
    """k seed rows by smallest hash64_vec(id) — a deterministic uniform
    sample that no block layout can change (same KMV construction as
    ``sketches.ApproxQuantile``'s row sample)."""
    from .topk import topk_rows

    def hashed(t: pa.Table) -> pa.Table:
        h = hash64_vec(t[id_col].to_pylist(), seed=seed)
        return pa.table({
            "h": pa.array(h.astype(np.int64)),
            "id": t[id_col],
            "emb": t[emb_col],
        })

    rows = topk_rows(ds.select_columns([id_col, emb_col])
                     .map_batches(hashed, batch_format="pyarrow"),
                     keys=["h", "id"], descending=[False, False],
                     k=k).take_all()
    if not rows:
        raise ValueError("kmeans_fit: input dataset is empty")
    return _norm_rows(np.array([r["emb"] for r in rows],
                               dtype=np.float64))


def kmeans_fit(ds, k: int, id_col: str = "vec_id",
               emb_col: str = "embedding", iters: int = 10,
               seed: int = 11, tol: float = 0.0) -> np.ndarray:
    """Full-corpus spherical k-means: (k_eff x dim) unit centroids.

    Per Lloyd iteration: ONE ``map_batches`` pass assigns rows to the
    broadcast centroids and combines per-cluster (sum, n) partials
    map-side, then a tiny ``groupby(cluster)`` reduces blocks x k_eff
    partial rows to k_eff — the corpus itself is never shuffled and
    never materialized. Empty clusters keep their previous centroid.
    """
    import ray

    # materialize the projection ONCE: _init_centroids plus every Lloyd
    # iteration consumes it, and a lazy plan would re-execute the whole
    # upstream lineage per pass (the waste class connected_components'
    # pairs materialize exists to avoid)
    proj = ds.select_columns([id_col, emb_col]).materialize()
    cent = _init_centroids(proj, k, id_col, emb_col, seed)
    k_eff = len(cent)
    dim = cent.shape[1]
    emb = proj.select_columns([emb_col])

    # Per-iteration reduce strategy: the map side emits at most
    # blocks x k_eff partial rows of dim floats. When that fits the
    # driver comfortably (<= ~256 MB), skip the grouped shuffle and
    # np.add.at the partials on the driver — five shuffle barriers
    # collapse into five map-only passes. Past the gate (many blocks x
    # large k x wide embeddings) keep the distributed groupby reduce.
    n_blocks = max(proj.num_blocks(), 1)
    driver_reduce = n_blocks * k_eff * dim * 8 <= 256 * 2**20

    for it in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            import ray as _ray

            c = _ray.get(_ref)
            m = _norm_rows(_to_matrix(t[emb_col]))
            assign = (m @ c.T).argmax(axis=1)
            uniq, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(uniq), c.shape[1]))
            np.add.at(sums, inv, m)
            n = np.bincount(inv).astype(np.int64)
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int32)),
                "psum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "n": pa.array(n),
            })

        partials = emb.map_batches(partial, batch_format="pyarrow")
        new = cent.copy()
        if driver_reduce:
            pdf = partials.to_pandas()
            if len(pdf):
                cl = pdf["cluster"].to_numpy(dtype=np.int64)
                ps = np.stack([np.asarray(v, dtype=np.float64)
                               for v in pdf["psum"]])
                sums = np.zeros((k_eff, dim))
                np.add.at(sums, cl, ps)
                norms = np.linalg.norm(sums, axis=1)
                nz = norms > 0
                new[nz] = sums[nz] / norms[nz, None]
        else:
            def reduce_sum(g: pd.DataFrame) -> pd.DataFrame:
                s = np.sum(np.stack([np.asarray(v, dtype=np.float64)
                                     for v in g["psum"]]), axis=0)
                return pd.DataFrame({
                    "cluster": [np.int32(g["cluster"].iloc[0])],
                    "psum": [s.tolist()],
                    "n": [np.int64(g["n"].sum())],
                })

            agg = (partials.groupby("cluster")
                   .map_groups(reduce_sum, batch_format="pandas")
                   .take_all())
            for r in agg:
                s = np.asarray(r["psum"], dtype=np.float64)
                norm = np.linalg.norm(s)
                if norm > 0:
                    new[int(r["cluster"])] = s / norm
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift <= tol:
            logger.info("kmeans_fit: converged after %d iters "
                        "(shift=%.3g)", it + 1, shift)
            break
    return cent


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  cluster_col: str = "cluster",
                  sim_col: str = "centroid_sim"):
    """Append (cluster:int32, centroid_sim:float64) per row — argmax
    cosine against the broadcast centroid matrix, one streaming pass."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(cent_ref)
        m = _norm_rows(_to_matrix(t[emb_col]))
        sims = m @ c.T
        a = sims.argmax(axis=1)
        return (t.append_column(cluster_col,
                                pa.array(a.astype(np.int32)))
                .append_column(sim_col,
                               pa.array(sims[np.arange(len(a)), a])))

    return ds.map_batches(assign, batch_format="pyarrow")


def _greedy_verdicts(ids: np.ndarray, m: np.ndarray, csim: np.ndarray,
                     threshold: float):
    """Deterministic within-cluster SemDeDup sweep: visit rows in
    (centroid_sim ASC, id ASC) order — the paper keeps the LOW
    centroid-similarity (most informative) example of each duplicate
    group — and keep a row iff its max cosine to every already-kept row
    is below ``threshold``. Returns (keep bool, max_kept_sim) aligned to
    the input order."""
    order = np.lexsort((ids, csim))
    n, dim = m.shape
    kept_buf = np.empty((n, dim))
    n_kept = 0
    keep = np.zeros(n, dtype=bool)
    max_sim = np.full(n, -1.0)
    for i in order:
        if n_kept:
            s = float((kept_buf[:n_kept] @ m[i]).max())
            max_sim[i] = s
            if s >= threshold:
                continue
        keep[i] = True
        kept_buf[n_kept] = m[i]
        n_kept += 1
    return keep, max_sim


def semantic_dedup(ds, k: int = 64, threshold: float = 0.95,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   centroids: np.ndarray | None = None,
                   iters: int = 10, seed: int = 11,
                   max_cluster_size: int = 8192):
    """SemDeDup verdicts: Dataset of (id, cluster, centroid_sim, keep,
    max_kept_sim) — ``keep=False`` rows are semantic near-duplicates of
    a kept row in their cluster (cosine >= threshold).

    The cluster IS the parallelism unit (k groups, one quadratic-bounded
    task each); clusters larger than ``max_cluster_size`` are sub-split
    by id hash so no task exceeds the cap — cross-sub-block duplicates
    survive in that (logged) degraded case, the same bounded-recall
    tradeoff ``canonicalize`` applies to hot blocks. The corpus streams
    through exactly two passes (assign + grouped sweep); only the
    (k x dim) centroid matrix ever sits on the driver.
    """
    proj = ds.select_columns([id_col, emb_col]).materialize()
    if centroids is None:
        centroids = kmeans_fit(proj, k, id_col=id_col, emb_col=emb_col,
                               iters=iters, seed=seed)

    assigned = kmeans_assign(proj, centroids, emb_col=emb_col)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        m = _norm_rows(np.array([np.asarray(v, dtype=np.float64)
                                 for v in g[emb_col]]))
        csim = g["centroid_sim"].to_numpy(dtype=np.float64)
        n = len(g)
        if n > max_cluster_size:
            n_sub = -(-n // max_cluster_size)
            logger.warning(
                "semantic_dedup: cluster %s has %d rows > cap %d; "
                "splitting into %d hash sub-blocks (cross-sub-block "
                "duplicates are not compared)",
                g["cluster"].iloc[0], n, max_cluster_size, n_sub)
            sub = hash64_vec(list(ids)) % np.uint64(n_sub)
        else:
            sub = np.zeros(n, dtype=np.uint64)
        keep = np.zeros(n, dtype=bool)
        max_sim = np.full(n, -1.0)
        for s in np.unique(sub):
            ix = np.flatnonzero(sub == s)
            keep[ix], max_sim[ix] = _greedy_verdicts(
                ids[ix], m[ix], csim[ix], threshold)
        return pd.DataFrame({
            id_col: ids,
            "cluster": g["cluster"].to_numpy(dtype=np.int32),
            "centroid_sim": csim,
            "keep": keep,
            "max_kept_sim": max_sim,
        })

    return assigned.groupby("cluster").map_groups(
        sweep, batch_format="pandas")
