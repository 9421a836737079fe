"""Distributed spherical k-means + SemDeDup semantic dedup: the
streaming passes must match an independent sequential numpy oracle
(same deterministic KMV init, same Lloyd updates, same greedy sweep)
and be invariant to the block layout."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.functions.hashing import hash64_vec


def _norm(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _clustered_data(n_per=60, n_clusters=4, dim=16, seed=3, noise=0.05):
    """Well-separated clusters: argmax margins dwarf any float drift."""
    rng = np.random.default_rng(seed)
    centers = _norm(rng.normal(size=(n_clusters, dim)))
    rows, ids = [], []
    for c in range(n_clusters):
        pts = centers[c] + noise * rng.normal(size=(n_per, dim))
        rows.append(pts)
        ids.extend(range(c * n_per, (c + 1) * n_per))
    return np.array(ids, dtype=np.int64), np.vstack(rows)


def _ds(ids, X, blocks=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float32())),
    }))
    return ds.repartition(blocks) if blocks else ds


def _seq_kmeans(ids, X, k, iters=10, seed=11, tol=0.0):
    """Independent sequential oracle of kmeans_fit (full-matrix Lloyd)."""
    M = _norm(X.astype(np.float64))
    h = hash64_vec(list(ids), seed=seed).astype(np.int64)
    init_ix = np.lexsort((ids, h))[:k]
    cent = M[init_ix].copy()
    for _ in range(iters):
        a = (M @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            mem = M[a == c]
            if len(mem):
                s = mem.sum(axis=0)
                nn = np.linalg.norm(s)
                if nn > 0:
                    new[c] = s / nn
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift <= tol:
            break
    return cent


def _seq_semantic_dedup(ids, X, cent, threshold):
    """Independent oracle of semantic_dedup's grouped greedy sweep."""
    M = _norm(X.astype(np.float64))
    sims = M @ cent.T
    a = sims.argmax(axis=1)
    csim = sims[np.arange(len(a)), a]
    keep = np.zeros(len(ids), dtype=bool)
    for c in np.unique(a):
        ix = np.flatnonzero(a == c)
        order = ix[np.lexsort((ids[ix], csim[ix]))]
        kept: list[int] = []
        for i in order:
            if kept and float((M[kept] @ M[i]).max()) >= threshold:
                continue
            keep[i] = True
            kept.append(i)
    return a, keep


@pytest.mark.usefixtures("ray_session")
class TestKmeansFit:
    def test_matches_sequential_oracle(self):
        from temporal_knowledge_graphs_ray.stages.kmeans import (
            kmeans_assign, kmeans_fit,
        )

        ids, X = _clustered_data()
        got = kmeans_fit(_ds(ids, X), k=4, iters=8)
        want = _seq_kmeans(ids, X.astype(np.float32).astype(np.float64),
                           k=4, iters=8)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-9)

        # every planted cluster resolves to one centroid
        assigned = kmeans_assign(_ds(ids, X), got).to_pandas()
        assigned = assigned.sort_values("vec_id")
        planted = np.array(sorted(ids)) // 60
        a = assigned["cluster"].to_numpy()
        for p in range(4):
            assert len(np.unique(a[planted == p])) == 1
        assert len(np.unique(a)) == 4

    def test_partition_invariance(self):
        from temporal_knowledge_graphs_ray.stages.kmeans import kmeans_fit

        ids, X = _clustered_data(seed=7)
        c1 = kmeans_fit(_ds(ids, X, blocks=1), k=4, iters=6)
        c13 = kmeans_fit(_ds(ids, X, blocks=13), k=4, iters=6)
        assert np.allclose(c1, c13, atol=1e-9)

    def test_k_exceeds_rows(self):
        from temporal_knowledge_graphs_ray.stages.kmeans import kmeans_fit

        ids, X = _clustered_data(n_per=3, n_clusters=2)
        cent = kmeans_fit(_ds(ids, X), k=50, iters=3)
        assert len(cent) == 6

    def test_empty_raises(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.kmeans import kmeans_fit

        empty = rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32()))}))
        with pytest.raises(ValueError):
            kmeans_fit(empty, k=4)


@pytest.mark.usefixtures("ray_session")
class TestSemanticDedup:
    def test_planted_duplicates(self):
        from temporal_knowledge_graphs_ray.stages.kmeans import (
            semantic_dedup,
        )

        rng = np.random.default_rng(5)
        base = rng.normal(size=(40, 16))
        # 3 near-copies of each of the first 10 rows (cosine ~ 0.999)
        dups = np.vstack([base[i] + 1e-3 * rng.normal(size=16)
                          for i in range(10) for _ in range(3)])
        X = np.vstack([base, dups])
        ids = np.arange(len(X), dtype=np.int64)

        out = semantic_dedup(_ds(ids, X), k=4, threshold=0.95,
                             iters=5).to_pandas()
        assert len(out) == len(X)
        keep = dict(zip(out["vec_id"], out["keep"]))
        # each dup family (original i + copies) keeps exactly one member
        for i in range(10):
            fam = [i] + [40 + 3 * i + j for j in range(3)]
            assert sum(keep[f] for f in fam) == 1, fam
        # distinct base rows (random 16-dim: pairwise cosine << 0.95)
        for i in range(10, 40):
            assert keep[i], i

    def test_matches_sequential_oracle(self):
        from temporal_knowledge_graphs_ray.stages.kmeans import (
            kmeans_fit, semantic_dedup,
        )

        ids, X = _clustered_data(n_per=40, seed=9, noise=0.3)
        # plant near-copies so both verdicts occur at threshold 0.9
        rng = np.random.default_rng(21)
        copies = X[:12] + 1e-3 * rng.normal(size=(12, X.shape[1]))
        X = np.vstack([X, copies])
        ids = np.concatenate([ids, np.arange(1000, 1012, dtype=np.int64)])
        cent = kmeans_fit(_ds(ids, X), k=4, iters=6)
        out = (semantic_dedup(_ds(ids, X, blocks=7), centroids=cent,
                              threshold=0.9)
               .to_pandas().sort_values("vec_id"))
        Xf = X.astype(np.float32).astype(np.float64)
        want_a, want_keep = _seq_semantic_dedup(ids, Xf, cent, 0.9)
        assert list(out["cluster"]) == list(want_a)
        assert list(out["keep"]) == list(want_keep)
        assert bool(out["keep"].any()) and not bool(out["keep"].all())

    def test_cluster_cap_splits(self, caplog):
        from temporal_knowledge_graphs_ray.stages.kmeans import (
            semantic_dedup,
        )

        ids, X = _clustered_data(n_per=50, n_clusters=1, noise=0.01)
        out = semantic_dedup(_ds(ids, X), k=1, threshold=0.99,
                             iters=2, max_cluster_size=10).to_pandas()
        assert len(out) == 50
        # every sub-block keeps at least one row; the cap bounds the
        # quadratic sweep, not correctness of within-block verdicts
        assert out["keep"].sum() >= 5
