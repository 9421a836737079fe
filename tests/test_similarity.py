"""Similarity-search quality: LSH ANN recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_vs_brute_force():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.similarity import (
        ann_lsh_topk,
        knn_brute_force,
    )

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    recalls = []
    for qid in (0, 7, 42):
        q = np.array(
            ds.filter(lambda r, _q=qid: r["vec_id"] == _q).take(1)[0]
            ["embedding"], dtype=np.float64)
        exact = set(knn_brute_force(ds, q, 10).to_pandas()["vec_id"])
        approx = set(ann_lsh_topk(ds, q, 10)["vec_id"])
        recalls.append(len(exact & approx) / len(exact))
    # multi-probe LSH on 500 vecs: recall well above chance; brute force
    # remains the exactness baseline (q:knn_topk has the SQL oracle)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


@pytest.mark.usefixtures("ray_session")
def test_ann_is_subset_quality_ordered():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.similarity import ann_lsh_topk

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    q = np.array(ds.take(1)[0]["embedding"], dtype=np.float64)
    out = ann_lsh_topk(ds, q, 10)
    # scores are sorted desc and the query's own vector ranks first
    assert list(out["cosine"]) == sorted(out["cosine"], reverse=True)
    assert out.iloc[0]["cosine"] == 1.0


class TestAnnIndex:
    def test_persisted_index_reuse_and_saveload(self, ray_session, tmp_path):
        import numpy as np
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.similarity import (
            AnnIndex,
            ann_lsh_topk,
        )

        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = ds.take(3)
        dim = len(rows[0]["embedding"])
        idx = AnnIndex(ds, dim)
        for r in rows:
            q = np.array(r["embedding"], dtype=np.float64)
            fresh = ann_lsh_topk(ds, q, k=10)
            reused = idx.topk(q, k=10)
            assert fresh["vec_id"].tolist() == reused["vec_id"].tolist()
        idx.save(str(tmp_path / "ann_index"))
        loaded = AnnIndex.load(str(tmp_path / "ann_index"), dim)
        q = np.array(rows[0]["embedding"], dtype=np.float64)
        assert (loaded.topk(q, 10)["vec_id"].tolist()
                == idx.topk(q, 10)["vec_id"].tolist())

    def test_topk_many_matches_single(self, ray_session):
        import numpy as np
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.similarity import AnnIndex

        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = ds.take(4)
        dim = len(rows[0]["embedding"])
        idx = AnnIndex(ds, dim)
        qs = np.array([r["embedding"] for r in rows], dtype=np.float64)
        many = idx.topk_many(qs, k=5)
        for qi, r in enumerate(rows):
            single = idx.topk(np.array(r["embedding"], dtype=np.float64),
                              k=5)
            got = many[many["query_ix"] == qi]["vec_id"].tolist()
            assert got == single["vec_id"].tolist(), qi

    def test_topk_many_beyond_int64_mask_width(self, ray_session):
        """ADVICE r2: >= 64 queries used to overflow the int64 query
        bitmask; batches now chunk transparently at 63 per scan."""
        import numpy as np
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.similarity import AnnIndex

        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = ds.take(70)
        dim = len(rows[0]["embedding"])
        idx = AnnIndex(ds, dim)
        qs = np.array([r["embedding"] for r in rows], dtype=np.float64)
        many = idx.topk_many(qs, k=3)  # 70 queries: crosses the 63 limit
        assert set(many["query_ix"]) <= set(range(70))
        # spot-check chunk-boundary queries against single-query scans
        for qi in (0, 62, 63, 69):
            single = idx.topk(qs[qi], k=3)
            got = many[many["query_ix"] == qi]["vec_id"].tolist()
            assert got == single["vec_id"].tolist(), qi


class TestNeardupLsh:
    def test_planted_neardups_found_exactly(self, ray_session):
        """LSH-bucketed near-dup (scale path) finds exactly the pairs the
        exact all-pairs scan finds, on a corpus with PLANTED near-dups."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.functions.hashing import (
            stable_hash64,
        )
        from temporal_knowledge_graphs_ray.stages.similarity import (
            neardup_pairs_cosine,
            neardup_pairs_lsh,
        )

        dim, n_base = 32, 300
        rng = np.random.RandomState(stable_hash64("neardup-fixture")
                                    % (2 ** 32))
        base = rng.standard_normal((n_base, dim))
        rows = list(base)
        # plant 25 near-duplicates: copy + small noise (cosine ~0.97+)
        for i in range(25):
            src = base[i * 7 % n_base]
            rows.append(src + 0.08 * rng.standard_normal(dim))
        tbl = pa.table({
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in rows],
                pa.list_(pa.float32())),
        })
        ds = rd.from_arrow(tbl)
        exact = neardup_pairs_cosine(ds, threshold=0.9,
                                     limit_ids=len(rows))
        approx = neardup_pairs_lsh(ds, threshold=0.9, dim=dim)
        assert len(exact) >= 25
        assert approx[["a", "b"]].values.tolist() == \
            exact[["a", "b"]].values.tolist()
        assert np.allclose(approx["cosine"], exact["cosine"], atol=1e-6)


class TestIvfIndex:
    def _clustered(self, n_clusters=8, per=40, dim=24):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.functions.hashing import (
            stable_hash64,
        )

        rng = np.random.RandomState(stable_hash64("ivf-fixture") % (2**32))
        centers = rng.standard_normal((n_clusters, dim)) * 5
        rows = []
        for c in range(n_clusters):
            for _ in range(per):
                rows.append(centers[c] + 0.3 * rng.standard_normal(dim))
        tbl = pa.table({
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in rows],
                pa.list_(pa.float32())),
        })
        return rd.from_arrow(tbl), dim

    def test_recall_on_clustered_data(self, ray_session):
        import numpy as np

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfIndex,
            knn_brute_force,
        )

        ds, dim = self._clustered()
        idx = IvfIndex(ds, dim, n_lists=8)
        rows = ds.take(6)
        recalls = []
        for r in rows:
            q = np.array(r["embedding"], dtype=np.float64)
            exact = set(knn_brute_force(ds, q, 10).to_pandas()["vec_id"])
            approx = set(idx.topk(q, 10, nprobe=2)["vec_id"])
            recalls.append(len(exact & approx) / len(exact))
        # clustered data: probing 2 of 8 learned lists recovers the top-k
        assert sum(recalls) / len(recalls) >= 0.9, recalls

    def test_deterministic_and_saveload(self, ray_session, tmp_path):
        import numpy as np

        from temporal_knowledge_graphs_ray.stages.similarity import IvfIndex

        ds, dim = self._clustered()
        a = IvfIndex(ds, dim, n_lists=8)
        b = IvfIndex(ds, dim, n_lists=8)
        assert np.array_equal(a.centroids, b.centroids)
        q = np.array(ds.take(1)[0]["embedding"], dtype=np.float64)
        assert a.topk(q, 5)["vec_id"].tolist() == \
            b.topk(q, 5)["vec_id"].tolist()
        a.save(str(tmp_path / "ivf"))
        loaded = IvfIndex.load(str(tmp_path / "ivf"))
        assert loaded.topk(q, 5)["vec_id"].tolist() == \
            a.topk(q, 5)["vec_id"].tolist()

    def test_incremental_add(self, ray_session, tmp_path):
        """Frozen-quantizer growth: train on corpus A, add corpus B —
        queries must equal an index whose CENTROIDS came from A but
        whose lists cover A∪B (one assign pass, no retrain); the
        on-disk append must survive a reload."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.similarity import IvfIndex

        ds, dim = self._clustered()
        n_a = ds.count()
        # increment: same cluster structure, fresh ids
        inc_tbl = ds.take_all()
        rng = np.random.RandomState(7)
        inc = pa.table({
            "vec_id": pa.array(
                [n_a + i for i in range(len(inc_tbl))], pa.int64()),
            "embedding": pa.array(
                [(np.array(r["embedding"], dtype=np.float64)
                  + 0.05 * rng.standard_normal(dim)).astype(
                      "float32").tolist() for r in inc_tbl],
                pa.list_(pa.float32())),
        })
        inc_ds = rd.from_arrow(inc)

        idx = IvfIndex(ds, dim, n_lists=8)
        idx.save(str(tmp_path / "ivf"))
        added = idx.add(inc_ds, save_path=str(tmp_path / "ivf"))
        assert added == len(inc_tbl)

        # reference: same frozen centroids, one assign over the union
        ref = IvfIndex(ds, dim, n_lists=8)
        ref.assigned = ds.union(inc_ds).map_batches(
            ref._assign_stage(), batch_format="pyarrow",
            batch_size=4096).materialize()

        q = np.array(inc_tbl[3]["embedding"], dtype=np.float64)
        got = idx.topk(q, 8, nprobe=3)["vec_id"].tolist()
        want = ref.topk(q, 8, nprobe=3)["vec_id"].tolist()
        assert got == want
        assert any(v >= n_a for v in got)  # increment rows are reachable

        # the appended partitions reload: disk index == in-memory union
        loaded = IvfIndex.load(str(tmp_path / "ivf"))
        assert loaded.assigned.count() == n_a + len(inc_tbl)
        assert loaded.topk(q, 8, nprobe=3)["vec_id"].tolist() == want

    def test_add_requires_trained_index(self, ray_session):
        import pytest as _pytest

        from temporal_knowledge_graphs_ray.stages.similarity import IvfIndex

        idx = IvfIndex(None, 0)
        with _pytest.raises(ValueError, match="no trained"):
            idx.add(None)


class TestIvfPqIndex:
    def _clustered(self, n_clusters=8, per=40, dim=24):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.functions.hashing import (
            stable_hash64,
        )

        rng = np.random.RandomState(
            stable_hash64("ivfpq-fixture") % (2**32))
        centers = rng.standard_normal((n_clusters, dim)) * 5
        rows = []
        for c in range(n_clusters):
            for _ in range(per):
                rows.append(centers[c] + 0.3 * rng.standard_normal(dim))
        tbl = pa.table({
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in rows],
                pa.list_(pa.float32())),
        })
        return rd.from_arrow(tbl), dim

    def test_recall_with_refine_on_clustered_data(self, ray_session):
        import numpy as np

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex,
            knn_brute_force,
        )

        ds, dim = self._clustered()
        idx = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        recalls = []
        for r in ds.take(6):
            q = np.array(r["embedding"], dtype=np.float64)
            exact = set(knn_brute_force(ds, q, 10).to_pandas()["vec_id"])
            approx = set(idx.topk(q, 10, nprobe=2, refine=64)["vec_id"])
            recalls.append(len(exact & approx) / len(exact))
        # ADC narrows, exact refine restores: recall ~1 on clustered data
        assert sum(recalls) / len(recalls) >= 0.9, recalls

    def test_codes_are_m_bytes_and_encoding_layout_invariant(
            self, ray_session):
        import pandas as pd

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex,
        )

        ds, dim = self._clustered()
        a = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        b = IvfPqIndex(ds.repartition(7), dim, n_lists=8, m=8, ks=16)

        def codes(idx) -> pd.DataFrame:
            pdf = idx.assigned.select_columns(
                ["vec_id", "list_id", "code"]).to_pandas()
            return pdf.sort_values("vec_id", ignore_index=True)

        ca, cb = codes(a), codes(b)
        # the compression claim: m uint8 codes per vector
        assert all(len(c) == 8 for c in ca["code"])
        assert ca.equals(cb)

    def test_deterministic_and_saveload(self, ray_session, tmp_path):
        import numpy as np

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex,
        )

        ds, dim = self._clustered()
        a = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        b = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        assert np.array_equal(a.centroids, b.centroids)
        assert np.array_equal(a.codebooks, b.codebooks)
        q = np.array(ds.take(1)[0]["embedding"], dtype=np.float64)
        assert a.topk(q, 5)["vec_id"].tolist() == \
            b.topk(q, 5)["vec_id"].tolist()
        a.save(str(tmp_path / "ivfpq"))
        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex as Cls,
        )

        loaded = Cls.load(str(tmp_path / "ivfpq"))
        assert np.array_equal(loaded.codebooks, a.codebooks)
        assert loaded.topk(q, 5)["vec_id"].tolist() == \
            a.topk(q, 5)["vec_id"].tolist()

    def test_dim_not_divisible_raises(self, ray_session):
        import pytest as _pt

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex,
        )

        ds, dim = self._clustered(dim=22)
        with _pt.raises(ValueError):
            IvfPqIndex(ds, dim, m=8)

    def test_incremental_add(self, ray_session, tmp_path):
        """FAISS-``add`` semantics: centroids AND codebooks frozen, an
        increment is one encode pass; the on-disk append reloads."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.similarity import (
            IvfPqIndex,
        )

        ds, dim = self._clustered()
        n_a = ds.count()
        rows = ds.take_all()
        rng = np.random.RandomState(13)
        inc = pa.table({
            "vec_id": pa.array(
                [n_a + i for i in range(len(rows))], pa.int64()),
            "embedding": pa.array(
                [(np.array(r["embedding"], dtype=np.float64)
                  + 0.05 * rng.standard_normal(dim)).astype(
                      "float32").tolist() for r in rows],
                pa.list_(pa.float32())),
        })
        inc_ds = rd.from_arrow(inc)

        idx = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        idx.save(str(tmp_path / "ivfpq"))
        assert idx.add(inc_ds, save_path=str(tmp_path / "ivfpq")) == \
            len(rows)

        ref = IvfPqIndex(ds, dim, n_lists=8, m=8, ks=16)
        ref.assigned = ds.union(inc_ds).map_batches(
            ref._encode_stage(), batch_format="pyarrow",
            batch_size=4096).materialize()

        q = np.array(rows[5]["embedding"], dtype=np.float64)
        got = idx.topk(q, 8, nprobe=3, refine=64)["vec_id"].tolist()
        want = ref.topk(q, 8, nprobe=3, refine=64)["vec_id"].tolist()
        assert got == want
        assert any(v >= n_a for v in got)

        loaded = IvfPqIndex.load(str(tmp_path / "ivfpq"))
        assert loaded.assigned.count() == n_a + len(rows)
        assert loaded.topk(q, 8, nprobe=3,
                           refine=64)["vec_id"].tolist() == want


@pytest.mark.usefixtures("ray_session")
def test_knn_many_empty_corpus_matches_single_query_contract():
    """Regression: the batched path crashed (KeyError 'qi') on an empty
    corpus while the single-query path returned a typed empty frame."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.similarity import (
        knn_brute_force_many,
    )

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = knn_brute_force_many(empty, np.ones((2, 4)), k=3)
    assert list(out.columns) == ["qi", "vec_id", "cosine"]
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_query_layout_invariant_with_duplicate_vectors():
    """Regression: per-batch ADC top-R had no id tiebreak, so duplicate
    vectors (identical PQ codes -> equal ADC scores) straddling the cut
    made the refine set depend on block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.similarity import IvfPqIndex

    rng = np.random.RandomState(3)
    base = rng.standard_normal((4, 16)) * 4
    rows, ids = [], []
    for i in range(240):
        # heavy duplication: only 12 distinct vectors
        rows.append(base[i % 4] + 0.2 * ((i // 4) % 3))
        ids.append(i)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.astype("float32").tolist() for r in rows],
                              pa.list_(pa.float32()))})
    q = rows[0]

    def topk_ids(blocks):
        ds = rd.from_arrow(tbl).repartition(blocks)
        idx = IvfPqIndex(ds, 16, n_lists=4, m=4, ks=8)
        # refine smaller than the duplicate count forces ties at the cut
        return idx.topk(np.asarray(q, dtype=np.float64), k=10,
                        nprobe=2, refine=16)["vec_id"].tolist()

    assert topk_ids(1) == topk_ids(9)
