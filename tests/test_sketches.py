"""Distributed sketch aggregates: HLL distinct and Count-Min heavy
hitters — accuracy vs exact answers, determinism, parallelism
invariance (merge associativity)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestHll:
    def test_global_distinct_within_tolerance(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            HllDistinct,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        got = ds.aggregate(HllDistinct(on="user_id", alias_name="d"))["d"]
        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
        ).fetchone()[0]
        assert abs(got - exact) / exact < 0.05, (got, exact)

    def test_high_cardinality_no_saturation(self):
        """Regression: 63-bit hashes indexed with `h >> (64-p)` touch only
        half the registers, saturating the estimate at ~m*ln2 (~2839 for
        p=12) regardless of true cardinality. Exercise the sketch kernels
        directly at cardinality >> 2.5*m."""
        import pyarrow as pa

        from temporal_knowledge_graphs_ray.stages.sketches import (
            HllDistinct,
        )

        import numpy as np

        agg = HllDistinct(on="v", alias_name="d", p=12)
        regs = np.zeros(1 << 12, dtype=np.int8)
        for lo in range(0, 100_000, 10_000):
            block = pa.table({"v": [f"item-{i}" for i in
                                    range(lo, lo + 10_000)]})
            regs = agg.combine(regs, agg.aggregate_block(block))
        est = agg.finalize(regs)
        assert abs(est - 100_000) / 100_000 < 0.06, est

    def test_grouped_and_parallelism_invariant(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            HllDistinct,
        )

        def run(blocks):
            ds = rd.read_parquet(
                f"{SF}/events.parquet",
                columns=["event_type", "user_id"],
                override_num_blocks=blocks)
            out = (ds.groupby("event_type")
                   .aggregate(HllDistinct(on="user_id", alias_name="d"))
                   .to_pandas().sort_values("event_type",
                                            ignore_index=True))
            return out

        a, b = run(2), run(16)
        # merge is max-of-registers: identical sketches at any parallelism
        assert a.values.tolist() == b.values.tolist()
        exact = dict(duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"'{SF}/events.parquet' GROUP BY event_type").fetchall())
        for _, row in a.iterrows():
            e = exact[row["event_type"]]
            assert abs(row["d"] - e) / e < 0.08, (row["event_type"],
                                                 row["d"], e)


@pytest.mark.usefixtures("ray_session")
class TestCountMin:
    def test_topk_matches_exact_on_low_cardinality(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            CountMinTopK,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type"],
                             override_num_blocks=8)
        got = ds.aggregate(CountMinTopK(on="event_type", k=5,
                                        alias_name="top"))["top"]
        exact = duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM '{SF}/events.parquet' "
            "GROUP BY event_type ORDER BY 2 DESC, 1 LIMIT 5").fetchall()
        # few distinct keys vs width 2048: estimates collide rarely ->
        # exact counts and ordering
        assert [(v, c) for v, c in got] == [(v, c) for v, c in exact]

    def test_depth_above_six_works(self):
        """Regression: row multipliers were a fixed 6-entry table, so
        depth=7+ (invited by the depth=ceil(ln(1/delta)) formula) built a
        truncated row matrix and crashed. Rows now derive per depth."""
        import pyarrow as pa

        from temporal_knowledge_graphs_ray.stages.sketches import (
            CountMinTopK,
        )

        agg = CountMinTopK(on="v", k=3, width=512, depth=8)
        block = pa.table({"v": ["a"] * 50 + ["b"] * 30 + ["c"] * 5})
        counters, cands = agg.aggregate_block(block)
        assert counters.shape == (8, 512)
        top = agg.finalize((counters, cands))
        assert top[0] == ["a", 50] and top[1] == ["b", 30]

    def test_estimates_never_undercount(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            CountMinTopK,
        )

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["lang"], override_num_blocks=4)
        got = ds.aggregate(CountMinTopK(on="lang", k=10,
                                        alias_name="top"))["top"]
        exact = dict(duckdb.sql(
            f"SELECT lang, COUNT(*) FROM '{SF}/documents.parquet' "
            "GROUP BY lang").fetchall())
        for v, c in got:
            assert c >= exact[v]


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_matches_sql_oracle():
    """q_hopping_window vs a DuckDB unnest-range oracle (window width
    3600s, hop 900s -> every event in 4 overlapping windows)."""
    from temporal_knowledge_graphs_ray.pipelines.queries import (
        q_hopping_window,
    )

    got = q_hopping_window(SF)
    oracle = duckdb.sql(f"""
        WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us, value
                   FROM '{SF}/events.parquet'),
             x AS (SELECT us // 900000000 - o AS window_id, value
                   FROM e, unnest([0, 1, 2, 3]) AS t(o)
                   WHERE us // 900000000 - o >= 0)
        SELECT window_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM x GROUP BY window_id ORDER BY window_id
    """).df()
    assert got["window_id"].tolist() == oracle["window_id"].tolist()
    assert got["n"].tolist() == oracle["n"].tolist()
    assert got["sum_value"].tolist() == oracle["sum_value"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestBottomKAndSplit:
    def test_bottomk_parallelism_invariant_and_estimate(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            BottomKSample,
        )

        def run(blocks):
            ds = rd.read_parquet(f"{SF}/events.parquet",
                                 columns=["user_id"],
                                 override_num_blocks=blocks)
            return ds.aggregate(BottomKSample(on="user_id", k=32,
                                              alias_name="s"))["s"]

        a, b = run(2), run(16)
        assert a["sample"] == b["sample"]
        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
        ).fetchone()[0]
        # KMV with k=32: loose tolerance, deterministic either way
        assert abs(a["distinct_estimate"] - exact) / exact < 0.5

    def test_split_is_partition_and_deterministic(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.sketches import (
            train_val_split,
        )

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        tr1, va1 = train_val_split(ds, 0.2, "doc_id")
        tr2, va2 = train_val_split(ds, 0.2, "doc_id")
        t1 = set(tr1.to_pandas()["doc_id"])
        v1 = set(va1.to_pandas()["doc_id"])
        assert t1 == set(tr2.to_pandas()["doc_id"])
        assert v1 == set(va2.to_pandas()["doc_id"])
        assert not (t1 & v1)
        assert len(t1) + len(v1) == ds.count()
        assert 0.1 < len(v1) / ds.count() < 0.3
