"""Dataset profiling + expectation validation (stages/profile.py):
exact fields checked against DuckDB, sketch fields within tolerance,
parallelism invariance of the aggregate tree, and the expectation
report against hand-computed violation counts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestProfileColumns:
    def test_exact_fields_vs_duckdb(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value", "user_id"])
        prof = profile_columns(ds, ["event_type", "value", "user_id"])

        oracle = duckdb.sql(f"""
            SELECT count(*) AS n,
                   count(*) - count(event_type) AS et_nulls,
                   min(event_type) AS et_min, max(event_type) AS et_max,
                   count(DISTINCT event_type) AS et_distinct,
                   avg(value) AS v_mean, stddev_pop(value) AS v_std,
                   min(value) AS v_min, max(value) AS v_max,
                   count(DISTINCT user_id) AS u_distinct
            FROM '{SF}/events.parquet'
        """).fetchone()
        (n, et_nulls, et_min, et_max, et_distinct,
         v_mean, v_std, v_min, v_max, u_distinct) = oracle

        et = prof["event_type"]
        assert et["n"] == n and et["nulls"] == et_nulls
        assert et["min"] == et_min and et["max"] == et_max
        # low-cardinality column: candidate set never overflows -> exact
        assert et["topk_exact"] is True
        assert et["distinct"] == et_distinct

        v = prof["value"]
        assert v["min"] == pytest.approx(v_min)
        assert v["max"] == pytest.approx(v_max)
        assert v["mean"] == pytest.approx(v_mean)
        assert v["std"] == pytest.approx(v_std, rel=1e-9)

        # distinct sketch within HLL tolerance on the higher-card column
        u = prof["user_id"]
        assert abs(u["approx_distinct"] - u_distinct) / u_distinct < 0.05

    def test_topk_matches_duckdb(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type"])
        prof = profile_columns(ds, ["event_type"], topk=3)
        oracle = duckdb.sql(f"""
            SELECT event_type, count(*) AS cnt
            FROM '{SF}/events.parquet'
            WHERE event_type IS NOT NULL
            GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3
        """).fetchall()
        assert prof["event_type"]["topk"] == [[v, c] for v, c in oracle]

    def test_parallelism_invariant_exact_fields(self):
        """The AggregateFnV2 map-combine tree must yield identical exact
        fields (and identical HLL estimates — max-merge is associative)
        at any block layout."""
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        def run(blocks: int) -> dict:
            ds = rd.read_parquet(
                f"{SF}/events.parquet",
                columns=["event_type", "value"],
                override_num_blocks=blocks,
            )
            return profile_columns(ds, ["event_type", "value"])

        a, b = run(1), run(7)
        for col in ("event_type", "value"):
            for field in a[col]:
                if field in ("mean", "std"):
                    # float sums are combine-order-sensitive in the last
                    # bits; everything else must be bit-identical
                    assert a[col][field] == pytest.approx(
                        b[col][field], rel=1e-12), (col, field)
                else:
                    assert a[col][field] == b[col][field], (col, field)

    def test_overflow_flags_not_silently_exact(self):
        """Above the candidate cap the profile must flag topk_exact=False
        and drop the exact-distinct field rather than report a wrong one."""
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        prof = profile_columns(ds, ["event_id"], max_candidates=16)
        e = prof["event_id"]
        assert e["topk_exact"] is False
        assert "distinct" not in e
        # the sketch still answers
        n = duckdb.sql(f"SELECT count(DISTINCT event_id) FROM "
                       f"'{SF}/events.parquet'").fetchone()[0]
        assert abs(e["approx_distinct"] - n) / n < 0.05

    def test_default_columns_skip_nested_and_binary(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        prof = profile_columns(ds)  # embedding is list<float> -> skipped
        assert "embedding" not in prof
        assert prof["vec_id"]["nulls"] == 0


@pytest.mark.usefixtures("ray_session")
class TestValidateExpectations:
    def _ds(self):
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "id": ["a", "b", "c", "d", "e", "f"],
            "score": [0.1, -0.5, 0.7, 1.5, None, 0.2],
            "lang": ["en", "de", "xx", "en", "en", None],
            "url": ["http://x", "http://y", "ftp://z", "http://w",
                    "http://v", "http://u"],
            "key": ["k1", "k2", "k1", "k3", "k4", "k2"],
        })).repartition(3)

    def test_rule_counts_and_examples(self):
        from temporal_knowledge_graphs_ray.stages.profile import (
            validate_expectations,
        )

        rep = validate_expectations(self._ds(), {
            "score": {"not_null": True, "min": 0.0, "max": 1.0},
            "lang": {"in_set": {"en", "de"}},
            "url": {"regex": "http://.*"},
            "key": {"unique": True},
        }, id_col="id")

        assert rep["row_count"] == 6
        assert rep["score.not_null"]["violations"] == 1
        assert rep["score.not_null"]["examples"] == ["e"]
        assert rep["score.min"]["violations"] == 1   # -0.5
        assert rep["score.max"]["violations"] == 1   # 1.5
        # null lang is NOT an in_set violation (not_null is its own rule)
        assert rep["lang.in_set"]["violations"] == 1  # xx
        assert rep["url.regex"]["violations"] == 1    # ftp://z
        # two duplicated keys (k1, k2)
        assert rep["key.unique"]["violations"] == 2
        assert set(rep["key.unique"]["examples"]) == {"k1", "k2"}

    def test_clean_data_zero_violations(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            validate_expectations,
        )

        ds = rd.from_arrow(pa.table({
            "id": ["a", "b"], "v": [1, 2]}))
        rep = validate_expectations(
            ds, {"v": {"not_null": True, "min": 0, "unique": True}},
            id_col="id")
        assert rep["v.not_null"]["violations"] == 0
        assert rep["v.min"]["violations"] == 0
        assert rep["v.unique"]["violations"] == 0

    def test_str_len_and_unknown_rule(self):
        from temporal_knowledge_graphs_ray.stages.profile import (
            validate_expectations,
        )

        rep = validate_expectations(
            self._ds(), {"lang": {"max_len": 1}}, id_col="id")
        assert rep["lang.max_len"]["violations"] == 5  # all non-null langs
        with pytest.raises(ValueError):
            validate_expectations(self._ds(), {"lang": {"nope": 1}},
                                  id_col="id")

    def test_parallelism_invariant(self):
        from temporal_knowledge_graphs_ray.stages.profile import (
            validate_expectations,
        )

        rules = {"score": {"min": 0.0}, "key": {"unique": True}}
        a = validate_expectations(self._ds().repartition(1), rules,
                                  id_col="id")
        b = validate_expectations(self._ds().repartition(5), rules,
                                  id_col="id")
        assert a["score.min"]["violations"] == b["score.min"]["violations"]
        assert (a["key.unique"]["violations"]
                == b["key.unique"]["violations"])


@pytest.mark.usefixtures("ray_session")
class TestSkewReport:
    def test_exact_mode_vs_duckdb(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            skew_report,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
        rep = skew_report(ds, "user_id", topk=5, exact=True)
        n, d, mx, p50, p99 = duckdb.sql(f"""
            SELECT sum(cnt), count(*), max(cnt),
                   quantile_disc(cnt, 0.5), quantile_disc(cnt, 0.99)
            FROM (
              SELECT count(*) AS cnt FROM '{SF}/events.parquet'
              GROUP BY user_id)
        """).fetchone()
        assert rep["rows"] == n and rep["distinct"] == d
        assert rep["max_group"] == mx
        assert rep["p50_group"] == p50 and rep["p99_group"] == p99
        top = duckdb.sql(f"""
            SELECT user_id, count(*) AS cnt FROM '{SF}/events.parquet'
            GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 5
        """).fetchall()
        assert rep["topk"] == [[v, c] for v, c in top]
        assert rep["skew_factor"] == pytest.approx(mx * d / n)

    def test_sketch_mode_streams_and_agrees(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            skew_report,
        )

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type"])
        sk = skew_report(ds, "event_type", topk=3)
        ex = skew_report(ds, "event_type", topk=3, exact=True)
        assert sk["rows"] == ex["rows"]
        # low cardinality: HLL exact-ish, CM candidates exact values
        assert sk["distinct"] == ex["distinct"]
        assert [v for v, _ in sk["topk"]] == [v for v, _ in ex["topk"]]
        # CM counts are provable OVERestimates
        for (v, c_sk), (_, c_ex) in zip(sk["topk"], ex["topk"]):
            assert c_sk >= c_ex
        assert sk["exact"] is False and ex["exact"] is True

    def test_planted_hot_key_flags_skew(self):
        import pandas as pd
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            skew_report,
        )

        hot = pd.DataFrame({"k": ["hub"] * 900 + [f"u{i}" for i in
                                                  range(100)]})
        rep = skew_report(rd.from_pandas(hot).repartition(4), "k")
        assert rep["topk"][0][0] == "hub"
        assert rep["skew_factor"] > 10  # 900 * 101 / 1000 ≈ 91


@pytest.mark.usefixtures("ray_session")
class TestNanKeys:
    def test_nan_counts_merge_across_blocks(self):
        """Regression: NaN hashes by identity on CPython 3.10+, so NaN
        keys from different pickled partials never merged — the exact
        'distinct' overcounted and topk listed nan repeatedly."""
        import math

        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.profile import (
            profile_columns,
        )

        import numpy as np

        # arrow table with GENUINE NaN values (from_pandas would convert
        # NaN to null, which drop_null removes — not the case under test)
        tbl = pa.table({"v": pa.array(np.array(
            [float("nan"), 1.0, float("nan"), 2.0, float("nan"), 1.0]))})
        assert tbl["v"].null_count == 0
        prof = profile_columns(rd.from_arrow(tbl).repartition(3), ["v"])
        p = prof["v"]
        assert p["topk_exact"] is True
        assert p["distinct"] == 3  # {nan, 1.0, 2.0}
        nan_rows = [row for row in p["topk"]
                    if isinstance(row[0], float) and math.isnan(row[0])]
        assert len(nan_rows) == 1 and nan_rows[0][1] == 3
