"""As-of and range joins vs DuckDB's native ASOF/BETWEEN joins."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sides():
    """left = all events; right = sparse per-user 'state changes'."""
    left = duckdb.sql(
        f"SELECT user_id, ts, value FROM '{SF}/events.parquet'").df()
    right = duckdb.sql(
        f"SELECT user_id, ts, value * 2 AS tier FROM "
        f"'{SF}/events.parquet' WHERE event_id % 7 = 0").df()
    return left, right


def _norm(df, cols):
    out = df[cols].copy()
    return out.sort_values(cols, ignore_index=True)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.joins import asof_join

    left, right = _sides()
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="ts", by="user_id").to_pandas()

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    oracle = con.sql("""
        SELECT l.user_id, l.ts, l.value, r.ts AS ts_right, r.tier
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
    """).df()

    cols = ["user_id", "ts", "value", "ts_right", "tier"]
    g = _norm(got, cols)
    o = _norm(oracle, cols)
    assert len(g) == len(o)
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.joins import range_join

    left, right = _sides()
    # right side becomes intervals: [ts, ts + 3 days]
    right = right.copy()
    right["start"] = right["ts"]
    right["end"] = right["ts"] + pd.Timedelta(days=3)
    right = right[["user_id", "start", "end", "tier"]]

    got = range_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="ts", by="user_id", start="start",
                     end="end").to_pandas()

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    oracle = con.sql("""
        SELECT l.user_id, l.ts, l.value, r.start, r."end", r.tier
        FROM l JOIN r ON l.user_id = r.user_id
         AND l.ts BETWEEN r.start AND r."end"
    """).df()

    cols = ["user_id", "ts", "value", "start", "end", "tier"]
    g = _norm(got, cols)
    o = _norm(oracle, cols)
    assert len(g) == len(o) and len(g) > 0
    pd.testing.assert_frame_equal(g, o, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_joins_survive_one_sided_buckets():
    """Regression: buckets holding only right-side rows (sparse/skewed
    key sets) used to emit a zero-column pd.DataFrame(), breaking block
    schema unification. left has 1 key, right has 50 -> ~49 right-only
    buckets."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.joins import (
        asof_join,
        range_join,
    )

    left = pd.DataFrame({
        "user_id": ["only-key"] * 3,
        "ts": pd.to_datetime(["2020-01-02", "2020-01-05", "2020-01-09"]),
        "value": [1.0, 2.0, 3.0],
    })
    right = pd.DataFrame({
        "user_id": ["only-key"] + [f"other-{i}" for i in range(49)],
        "ts": pd.to_datetime(["2020-01-01"] * 50),
        "tier": [float(i) for i in range(50)],
    })

    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="ts", by="user_id").to_pandas()
    assert set(got.columns) == {"user_id", "ts", "value",
                                "ts_right", "tier"}
    assert len(got) == 3 and (got["tier"] == 0.0).all()

    r2 = right.rename(columns={"ts": "start"})
    r2["end"] = r2["start"] + pd.Timedelta(days=30)
    got2 = range_join(rd.from_pandas(left), rd.from_pandas(r2),
                      on="ts", by="user_id", start="start",
                      end="end").to_pandas()
    assert set(got2.columns) == {"user_id", "ts", "value", "start",
                                 "end", "tier"}
    assert len(got2) == 3 and (got2["tier"] == 0.0).all()


@pytest.mark.usefixtures("ray_session")
def test_asof_join_mixed_key_dtypes():
    """Equal join keys arriving as int64 on one side and float64 on the
    other must still meet: the bucket hash runs AFTER the schema-unifying
    cast (str(1) != str(1.0) would otherwise split them silently)."""
    import pandas as pd
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.joins import asof_join

    left = pd.DataFrame({
        "k": pd.array([1, 2, 3], dtype="int64"),
        "ts": pd.to_datetime(["2024-01-02", "2024-01-02", "2024-01-02"]),
    })
    right = pd.DataFrame({
        "k": pd.array([1.0, 2.0, 3.0], dtype="float64"),
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-01"]),
        "price": [10.0, 20.0, 30.0],
    })
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="ts", by="k").to_pandas()
           .sort_values("k", ignore_index=True))
    assert out["price"].notna().all(), "mixed-dtype keys never joined"
    assert list(out["price"]) == [10.0, 20.0, 30.0]


@pytest.mark.usefixtures("ray_session")
def test_range_join_start_column_collision():
    """A left column named like the right's interval column must not be
    read by the containment filter (the merge suffixes the right copy)."""
    import pandas as pd
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.joins import range_join

    left = pd.DataFrame({
        "k": [1, 1],
        "ts": pd.to_datetime(["2024-01-05", "2024-03-05"]),
        # decoy: left's own "start" column, far outside the right interval
        "start": pd.to_datetime(["1990-01-01", "1990-01-01"]),
    })
    right = pd.DataFrame({
        "k": [1],
        "start": pd.to_datetime(["2024-01-01"]),
        "end": pd.to_datetime(["2024-01-31"]),
    })
    out = range_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="ts", by="k", start="start", end="end").to_pandas()
    # only the January ts is inside the RIGHT interval; with the decoy
    # column driving the filter both (or neither) would match
    assert len(out) == 1
    assert out.iloc[0]["ts"] == pd.Timestamp("2024-01-05")
