"""Quantiles: exact_quantiles must equal DuckDB quantile_disc exactly;
ApproxQuantile must be parallelism-invariant, exact when k >= n, and
within the order-statistic error bound for k << n."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_global_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        exact_quantiles,
    )

    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_quantity"])
    got = exact_quantiles(ds, "l_quantity", QS)

    con = duckdb.connect()
    want = con.execute(
        f"SELECT quantile_disc(l_quantity, {QS}) "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert list(got["q"]) == QS
    assert [float(v) for v in got["value"]] == [float(v) for v in want]


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_grouped_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        exact_quantiles,
    )

    ds = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    got = exact_quantiles(ds, "l_quantity", QS, by="l_returnflag")

    con = duckdb.connect()
    want = con.execute(
        f"SELECT l_returnflag, quantile_disc(l_quantity, {QS}) "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    want_rows = [(flag, q, float(v))
                 for flag, vals in want for q, v in zip(QS, vals)]
    got_rows = [(r.l_returnflag, r.q, float(r.value))
                for r in got.itertuples()]
    assert got_rows == want_rows


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_null_semantics_match_duckdb():
    """NULL values are ignored (DuckDB quantile_disc), NULL groups are
    kept (DuckDB GROUP BY); empty input returns an empty typed frame."""
    import pandas as pd
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        exact_quantiles,
    )

    df = pd.DataFrame({
        "g": ["a", "a", "a", None, None, "b"],
        "x": [1.0, 2.0, None, 5.0, None, None],
    })
    con = duckdb.connect()
    con.register("t", df)

    got = exact_quantiles(rd.from_pandas(df), "x", [0.5, 0.9])
    want = con.execute(
        "SELECT quantile_disc(x, [0.5, 0.9]) FROM t").fetchone()[0]
    assert [float(v) for v in got["value"]] == [float(v) for v in want]

    got_g = exact_quantiles(rd.from_pandas(df), "x", [0.5], by="g")
    want_g = con.execute(
        "SELECT g, quantile_disc(x, 0.5) AS v FROM t "
        "WHERE x IS NOT NULL GROUP BY g ORDER BY g NULLS LAST"
    ).fetchall()
    got_rows = [(None if pd.isna(r.g) else r.g, float(r.value))
                for r in got_g.itertuples()]
    assert got_rows == [(g, float(v)) for g, v in want_g]

    # all-null / empty inputs -> empty frame, not IndexError
    empty = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": [None, None]})), "x", [0.5])
    assert len(empty) == 0 and list(empty.columns) == ["q", "value"]


@pytest.mark.usefixtures("ray_session")
def test_approx_quantile_ignores_nan_in_pandas_blocks():
    """NaN (pandas-block null spelling) must be excluded like None, so
    the estimate stays block-format independent."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        ApproxQuantile,
    )

    n = 500
    vals = [float(i) for i in range(n)]
    df_clean = pa.table({"id": [f"r{i}" for i in range(n)], "x": vals})
    import pandas as pd
    df_nan = pd.DataFrame({
        "id": [f"r{i}" for i in range(2 * n)],
        "x": vals + [np.nan] * n,
    })
    agg = ApproxQuantile(on="x", key="id", qs=[0.9, 1.0], k=2 * n)
    got_clean = rd.from_arrow(df_clean).aggregate(agg)["approx_quantile(x)"]
    got_nan = rd.from_pandas(df_nan).aggregate(
        ApproxQuantile(on="x", key="id", qs=[0.9, 1.0],
                       k=2 * n))["approx_quantile(x)"]
    assert got_nan[1.0] == got_clean[1.0] == float(n - 1)
    assert not np.isnan(got_nan[0.9])


@pytest.mark.usefixtures("ray_session")
def test_approx_quantile_exact_when_k_covers_n():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        ApproxQuantile,
    )

    rng = np.random.RandomState(7)
    n = 3000
    vals = rng.lognormal(0, 1, n)
    t = pa.table({"id": [f"r{i}" for i in range(n)], "x": vals})
    ds = rd.from_arrow(t)
    got = ds.aggregate(ApproxQuantile(on="x", key="id", qs=QS, k=n))
    got = got["approx_quantile(x)"]

    srt = np.sort(vals)
    import math
    for q in QS:
        want = srt[max(int(math.ceil(q * n)), 1) - 1]
        assert got[q] == pytest.approx(want, abs=0), q


@pytest.mark.usefixtures("ray_session")
def test_approx_quantile_parallelism_invariant_and_bounded_error():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        ApproxQuantile,
    )

    rng = np.random.RandomState(11)
    n = 50_000
    vals = rng.normal(100, 15, n)
    t = pa.table({"id": [f"r{i}" for i in range(n)], "x": vals})
    k = 4096

    results = []
    for nblocks in (1, 7, 32):
        ds = rd.from_arrow(t).repartition(nblocks)
        agg = ds.aggregate(ApproxQuantile(on="x", key="id",
                                          qs=QS, k=k))
        results.append(agg["approx_quantile(x)"])
    assert results[0] == results[1] == results[2], \
        "bottom-k sample must be identical at any parallelism"

    # error bound: sample quantile vs population quantile within
    # ~4 * sigma_rank in VALUE space (normal density at the quantile)
    srt = np.sort(vals)
    for q in QS:
        got = results[0][q]
        want = np.quantile(vals, q)
        # convert rank error to value error via the empirical cdf width
        dr = 4.0 * np.sqrt(q * (1 - q) / k)
        lo = srt[max(int((q - dr) * n), 0)]
        hi = srt[min(int((q + dr) * n), n - 1)]
        assert lo <= got <= hi, (q, got, want, lo, hi)


@pytest.mark.usefixtures("ray_session")
def test_approx_quantile_grouped():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.quantiles import (
        ApproxQuantile,
    )

    n = 2000
    t = pa.table({
        "id": [f"r{i}" for i in range(n)],
        "g": ["a" if i % 2 else "b" for i in range(n)],
        "x": [float(i) for i in range(n)],
    })
    ds = rd.from_arrow(t)
    out = (ds.groupby("g")
           .aggregate(ApproxQuantile(on="x", key="id", qs=[0.5], k=n))
           .to_pandas().sort_values("g", ignore_index=True))
    import math
    for _, row in out.iterrows():
        sub = sorted(float(i) for i in range(n)
                     if ("a" if i % 2 else "b") == row["g"])
        want = sub[max(int(math.ceil(0.5 * len(sub))), 1) - 1]
        assert row["approx_quantile(x)"][0.5] == want
