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
