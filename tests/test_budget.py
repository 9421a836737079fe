"""Budget-bounded best-first selection: exact DuckDB running-sum
QUALIFY parity (desc and asc order, ties resolved by id), budget
edge cases, forced multi-level histogram narrowing, and the
score-spike guard."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


def _oracle(budget: float, desc: bool = True,
            score: str = "n_chars") -> list[int]:
    d = "DESC" if desc else "ASC"
    return sorted(r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{SF}')
        QUALIFY SUM(n_chars) OVER (ORDER BY {score} {d}, doc_id
                                   ROWS UNBOUNDED PRECEDING) <= {budget}
    """).fetchall())


def _got(budget: float, desc: bool = True, score: str = "n_chars",
         **kw) -> list[int]:
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.budget import (
        take_until_budget,
    )

    cols = list(dict.fromkeys(["doc_id", "n_chars", score]))
    ds = rd.read_parquet(SF, columns=cols).repartition(7)
    out = take_until_budget(ds, score, "n_chars", budget, "doc_id",
                            descending=desc, **kw)
    df = out.to_pandas()
    return sorted(df["doc_id"].tolist()) if len(df) else []


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("budget", [5_000, 50_000, 123_456])
def test_matches_duckdb_desc(budget):
    got = _got(budget)
    want = _oracle(budget)
    assert got == want and len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_asc():
    got = _got(30_000, desc=False)
    assert got == _oracle(30_000, desc=False)


@pytest.mark.usefixtures("ray_session")
def test_budget_edges():
    total = duckdb.sql(
        f"SELECT sum(n_chars) FROM read_parquet('{SF}')").fetchone()[0]
    assert _got(float(total)) == _oracle(total)          # all rows fit
    assert len(_got(float(total))) == 500
    assert _got(0.0) == []                               # nothing fits


@pytest.mark.usefixtures("ray_session")
def test_forced_multilevel_narrowing():
    # unique integer scores + tiny refine_cap force several histogram
    # narrowing levels before the exact slice
    got = _got(40_000, score="doc_id", num_bins=8, refine_cap=20)
    assert got == _oracle(40_000, score="doc_id")


@pytest.mark.usefixtures("ray_session")
def test_score_spike_guard():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.budget import (
        take_until_budget,
    )

    rows = [{"doc_id": i, "s": 1.0, "w": 10} for i in range(100)]
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="spike"):
        take_until_budget(ds, "s", "w", 500, "doc_id",
                          refine_cap=10).materialize()
    # same spike fits when refine_cap covers it: exact prefix by id
    out = take_until_budget(ds, "s", "w", 505, "doc_id",
                            refine_cap=100).to_pandas()
    assert sorted(out["doc_id"].tolist()) == list(range(50))
