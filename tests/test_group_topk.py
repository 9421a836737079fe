"""Per-group top-k: exact DuckDB QUALIFY row_number parity, mixed
ascending/descending keys, groups smaller than n, layout invariance."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


def _oracle(n: int) -> pd.DataFrame:
    return duckdb.sql(f"""
        SELECT source, doc_id, n_chars FROM read_parquet('{SF}')
        QUALIFY row_number() OVER (
          PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) <= {n}
        ORDER BY source, n_chars DESC, doc_id
    """).df()


def _got(n: int, parts: int) -> pd.DataFrame:
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.topk import group_topk_rows

    ds = rd.read_parquet(SF, columns=["source", "doc_id", "n_chars"]) \
        .repartition(parts)
    out = group_topk_rows(ds, "source", ["n_chars", "doc_id"],
                          [True, False], n).to_pandas()
    return out.sort_values(["source", "n_chars", "doc_id"],
                           ascending=[True, False, True],
                           ignore_index=True)[["source", "doc_id",
                                               "n_chars"]]


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_qualify():
    got = _got(3, parts=5)
    want = _oracle(3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 60  # 20 sources x 3, non-vacuous


@pytest.mark.usefixtures("ray_session")
def test_groups_smaller_than_n_and_layouts():
    a = _got(1000, parts=1)   # n > group size: whole table survives
    b = _got(1000, parts=13)
    want = _oracle(1000)
    pd.testing.assert_frame_equal(a, want, check_dtype=False)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_mixed_direction_keys():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.topk import group_topk_rows

    ds = rd.read_parquet(SF, columns=["source", "doc_id", "n_chars"])
    got = group_topk_rows(ds, "source", ["n_chars", "doc_id"],
                          [False, True], 2).to_pandas()
    want = duckdb.sql(f"""
        SELECT source, doc_id, n_chars FROM read_parquet('{SF}')
        QUALIFY row_number() OVER (
          PARTITION BY source ORDER BY n_chars ASC, doc_id DESC) <= 2
    """).df()
    key = lambda d: d.sort_values(["source", "doc_id"],
                                  ignore_index=True)
    pd.testing.assert_frame_equal(
        key(got)[["source", "doc_id", "n_chars"]],
        key(want), check_dtype=False)
