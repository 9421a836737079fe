"""Vocabulary builder: exact DuckDB parity for counts, ordering and
token ids; min_count pruning; layout invariance."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


def _oracle(max_size: int, min_count: int = 1) -> pd.DataFrame:
    return duckdb.sql(f"""
        WITH c AS (
          SELECT term, count(*)::BIGINT AS n FROM (
            SELECT unnest(regexp_extract_all(lower(text),
                                             '[a-z0-9]+')) AS term
            FROM read_parquet('{SF}'))
          GROUP BY term HAVING count(*) >= {min_count})
        SELECT CAST(row_number() OVER (ORDER BY n DESC, term) - 1
                    AS BIGINT) AS token_id, term, n
        FROM c ORDER BY n DESC, term LIMIT {max_size}
    """).df()


@pytest.mark.usefixtures("ray_session")
def test_vocab_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.vocab import build_vocab

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    got = build_vocab(docs, max_size=20)
    want = _oracle(20)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # non-vacuous truncation: the synthetic corpus has 31 distinct terms
    assert len(got) == 20


@pytest.mark.usefixtures("ray_session")
def test_min_count_and_full_vocab():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.vocab import build_vocab

    docs = rd.read_parquet(SF, columns=["text"])
    got = build_vocab(docs, max_size=10_000_000, min_count=50)
    want = _oracle(10_000_000, min_count=50)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n"] >= 50).all() and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_layout_invariance():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.vocab import build_vocab

    a = build_vocab(rd.read_parquet(SF, columns=["text"]).repartition(1),
                    max_size=100, num_buckets=4)
    b = build_vocab(rd.read_parquet(SF, columns=["text"]).repartition(11),
                    max_size=100, num_buckets=32)
    pd.testing.assert_frame_equal(a, b)
