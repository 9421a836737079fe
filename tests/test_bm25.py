"""BM25 ranking: the pruned-scan scoring must equal a DuckDB CTE
computing the same Okapi/Lucene formula over regexp_extract_all
tokens (scores compared at 6 decimals, the house float rule), survive
save/load, and stay deterministic across block layouts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"
K1, B = 1.2, 0.75


def _oracle(query_terms: list[str], k1: float = K1, b: float = B):
    terms = sorted({t.lower() for t in query_terms})
    inlist = ",".join(f"'{t}'" for t in terms)
    con = duckdb.connect()
    return con.execute(f"""
        WITH toks AS (
          SELECT doc_id AS id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
          FROM read_parquet('{SF}')),
        lens AS (SELECT id, len(ts) AS dl FROM toks),
        stats AS (SELECT count(*)::DOUBLE AS n,
                         sum(dl)::DOUBLE / count(*) AS avgdl FROM lens),
        posting AS (SELECT id, unnest(ts) AS term FROM toks),
        tf AS (SELECT id, term, count(*)::DOUBLE AS tf
               FROM posting WHERE term IN ({inlist}) GROUP BY id, term),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.id,
                 sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * lens.dl
                                        / stats.avgdl))) AS score
          FROM tf
          JOIN df USING (term)
          JOIN lens USING (id), stats
          GROUP BY tf.id)
        SELECT id, round(score, 6) AS score
        FROM scored ORDER BY id
    """).df()


@pytest.fixture(scope="module")
def index(ray_session):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.bm25 import Bm25Index

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    return Bm25Index(docs, text_col="text", id_col="doc_id",
                     num_buckets=16)


def _got_all(index, terms):
    got = index.score(terms, k=10_000)
    got["score"] = got["score"].round(6)
    return got.sort_values("id" if "id" in got else "doc_id",
                           ignore_index=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("terms", [
    ["the", "scan"],
    ["merge", "join", "window"],
    ["zzzznotaterm"],
])
def test_scores_match_duckdb(index, terms):
    got = index.score(terms, k=10_000).rename(columns={"doc_id": "id"})
    got["score"] = got["score"].round(6)
    want = _oracle(terms)
    if terms != ["zzzznotaterm"]:
        assert len(want) > 0  # non-vacuous: these terms exist in corpus
    got = got.sort_values("id", ignore_index=True)
    want = want.sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_topk_ranking_matches_oracle(index):
    terms = ["query", "group"]
    got = index.score(terms, k=5).rename(columns={"doc_id": "id"})
    want = _oracle(terms).sort_values(
        ["score", "id"], ascending=[False, True], ignore_index=True)
    assert len(got) == min(5, len(want))
    assert got["id"].tolist() == want["id"].head(len(got)).tolist()
    assert got["score"].round(6).tolist() == \
        want["score"].head(len(got)).tolist()


@pytest.mark.usefixtures("ray_session")
def test_save_load_roundtrip(index, tmp_path):
    from temporal_knowledge_graphs_ray.stages.bm25 import Bm25Index

    path = str(tmp_path / "bm25_idx")
    index.save(path)
    loaded = Bm25Index.load(path)
    assert loaded.n_docs == index.n_docs
    assert loaded.avgdl == pytest.approx(index.avgdl)
    terms = ["the", "scan"]
    a = index.score(terms, k=20)
    b = loaded.score(terms, k=20)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_layout_invariance(ray_session):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.bm25 import Bm25Index

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    a = Bm25Index(docs.repartition(1), id_col="doc_id",
                  num_buckets=8).score(["scan", "sort"], k=50)
    b = Bm25Index(docs.repartition(13), id_col="doc_id",
                  num_buckets=32).score(["scan", "sort"], k=50)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_score_many_equals_per_query(index):
    queries = ["sort merge join", "scan column", "zzzznotaterm",
               "the query group"]
    batch = index.score_many(queries, k=7)
    assert list(batch.columns) == ["qi", "doc_id", "score"]
    for qi, q in enumerate(queries):
        got = batch[batch["qi"] == qi][["doc_id", "score"]] \
            .reset_index(drop=True)
        want = index.score([q], k=7).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (batch["qi"] == 2).sum() == 0  # no-match query: no rows
