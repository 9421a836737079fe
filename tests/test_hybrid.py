"""Hybrid retrieval: BM25 + dense legs fused with RRF must equal a
sequential oracle (DuckDB BM25 CTE for the sparse leg, numpy cosine
for the dense leg, a from-scratch RRF sum), stay layout-invariant,
and reuse prebuilt legs identically."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"
K1, B = 1.2, 0.75
QUERY = "sort merge join window"
N_EACH = 25
C = 60


def _sparse_oracle(query: str, n: int) -> list[int]:
    import re

    terms = sorted(set(re.findall(r"[a-z0-9]+", query.lower())))
    inlist = ",".join(f"'{t}'" for t in terms)
    con = duckdb.connect()
    return [r[0] for r in con.execute(f"""
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
                     * tf.tf * ({K1} + 1)
                     / (tf.tf + {K1} * (1 - {B} + {B} * lens.dl
                                        / stats.avgdl))) AS score
          FROM tf JOIN df USING (term) JOIN lens USING (id), stats
          GROUP BY tf.id)
        SELECT id FROM scored ORDER BY score DESC, id LIMIT {n}
    """).fetchall()]


def _dense_oracle(query: str, n: int) -> list[int]:
    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG as cfg
    from temporal_knowledge_graphs_ray.functions.embed import embed_texts
    from temporal_knowledge_graphs_ray.functions.rounding import (
        round_half_away,
    )

    t = pq.read_table(SF, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    m = embed_texts([x or "" for x in t["text"].to_pylist()],
                    cfg.embed_dim, cfg.embed_ngram).astype(np.float64)
    q = embed_texts([query], cfg.embed_dim, cfg.embed_ngram)[0] \
        .astype(np.float64)
    denom = np.linalg.norm(m, axis=1) * float(np.linalg.norm(q))
    denom[denom == 0] = np.inf
    cos = round_half_away(m @ q / denom, 6)
    df = pd.DataFrame({"id": ids, "cos": cos}).sort_values(
        ["cos", "id"], ascending=[False, True])
    return df["id"].head(n).tolist()


def _rrf_oracle(lists: list[list[int]], c: int) -> pd.DataFrame:
    scores: dict[int, float] = {}
    for ids in lists:
        for rank, d in enumerate(ids, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (c + rank)
    out = pd.DataFrame({"doc_id": list(scores),
                        "rrf_score": [round(v, 6)
                                      for v in scores.values()]})
    return out.sort_values(["rrf_score", "doc_id"],
                           ascending=[False, True], ignore_index=True)


@pytest.mark.usefixtures("ray_session")
def test_hybrid_matches_sequential_oracle():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.hybrid import hybrid_search

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    got = hybrid_search(docs, QUERY, k=10, n_each=N_EACH, c=C)

    want = _rrf_oracle([_sparse_oracle(QUERY, N_EACH),
                        _dense_oracle(QUERY, N_EACH)], C).head(10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rrf_score"].tolist() == \
        pytest.approx(want["rrf_score"].tolist(), abs=1e-6)
    # rank columns are consistent: every fused row came from >=1 leg
    assert ((got["rank_bm25"] > 0) | (got["rank_dense"] > 0)).all()
    # both legs are non-vacuous for this query
    assert (got["rank_bm25"] > 0).any() and (got["rank_dense"] > 0).any()


@pytest.mark.usefixtures("ray_session")
def test_layout_invariance_and_prebuilt_legs():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.bm25 import Bm25Index
    from temporal_knowledge_graphs_ray.stages.embed import embed_documents
    from temporal_knowledge_graphs_ray.stages.hybrid import hybrid_search

    a_docs = rd.read_parquet(SF, columns=["doc_id", "text"]).repartition(1)
    b_docs = rd.read_parquet(SF, columns=["doc_id", "text"]).repartition(9)
    a = hybrid_search(a_docs, QUERY, k=15, n_each=N_EACH)
    idx = Bm25Index(b_docs, id_col="doc_id", num_buckets=32)
    emb = embed_documents(b_docs, text_col="text").materialize()
    b = hybrid_search(b_docs, QUERY, k=15, n_each=N_EACH,
                      bm25_index=idx, embedded=emb)
    pd.testing.assert_frame_equal(a, b)


def test_rrf_fuse_unit():
    from temporal_knowledge_graphs_ray.stages.hybrid import rrf_fuse

    out = rrf_fuse({"a": [1, 2, 3], "b": [3, 1]}, c=10, id_name="doc_id")
    want = {1: 1 / 11 + 1 / 12, 2: 1 / 12, 3: 1 / 13 + 1 / 11}
    got = dict(zip(out["doc_id"], out["rrf_score"]))
    assert got == pytest.approx(
        {k: round(v, 6) for k, v in want.items()}, abs=1e-6)
    assert out["doc_id"].tolist() == [1, 3, 2]
    r = out.set_index("doc_id")
    assert r.loc[2, "rank_b"] == 0 and r.loc[3, "rank_b"] == 1


@pytest.mark.usefixtures("ray_session")
def test_batched_variants_equal_per_query():
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG as cfg
    from temporal_knowledge_graphs_ray.functions.embed import embed_texts
    from temporal_knowledge_graphs_ray.stages.embed import embed_documents
    from temporal_knowledge_graphs_ray.stages.hybrid import (
        hybrid_search,
        hybrid_search_many,
    )
    from temporal_knowledge_graphs_ray.stages.similarity import (
        knn_brute_force,
        knn_brute_force_many,
    )

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    queries = ["sort merge join window", "scan column value",
               "group agg key"]

    emb = embed_documents(docs, text_col="text").materialize()
    qm = embed_texts(queries, cfg.embed_dim, cfg.embed_ngram) \
        .astype(np.float64)
    batch_knn = knn_brute_force_many(emb, qm, k=9, id_col="doc_id")
    for qi, q in enumerate(queries):
        got = batch_knn[batch_knn["qi"] == qi][["doc_id", "cosine"]] \
            .reset_index(drop=True)
        want = knn_brute_force(emb, qm[qi], k=9,
                               id_col="doc_id").to_pandas()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    batch_hyb = hybrid_search_many(docs, queries, k=6, n_each=20,
                                   embedded=emb)
    for qi, q in enumerate(queries):
        got = batch_hyb[batch_hyb["qi"] == qi] \
            .drop(columns=["qi"]).reset_index(drop=True)
        want = hybrid_search(docs, q, k=6, n_each=20, embedded=emb)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
