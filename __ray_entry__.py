"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship KG-construction pipeline on sf0.001.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  training-data scale additions); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL per query where expressible;
  KG-pipeline and approximate operators are rows-only checked.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_KG_CACHE: dict[str, dict] = {}


def _kg_outputs(sf_dir: str) -> dict:
    """Build (once per process per sf_dir) the KG over pages synthesized
    deterministically from the documents table."""
    if sf_dir in _KG_CACHE:
        return _KG_CACHE[sf_dir]
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_from_documents,
    )

    out_dir = os.path.join(
        "/tmp/tkg_entry_out", sf_dir.strip("/").replace("/", "_")
    )
    pages = pages_from_documents(sf_dir)
    res = build_kg(pages, out_dir, alias_table=alias_table())
    # the KG was just rebuilt: any fulltext index persisted by a PREVIOUS
    # process over the same out_dir indexes the old chunks — drop it so
    # _kg_fulltext rebuilds from the current build (build_kg only wipes
    # its own tables)
    import shutil

    shutil.rmtree(os.path.join(out_dir, "fulltext_idx"),
                  ignore_errors=True)
    _KG_CACHE[sf_dir] = res
    return res


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full KG construction;
    returns the merged edges table (subj, pred, obj, valid_from, ...)."""
    import ray.data as rd

    res = _kg_outputs("/root/testdata/sf0.001")
    return rd.read_parquet(res["edges"]).select_columns(
        ["subj", "pred", "obj", "valid_from", "confidence"]
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _kg_edges(sf_dir: str):
    import pyarrow.dataset as pads

    res = _kg_outputs(sf_dir)
    t = pads.dataset(res["edges"], format="parquet",
                     partitioning="hive").to_table()
    import pandas as pd

    df = t.select(["subj", "pred", "obj", "valid_from"]).to_pandas()
    return df.sort_values(["subj", "pred", "obj"], ignore_index=True)


def _kg_nodes(sf_dir: str):
    import pyarrow.dataset as pads

    res = _kg_outputs(sf_dir)
    df = (pads.dataset(res["nodes"], format="parquet").to_table()
          .select(["entity_id", "name", "type", "mention_count"]).to_pandas())
    return df.sort_values("entity_id", ignore_index=True)


def _kg_mention_type_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    res = _kg_outputs(sf_dir)
    return (
        rd.read_parquet(res["mentions"], columns=["type"])
        .groupby("type").aggregate(Count(alias_name="n_mentions"))
    )


def _kg_chunk_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    res = _kg_outputs(sf_dir)
    return (
        rd.read_parquet(res["chunk_ents"], columns=["url", "token_count",
                                                    "chunk_index"])
        .groupby("url")
        .aggregate(Count(alias_name="n_chunks"),
                   Sum("token_count", alias_name="total_tokens"),
                   Max("chunk_index", alias_name="max_index"))
    )


def _kg_ppr(sf_dir: str):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import ppr

    res = _kg_outputs(sf_dir)
    edges = rd.read_parquet(res["edges"])
    nodes = rd.read_parquet(res["nodes"]).to_pandas()
    hubs = nodes.sort_values(
        ["mention_count", "entity_id"], ascending=[False, True]
    ).head(2)
    return ppr(edges, hubs["entity_id"].tolist()).head(50)


def _kg_comentions(sf_dir: str):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import comention_pairs

    res = _kg_outputs(sf_dir)
    return comention_pairs(rd.read_parquet(res["mentions"]), min_count=2)


def _kg_entity_match(sf_dir: str):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import (
        entity_match_chunks,
    )

    res = _kg_outputs(sf_dir)
    return entity_match_chunks(
        rd.read_parquet(res["mentions"]),
        ["OpenAI", "Acme Inc.", "Berlin"], k=20,
    )


def _kg_ppr_chunks(sf_dir: str):
    """Q2: chunk scoring from PPR over the constructed KG."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import (
        ppr,
        score_chunks_by_ppr,
    )

    res = _kg_outputs(sf_dir)
    nodes = rd.read_parquet(res["nodes"]).to_pandas()
    hubs = nodes.sort_values(["mention_count", "entity_id"],
                             ascending=[False, True]).head(2)
    scores = ppr(rd.read_parquet(res["edges"]), hubs["entity_id"].tolist())
    return score_chunks_by_ppr(rd.read_parquet(res["mentions"]), scores,
                               k=20)


def _kg_bfs(sf_dir: str):
    """Q3: BFS related entities from the top hub."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import (
        bfs_related_entities,
    )

    res = _kg_outputs(sf_dir)
    nodes = rd.read_parquet(res["nodes"]).to_pandas()
    hub = nodes.sort_values(["mention_count", "entity_id"],
                            ascending=[False, True]).iloc[0]["entity_id"]
    return bfs_related_entities(rd.read_parquet(res["edges"]), [hub],
                                max_depth=2)


def _kg_fulltext(sf_dir: str):
    """Q6: inverted-index full-text search (stages/fulltext.py) — the
    Neo4j full-text analogue (reference schema.py:125-144): postings are
    built ONCE and persisted next to the KG outputs; the query reads only
    its terms' hash buckets of the posting table. The query path cannot
    scan chunk text at all — the posting table has no text column."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        FULLTEXT_TERMS,
    )
    from temporal_knowledge_graphs_ray.stages.fulltext import FulltextIndex

    res = _kg_outputs(sf_dir)
    idx_path = os.path.join(os.path.dirname(res["edges"]), "fulltext_idx")
    if not os.path.isdir(idx_path):
        chunks = rd.read_parquet(res["chunk_ents"],
                                 columns=["chunk_id", "text"])
        FulltextIndex(chunks).save(idx_path)
    return FulltextIndex.load(idx_path).search(FULLTEXT_TERMS, k=20)


def _kg_hybrid(sf_dir: str):
    """Hybrid vector+entity RRF retrieval over the constructed KG."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import hybrid_search

    res = _kg_outputs(sf_dir)
    chunks = rd.read_parquet(res["chunk_ents"], columns=["chunk_id", "text"])
    mentions = rd.read_parquet(res["mentions"])
    return hybrid_search(chunks, mentions,
                         "Acme Inc. acquired a company",
                         ["Acme Inc.", "OpenAI"], k=20)


def _kg_shortest_path(sf_dir: str):
    """Q4: shortest path between the top-2 hub entities (reference
    operations.py:532-567), deterministic lexicographic-min-predecessor
    reconstruction."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        SHORTEST_PATH_MAX_HOPS,
    )
    from temporal_knowledge_graphs_ray.pipelines.graph import shortest_path

    res = _kg_outputs(sf_dir)
    nodes = rd.read_parquet(res["nodes"]).to_pandas()
    hubs = nodes.sort_values(["mention_count", "entity_id"],
                             ascending=[False, True]).head(2)
    ids = hubs["entity_id"].tolist()
    return shortest_path(rd.read_parquet(res["edges"]), ids[0], ids[-1],
                         max_hops=SHORTEST_PATH_MAX_HOPS)


def _rag_pipeline(sf_dir: str):
    """M15 + Q9: the 5-node RAG state machine (understand -> retrieve ->
    build_context -> generate -> verify, reference rag/graph.py:94-345) as
    a batch dataflow over a deterministic query set, with the M15 context
    builder's formatted output (prompts.py:142-260) as first-class columns.
    The generate node runs the default deterministic client."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        RAG_MAX_CONTEXT_LENGTH,
    )
    from temporal_knowledge_graphs_ray.pipelines.rag import (
        rag_answer_batch,
        synth_rag_queries,
    )

    res = _kg_outputs(sf_dir)
    nodes = rd.read_parquet(res["nodes"]).to_pandas().to_dict("records")
    return rag_answer_batch(
        rd.read_parquet(res["chunk_ents"]),
        rd.read_parquet(res["mentions"]),
        synth_rag_queries(nodes),
        max_context_length=RAG_MAX_CONTEXT_LENGTH,
    )


def _eval_evidence_join(sf_dir: str):
    """J6: join benchmark questions' evidence urls against the ingested
    chunks/mentions tables to count evidence coverage (reference
    evaluate_tkg.py:95-135)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.evaluate import evidence_join
    from temporal_knowledge_graphs_ray.sources.synth import page_url

    res = _kg_outputs(sf_dir)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    qids = [int(d) for d in docs["doc_id"].to_pylist()]
    questions = pa.Table.from_pydict({
        "question_id": pa.array(qids, pa.int64()),
        "url": pa.array([page_url(q) for q in qids], pa.string()),
    })
    return evidence_join(
        questions,
        rd.read_parquet(res["chunk_ents"], columns=["url"]),
        rd.read_parquet(res["mentions"], columns=["url"]),
    )


def _knn_topk(sf_dir: str):
    import numpy as np

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        ANN_QUERY_VEC_ID,
    )
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.similarity import knn_brute_force

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = np.array(
        ds.filter(lambda r: r["vec_id"] == ANN_QUERY_VEC_ID)
        .take(1)[0]["embedding"],
        dtype=np.float64,
    )
    return knn_brute_force(ds, q, k=10)


def _cosine_threshold(sf_dir: str):
    import numpy as np

    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.similarity import cosine_scores

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        ANN_QUERY_VEC_ID,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = np.array(
        ds.filter(lambda r: r["vec_id"] == ANN_QUERY_VEC_ID)
        .take(1)[0]["embedding"],
        dtype=np.float64,
    )
    import pandas as pd

    df = cosine_scores(ds, q).to_pandas()
    df = df[df["cosine"] >= 0.2]
    return df.sort_values("vec_id", ignore_index=True)


def _neardup_cosine(sf_dir: str):
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.similarity import (
        neardup_pairs_cosine,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # threshold 0.4: the driver-provided embeddings are near-random (max
    # pairwise cosine ~0.5), so 0.9 returned an empty — vacuously green —
    # result; 0.4 yields ~60 real pairs at both test scales
    return neardup_pairs_cosine(ds, threshold=0.4, limit_ids=500)


def _ann_lsh(sf_dir: str):
    import numpy as np

    from temporal_knowledge_graphs_ray.oracle.materialize import (
        ANN_K,
        ANN_N_PLANES,
        ANN_N_TABLES,
        ANN_QUERY_VEC_ID,
        ANN_SEED,
    )
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.similarity import ann_lsh_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = np.array(
        ds.filter(lambda r: r["vec_id"] == ANN_QUERY_VEC_ID)
        .take(1)[0]["embedding"],
        dtype=np.float64,
    )
    return ann_lsh_topk(ds, q, k=ANN_K, n_planes=ANN_N_PLANES,
                        n_tables=ANN_N_TABLES, seed=ANN_SEED)


def _exact_dedup(sf_dir: str):
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.dedup import exact_dedup

    out = exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out.sort_values("fingerprint", ignore_index=True)


def _minhash_dedup(sf_dir: str):
    """MinHash-LSH candidates + distributed exact-Jaccard verify; with
    r=2 banding the detection probability at J>=0.8 is ~1, so the result
    must EQUAL the exact inverted-index Jaccard oracle (recall gate)."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.dedup import (
        minhash_verified_pairs,
    )

    return minhash_verified_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        num_bands=32, jaccard_threshold=0.8)


def _simhash_pairs(sf_dir: str):
    """9-block bucket LSH guarantees exact recall at Hamming <= 8, so the
    result must EQUAL the exact all-pairs Hamming oracle (recall gate)."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.dedup import simhash_dedup

    return simhash_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                         max_hamming=8, num_blocks=9)


def _ectqa_roundtrip(sf_dir: str):
    """Synthesize an ECT-QA JSONL from the documents table, run the S6/S7
    loader pipeline over it; the oracle recomputes the projection in SQL
    directly from documents."""
    import json
    import os

    import duckdb

    from temporal_knowledge_graphs_ray.sources.ectqa import read_ectqa

    jsonl = os.path.join(
        "/tmp/tkg_ectqa", sf_dir.strip("/").replace("/", "_") + ".jsonl"
    )
    os.makedirs(os.path.dirname(jsonl), exist_ok=True)
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    with open(jsonl, "w") as f:
        for doc_id, text, lang in rows:
            f.write(json.dumps({
                "company_name": f"Comp{doc_id}",
                "stock_code": f"S{doc_id}",
                "sector": lang,
                "year": str(2015 + doc_id % 8),
                "quarter": f"q{doc_id % 4 + 1}",
                "URL": f"https://ectqa.example/{doc_id}",
                "cleaned_content": text,
                "token_count": len(text.split()),
            }) + "\n")
    ds = read_ectqa(jsonl)
    df = ds.select_columns(
        ["title", "stock_code", "sector", "year", "quarter", "token_count",
         "created_at"]
    ).to_pandas()
    return df.sort_values("stock_code", ignore_index=True)


def _temporal_filter_orders(sf_dir: str):
    """M11: TemporalFilter compiled to an Arrow expression over a
    versioned view of orders (fiscal fields derived from o_orderdate)."""
    import pyarrow as pa
    import pyarrow.compute as pcc

    from temporal_knowledge_graphs_ray.functions.temporal_filter import (
        TemporalFilter,
    )
    from temporal_knowledge_graphs_ray.pipelines.queries import _read

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def versioned(t: pa.Table) -> pa.Table:
        year = pcc.year(t["o_orderdate"])
        month = pcc.month(t["o_orderdate"]).to_numpy()
        import numpy as np

        quarter = (month - 1) // 3 + 1
        keys = t["o_orderkey"].to_numpy()
        return pa.Table.from_arrays(
            [
                t["o_orderkey"],
                year.cast(pa.int64()),
                pa.array([f"Q{q}" for q in quarter], pa.string()),
                pa.array((keys % 3 != 0)),
            ],
            names=["o_orderkey", "fiscal_year", "fiscal_quarter",
                   "is_current"],
        )

    filt = TemporalFilter.time_range(1996, 1996, "Q2", "Q3")
    out = filt.apply(
        ds.map_batches(versioned, batch_format="pyarrow", batch_size=65536)
    )
    return out


def _embed_documents(sf_dir: str):
    """A3: deterministic hash-embedding of the documents table; rows-only
    (no SQL equivalent for the hash embedder). Returns id + vector norm."""
    import numpy as np
    import pyarrow as pa

    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.embed import embed_documents

    ds = embed_documents(_read(sf_dir, "documents", ["doc_id", "text"]))

    def norms(t: pa.Table) -> pa.Table:
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        return pa.Table.from_arrays(
            [t["doc_id"],
             pa.array(np.round(np.linalg.norm(m, axis=1), 4))],
            names=["doc_id", "norm"],
        )

    return ds.map_batches(norms, batch_format="pyarrow")


def _streaming_sessionize(sf_dir: str):
    """Stateful streaming sessionizer (incremental actor state) — returns
    one row per closed session; oracle recomputes sessions with SQL window
    functions."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.streaming import (
        sessionize_streaming,
    )

    return sessionize_streaming(_read(sf_dir, "events", ["user_id", "ts"]))


def _url_dedup(sf_dir: str):
    """URL canonical dedup (stages/urlfilter.dedup_by_url) driver gate.

    URLs are synthesized deterministically from doc_id with THREE
    spelling variants per canonical resource — already-canonical /
    uppercase scheme+host with the default :443 port and a fragment /
    trailing tracking params — so the SQL oracle can state each url's
    canonical form in closed form while the Ray side exercises the real
    canonicalize_url kernel. Keep-latest on crawl_ts=doc_id; tie-break
    raw url ascending (the dedup_by_url contract)."""
    import pyarrow as pa

    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.urlfilter import dedup_by_url

    def mk(t: pa.Table) -> pa.Table:
        urls, ts = [], []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            site, page, v = (d // 3) % 7, d // 3, d % 3
            base = f"https://site{site}.example.com/page/{page}"
            if v == 1:
                urls.append(f"HTTPS://SITE{site}.EXAMPLE.COM:443"
                            f"/page/{page}#frag")
            elif v == 2:
                urls.append(base + "?utm_source=x&gclid=1")
            else:
                urls.append(base)
            ts.append(d)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "crawl_ts": pa.array(ts, pa.int64())})

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        mk, batch_format="pyarrow")
    return dedup_by_url(pages, url_col="url", ts_col="crawl_ts")


def _ccnet_buckets(sf_dir: str):
    """CCNet perplexity bucketing (stages/dsir.ccnet_buckets) with the
    trusted LM fit on the src0 slice. No oracle_sql entry: the hashed-LM
    bits are not SQL-expressible, so the driver records the weaker
    rows-only check — the EXACT quantile/bucket oracle (DuckDB
    quantile_disc over the scored frame) lives in tests/test_dsir.py."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.dsir import (
        ccnet_buckets,
        fit_hashed_lm,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    counts = fit_hashed_lm(docs.filter(expr="source == 'src0'"),
                           num_buckets=16384)
    return ccnet_buckets(docs, counts)


def _multimodal_meta(sf_dir: str):
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.multimodal import (
        binarize_documents,
        decode_media,
    )

    media = binarize_documents(_read(sf_dir, "documents", ["doc_id", "text"]))
    return decode_media(media, fake=True)


def _textstat(fn_name: str):
    def run(sf_dir: str):
        from temporal_knowledge_graphs_ray.pipelines.queries import _read
        from temporal_knowledge_graphs_ray.stages import textstats as ts

        fn = getattr(ts, fn_name)
        return fn(_read(sf_dir, "documents", ["doc_id", "text"]))

    return run


def _paragraph_dedup(sf_dir: str):
    """CCNet-style exact paragraph dedup over the documents table
    (stages/paradedup.py) — keep the first occurrence of every
    paragraph corpus-wide, reassemble documents."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.paradedup import (
        dedup_paragraphs,
    )

    return dedup_paragraphs(_read(sf_dir, "documents", ["doc_id", "text"]))


def _paradedup_sql(table: str) -> str:
    from temporal_knowledge_graphs_ray.stages.paradedup import (
        paragraph_dedup_sql,
    )

    return paragraph_dedup_sql(table)


def queries() -> dict[str, Callable[[str], Any]]:
    from temporal_knowledge_graphs_ray.pipelines import queries as q

    return {
        # relational / aggregation / join
        "pricing_summary": q.q_pricing_summary,
        "topk_orders": q.q_topk_orders,
        "revenue_by_brand": q.q_revenue_by_brand,
        "cooccurrence": q.q_cooccurrence,
        "overlap_users": q.q_overlap_users,
        "rrf_fusion": q.q_rrf_fusion,
        # temporal / versioning
        "latest_event_per_user": q.q_latest_event_per_user,
        "version_history": q.q_version_history,
        "asof_counts": q.q_asof_counts,
        "events_in_range": q.q_events_in_range,
        "period_compare": q.q_period_compare,
        "temporal_decay": q.q_temporal_decay,
        "fiscal_derive": q.q_fiscal_derive,
        "evolution_diff": q.q_evolution_diff,
        "version_gc": q.q_version_gc,
        "flatten_metadata": q.q_flatten_metadata,
        # windows / sessions. One slot covers the sessionization
        # contract: the STREAMING stage is driver-gated against the SQL
        # window-function oracle; the batch q_sessionize summary stays
        # pytest-oracled (tests/test_queries_duckdb ran both until r5 —
        # folded to free driver slots for the r4.5 operators)
        "tumbling_window": q.q_tumbling_window,
        "streaming_sessionize": _streaming_sessionize,
        # JSON / loaders
        "json_props": q.q_json_props,
        "doc_stats": q.q_doc_stats,
        # text analysis (language ID + quality + fingerprint + token/chunk
        # stats all merged into ONE pass — the driver judges at most 50
        # queries, so near-duplicate entries are consolidated; the merged
        # kernel is also one read of the text column instead of three)
        "doc_text_stats": _textstat("text_stats_stage"),
        "extract_text_roundtrip": q.q_extract_text_roundtrip,
        # dedup (ngram_jaccard rotated OUT in r5: it is the documented
        # bounded test-only variant of the Jaccard kernel that
        # minhash_lsh_dedup verifies with — still pytest-covered in
        # tests/test_dedup.py; slot reused for the r4.5 operators)
        "exact_dedup": _exact_dedup,
        "minhash_lsh_dedup": _minhash_dedup,
        "simhash_pairs": _simhash_pairs,
        "paragraph_dedup": _paragraph_dedup,
        "url_dedup": _url_dedup,
        "ccnet_buckets": _ccnet_buckets,
        # similarity search
        "knn_topk": _knn_topk,
        "cosine_threshold": _cosine_threshold,
        "neardup_cosine": _neardup_cosine,
        "ann_lsh_topk": _ann_lsh,
        # multimodal plumbing
        "multimodal_meta": _multimodal_meta,
        "embed_documents": _embed_documents,
        "ectqa_roundtrip": _ectqa_roundtrip,
        "temporal_filter_orders": _temporal_filter_orders,
        # KG pipeline (flagship)
        "kg_edges": _kg_edges,
        "kg_nodes": _kg_nodes,
        "kg_mention_type_counts": _kg_mention_type_counts,
        "kg_chunk_stats": _kg_chunk_stats,
        "kg_ppr": _kg_ppr,
        "kg_comentions": _kg_comentions,
        "kg_entity_match": _kg_entity_match,
        "kg_ppr_chunks": _kg_ppr_chunks,
        "kg_bfs": _kg_bfs,
        "kg_fulltext": _kg_fulltext,
        "kg_hybrid": _kg_hybrid,
        "kg_shortest_path": _kg_shortest_path,
        "eval_evidence_join": _eval_evidence_join,
        "rag_pipeline": _rag_pipeline,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB) — column names and rounding match the Ray results
# --------------------------------------------------------------------------

_TOKEN_RE_SQL = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

_STOP_SQL = {
    "en": "\\b(the|and|of|to|in|is|that|for|it|with)\\b",
    "de": "\\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\\b",
    "fr": "\\b(le|la|les|et|est|des|un|une|que|pour)\\b",
    "es": "\\b(el|los|las|y|es|en|un|una|que|por)\\b",
}

_NORM_LINES_SQL = (
    "array_to_string(list_filter(list_transform(string_split(text, chr(10)),"
    " x -> trim(x, ' ' || chr(9))), x -> x <> ''), chr(10))"
)


def oracle_sql() -> dict[str, str]:
    # The KG pipeline's outputs (and the graph/similarity queries over
    # them) have no closed-form SQL over the input tables; their oracle is
    # the SEQUENTIAL implementation (oracle/kg_oracle.py + the dict-based
    # graph oracles in oracle/materialize.py), materialized to Parquet
    # here and read by DuckDB's parquet scan. The driver judges at sf0.01
    # (GRAFT_TEST_SF overrides for self-tests).
    from temporal_knowledge_graphs_ray.functions.normalize import surface_key
    from temporal_knowledge_graphs_ray.oracle.materialize import (
        ANN_QUERY_VEC_ID,
        ENTITY_MATCH_NAMES,
        FULLTEXT_TERMS,
        materialize_kg_oracle,
    )

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.01")
    o = materialize_kg_oracle(sf)


    match_keys = sorted({surface_key(n) for n in ENTITY_MATCH_NAMES})
    match_in = ", ".join(f"'{k}'" for k in match_keys)
    # word-level term presence, matching the inverted index's [a-z0-9]+
    # tokenizer (Lucene-like: "reacquired" does NOT match "acquired")
    term_sum = " + ".join(
        "CAST(regexp_matches(lower(text), "
        f"'(^|[^a-z0-9]){t.lower()}([^a-z0-9]|$)') AS INT)"
        for t in FULLTEXT_TERMS
    )
    lang_counts = ", ".join(
        f"CAST(length(regexp_extract_all(lower(text), '{pat}')) AS BIGINT)"
        f" AS c_{lang}"
        for lang, pat in _STOP_SQL.items()
    )
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_revenue,
                   COUNT(*) AS count_order,
                   ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 4) AS avg_qty
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "revenue_by_brand": """
            SELECT COALESCE(p.p_brand, 'NA') AS p_brand,
                   ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
            FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1 ORDER BY 1
        """,
        "cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_users
            FROM d a JOIN d b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
            GROUP BY 1, 2 HAVING COUNT(*) >= 5 ORDER BY 1, 2
        """,
        "overlap_users": """
            WITH a AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase'),
                 b AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'signup')
            SELECT (SELECT COUNT(*) FROM a WHERE user_id IN
                       (SELECT user_id FROM b)) AS n_both,
                   (SELECT COUNT(*) FROM a WHERE user_id NOT IN
                       (SELECT user_id FROM b)) AS n_only_a
        """,
        "rrf_fusion": """
            WITH v AS (SELECT event_id,
                              ROW_NUMBER() OVER (ORDER BY value DESC,
                                                 event_id ASC) AS r
                       FROM events QUALIFY r <= 100),
                 t AS (SELECT event_id,
                              ROW_NUMBER() OVER (ORDER BY ts DESC,
                                                 event_id ASC) AS r
                       FROM events QUALIFY r <= 100),
                 u AS (SELECT event_id, 1.0 / (60 + r) AS s FROM v
                       UNION ALL
                       SELECT event_id, 1.0 / (60 + r) AS s FROM t)
            SELECT event_id, ROUND(SUM(s), 6) AS rrf_score
            FROM u GROUP BY event_id
            ORDER BY rrf_score DESC, event_id ASC LIMIT 20
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, ts FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) = 1
        """,
        "version_history": """
            SELECT user_id, event_id, ts,
                   ROW_NUMBER() OVER w AS version,
                   ROW_NUMBER() OVER w = COUNT(*) OVER
                       (PARTITION BY user_id) AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        """,
        "asof_counts": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY event_type
        """,
        "events_in_range": """
            SELECT event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <  TIMESTAMP '2024-01-20 00:00:00'
            GROUP BY event_type ORDER BY event_type
        """,
        "period_compare": """
            SELECT COUNT(*) FILTER (ts <= TIMESTAMP '2024-01-10') AS n_a,
                   COUNT(*) FILTER (ts <= TIMESTAMP '2024-01-20') AS n_b
            FROM events
        """,
        "temporal_decay": """
            SELECT event_type,
                   ROUND(SUM(value * POWER(0.99,
                       CAST((epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts))
                            // 86400000000 AS BIGINT))), 2) AS decayed_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "fiscal_derive": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS fiscal_year,
                   'Q' || CAST((month(o_orderdate) - 1) // 3 + 1 AS INT)
                       AS fiscal_quarter,
                   CAST(make_date(CAST(year(o_orderdate) AS INT),
                       ((month(o_orderdate) - 1) // 3 + 1) * 3,
                       CASE WHEN ((month(o_orderdate) - 1) // 3 + 1) * 3
                            IN (6, 9) THEN 30 ELSE 31 END) AS TIMESTAMP)
                       AS fiscal_period_end
            FROM orders
        """,
        "tumbling_window": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS window_id,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "streaming_sessionize": """
            WITH o AS (
                SELECT user_id, ts,
                       CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                                 > 1800000000
                            OR LAG(ts) OVER w IS NULL
                       THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
                 s AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id
                           ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                FROM o)
            SELECT user_id, MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "url_dedup": """
            -- urls synthesized from doc_id exactly as _url_dedup does;
            -- the canonical form is stated in closed form, keep-latest
            -- on crawl_ts with raw-url ascending tie-break
            WITH pages AS (
                SELECT 'https://site' || ((doc_id // 3) % 7)::VARCHAR ||
                       '.example.com/page/' || (doc_id // 3)::VARCHAR
                           AS canonical_url,
                       CASE doc_id % 3
                         WHEN 1 THEN 'HTTPS://SITE' ||
                              ((doc_id // 3) % 7)::VARCHAR ||
                              '.EXAMPLE.COM:443/page/' ||
                              (doc_id // 3)::VARCHAR || '#frag'
                         WHEN 2 THEN 'https://site' ||
                              ((doc_id // 3) % 7)::VARCHAR ||
                              '.example.com/page/' ||
                              (doc_id // 3)::VARCHAR ||
                              '?utm_source=x&gclid=1'
                         ELSE 'https://site' ||
                              ((doc_id // 3) % 7)::VARCHAR ||
                              '.example.com/page/' ||
                              (doc_id // 3)::VARCHAR
                       END AS url,
                       doc_id AS crawl_ts
                FROM documents)
            SELECT url, crawl_ts, canonical_url FROM pages
            QUALIFY row_number() OVER (
                PARTITION BY coalesce(canonical_url, '')
                ORDER BY crawl_ts DESC, url ASC) = 1
        """,
        "json_props": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k')
                       AS BIGINT), 0)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type
        """,
        "doc_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "paragraph_dedup": _paradedup_sql("documents"),
        "doc_text_stats": f"""
            WITH c AS (SELECT doc_id, text, {lang_counts} FROM documents)
            SELECT doc_id, c_en, c_de, c_fr, c_es,
                   CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0
                            THEN 'unknown'
                        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es
                            THEN 'en'
                        WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                        WHEN c_fr >= c_es THEN 'fr'
                        ELSE 'es' END AS lang_pred,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        AS BIGINT) AS n_words,
                   CAST(length(regexp_extract_all(text,
                        '[^A-Za-z0-9 \\t\\n\\r]')) AS BIGINT) AS n_punct,
                   CASE WHEN length(text) > 0 THEN
                        CAST(length(regexp_extract_all(text,
                             '[^A-Za-z0-9 \\t\\n\\r]')) AS DOUBLE)
                        / length(text) ELSE 0.0 END AS punct_ratio,
                   CASE WHEN length(regexp_extract_all(text,
                             '[A-Za-z0-9]+')) > 0 THEN
                        CAST(length(regexp_extract_all(lower(text),
                             '{_STOP_SQL["en"]}')) AS DOUBLE)
                        / length(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        ELSE 0.0 END AS stop_ratio,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fingerprint,
                   CAST(length(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))
                        AS BIGINT) AS n_tokens,
                   GREATEST(1, CAST((length(regexp_extract_all(text,
                       '{_TOKEN_RE_SQL}')) + 89) // 90 AS BIGINT)) AS n_chunks
            FROM c
        """,
        "extract_text_roundtrip": f"""
            SELECT doc_id, {_NORM_LINES_SQL} AS extracted FROM documents
        """,
        "exact_dedup": """
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fingerprint,
                   MIN(doc_id) AS keep_id
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "knn_topk": f"""
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID})
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
        """,
        "cosine_threshold": f"""
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID})
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
            FROM embeddings e, q
            WHERE ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qv), 6) >= 0.2
            ORDER BY e.vec_id
        """,
        "neardup_cosine": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b
                 ON a.vec_id < b.vec_id
            WHERE a.vec_id < 500 AND b.vec_id < 500
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
            ORDER BY a.vec_id, b.vec_id
        """,
        "evolution_diff": """
            WITH d AS (
                SELECT DISTINCT event_type, user_id,
                       CASE WHEN ts >= TIMESTAMP '2024-01-15'
                                 AND ts < TIMESTAMP '2024-01-30' THEN 2
                            ELSE 1 END AS period
                FROM events
                WHERE ts >= TIMESTAMP '2024-01-01'
                  AND ts < TIMESTAMP '2024-01-30')
            SELECT event_type,
                   CAST(COUNT(DISTINCT CASE WHEN in2 AND NOT in1
                        THEN user_id END) AS BIGINT) AS n_new,
                   CAST(COUNT(DISTINCT CASE WHEN in1 AND in2
                        THEN user_id END) AS BIGINT) AS n_persistent,
                   CAST(COUNT(DISTINCT CASE WHEN in1 AND NOT in2
                        THEN user_id END) AS BIGINT) AS n_disappeared
            FROM (SELECT event_type, user_id,
                         bool_or(period = 1) AS in1,
                         bool_or(period = 2) AS in2
                  FROM d GROUP BY event_type, user_id)
            GROUP BY event_type ORDER BY event_type
        """,
        "version_gc": """
            WITH r AS (SELECT user_id,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
                       FROM events)
            SELECT user_id,
                   CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   CAST(SUM(CASE WHEN rk > 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_deleted
            FROM r GROUP BY user_id
        """,
        "flatten_metadata": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS meta_k
            FROM events
        """,
        "ectqa_roundtrip": """
            SELECT 'Comp' || doc_id || ' (S' || doc_id || ') - Q'
                       || (doc_id % 4 + 1) || ' ' || (2015 + doc_id % 8)
                       || ' Earnings Call' AS title,
                   'S' || doc_id AS stock_code,
                   lang AS sector,
                   CAST(2015 + doc_id % 8 AS VARCHAR) AS year,
                   'Q' || (doc_id % 4 + 1) AS quarter,
                   CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS token_count,
                   CAST(make_date(CAST(2015 + doc_id % 8 AS INT),
                       (doc_id % 4 + 1) * 3,
                       CASE WHEN (doc_id % 4 + 1) * 3 IN (6, 9)
                            THEN 30 ELSE 31 END) AS TIMESTAMP) AS created_at
            FROM documents
        """,
        "temporal_filter_orders": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS fiscal_year,
                   'Q' || ((month(o_orderdate) - 1) // 3 + 1)
                       AS fiscal_quarter,
                   o_orderkey % 3 <> 0 AS is_current
            FROM orders
            WHERE year(o_orderdate) = 1996
              AND 'Q' || ((month(o_orderdate) - 1) // 3 + 1) >= 'Q2'
              AND 'Q' || ((month(o_orderdate) - 1) // 3 + 1) <= 'Q3'
              AND o_orderkey % 3 <> 0
        """,
        "multimodal_meta": """
            SELECT doc_id AS media_id, 'image' AS media_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
                   CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
                   CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS channels
            FROM documents
        """,
        # ---- recall gates for the approximate dedup operators ----
        # exact inverted-index Jaccard over ALL documents; the engine's
        # LSH+verify result must equal it (banding chosen for ~1 recall)
        "minhash_lsh_dedup": """
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                FROM documents),
            sh AS (
                SELECT doc_id,
                       list_distinct([ws[i] || ' ' || ws[i+1] || ' '
                                      || ws[i+2]
                                      for i in range(1, len(ws) - 1)]) AS sh
                FROM words WHERE len(ws) >= 3),
            sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
            co AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
                   FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
                   GROUP BY 1, 2)
            SELECT co.a, co.b,
                   ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
            FROM co JOIN sizes sa ON sa.doc_id = co.a
                    JOIN sizes sb ON sb.doc_id = co.b
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
            ORDER BY co.a, co.b
        """,
        # exact all-pairs Hamming over the sequential oracle's simhashes;
        # 9-block bucketing guarantees recall at Hamming <= 8
        "simhash_pairs": f"""
            WITH s AS (SELECT doc_id, h FROM '{o}/simhash.parquet')
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.h, b.h)) <= 8
            ORDER BY a, b
        """,
        "embed_documents": f"""
            SELECT doc_id, norm FROM '{o}/embed_norms.parquet'
        """,
        # ---- KG pipeline vs the sequential oracle (materialized) ----
        "kg_edges": f"""
            SELECT subj, pred, obj, valid_from FROM '{o}/edges.parquet'
        """,
        "kg_nodes": f"""
            SELECT entity_id, name, type, mention_count
            FROM '{o}/nodes.parquet'
        """,
        "kg_mention_type_counts": f"""
            SELECT type, COUNT(*) AS n_mentions
            FROM '{o}/mentions.parquet' GROUP BY type
        """,
        "kg_chunk_stats": f"""
            SELECT url, COUNT(*) AS n_chunks,
                   CAST(SUM(token_count) AS BIGINT) AS total_tokens,
                   MAX(chunk_index) AS max_index
            FROM '{o}/chunks.parquet' GROUP BY url
        """,
        "kg_ppr": f"""
            SELECT entity_id, score FROM '{o}/ppr.parquet'
            ORDER BY score DESC, entity_id ASC LIMIT 50
        """,
        "kg_ppr_chunks": f"""
            SELECT chunk_id, score FROM '{o}/ppr_chunks.parquet'
        """,
        "kg_comentions": f"""
            WITH d AS (SELECT DISTINCT chunk_id, entity_key
                       FROM '{o}/mentions.parquet'),
                 p AS (SELECT x.entity_key AS a, y.entity_key AS b,
                              COUNT(*) AS n_chunks
                       FROM d x JOIN d y ON x.chunk_id = y.chunk_id
                            AND x.entity_key < y.entity_key
                       GROUP BY 1, 2)
            SELECT a, b, n_chunks FROM p WHERE n_chunks >= 2
            ORDER BY n_chunks DESC, a, b
        """,
        "kg_entity_match": f"""
            WITH m AS (SELECT DISTINCT chunk_id, entity_key
                       FROM '{o}/mentions.parquet'
                       WHERE entity_key IN ({match_in})),
                 s AS (SELECT chunk_id,
                              ROUND(CAST(COUNT(DISTINCT entity_key)
                                    AS DOUBLE) / {len(match_keys)}, 6)
                                  AS score
                       FROM m GROUP BY chunk_id)
            SELECT chunk_id, score FROM s
            ORDER BY score DESC, chunk_id ASC LIMIT 20
        """,
        "kg_bfs": f"""
            WITH hub AS (SELECT entity_id FROM '{o}/nodes.parquet'
                         ORDER BY mention_count DESC, entity_id ASC LIMIT 1),
                 e AS (SELECT subj_id AS a, obj_id AS b
                       FROM '{o}/edges.parquet'
                       UNION ALL
                       SELECT obj_id, subj_id FROM '{o}/edges.parquet'),
                 d1 AS (SELECT DISTINCT e.b AS id
                        FROM e JOIN hub ON e.a = hub.entity_id
                        WHERE e.b NOT IN (SELECT entity_id FROM hub)),
                 d2 AS (SELECT DISTINCT e.b AS id FROM e
                        WHERE e.a IN (SELECT id FROM d1)
                          AND e.b NOT IN (SELECT id FROM d1)
                          AND e.b NOT IN (SELECT entity_id FROM hub))
            SELECT entity_id, CAST(0 AS BIGINT) AS distance FROM hub
            UNION ALL
            SELECT id, CAST(1 AS BIGINT) FROM d1
            UNION ALL
            SELECT id, CAST(2 AS BIGINT) FROM d2
            ORDER BY distance, entity_id
        """,
        "kg_fulltext": f"""
            WITH s AS (SELECT chunk_id,
                              CAST({term_sum} AS BIGINT) AS n_terms
                       FROM '{o}/chunks.parquet')
            SELECT chunk_id, n_terms FROM s WHERE n_terms > 0
            ORDER BY n_terms DESC, chunk_id ASC LIMIT 20
        """,
        "kg_hybrid": f"""
            SELECT chunk_id, rrf_score FROM '{o}/hybrid.parquet'
        """,
        "kg_shortest_path": f"""
            SELECT step, entity_id FROM '{o}/shortest_path.parquet'
        """,
        # rag_pipeline: the sequential per-query 5-node loop (rag_seq) is
        # materialized; a green hash proves the batched multi-query
        # retrieval + distributed hydration equals the obvious per-query
        # sequential orchestration bit-for-bit.
        "rag_pipeline": f"""
            SELECT query_id, query, query_type, temporal_detected,
                   n_entities, num_results, context_length, truncated,
                   formatted_context, entity_relationships, answer,
                   verified, verification_notes
            FROM '{o}/rag.parquet' ORDER BY query_id
        """,
        "eval_evidence_join": f"""
            WITH q AS (SELECT question_id, url FROM '{o}/questions.parquet'),
                 c AS (SELECT url, COUNT(*) AS nc
                       FROM '{o}/chunks.parquet' GROUP BY url),
                 m AS (SELECT url, COUNT(*) AS nm
                       FROM '{o}/mentions.parquet' GROUP BY url)
            SELECT q.question_id,
                   CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_evidence_chunks,
                   CAST(COALESCE(m.nm, 0) AS BIGINT) AS n_evidence_mentions,
                   COALESCE(c.nc, 0) > 0 AS covered
            FROM q LEFT JOIN c ON c.url = q.url
                   LEFT JOIN m ON m.url = q.url
            ORDER BY q.question_id
        """,
        # ann_lsh_topk: the LSH bucketing is seed-deterministic, so the
        # oracle materializer recomputes the candidate set sequentially
        # (ann_candidates.parquet) and DuckDB rescores exactly within it
        # — a full hash gate despite the "approximate" construction. The
        # recall >= 0.9 gate vs exact KNN additionally runs in pytest
        # (tests/test_similarity.py).
        "ann_lsh_topk": f"""
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID}),
                 c AS (SELECT vec_id FROM '{o}/ann_candidates.parquet')
            SELECT e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
            FROM embeddings e JOIN c USING (vec_id), q
            ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
        """,
    }
