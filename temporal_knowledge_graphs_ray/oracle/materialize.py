"""Materialize the sequential oracle to Parquet for DuckDB comparison.

The driver's correctness gate runs each ``queries()`` entry side-by-side
with an ``oracle_sql()`` DuckDB string and hash-compares the results. The
KG-construction outputs (and the graph queries over them) have no
closed-form SQL over the input tables, so round 1 left them rows-only.
This module closes that gap: it runs the sequential one-document-at-a-time
oracle (oracle/kg_oracle.py — the reference's own loop shape,
/root/reference/src/temporal_kg_rag/ingestion/pipeline.py:57-155) plus
sequential, dict-based implementations of the graph queries
(PPR / chunk scoring / hybrid RRF / shortest path — reference
ppr_traversal.py, hybrid_search.py, operations.py:532-567), writes the
results deterministically to Parquet under /tmp, and the oracle SQL reads
them via DuckDB's parquet scan. A green hash row then proves the
distributed Ray pipeline is bit-identical to the sequential computation.

Everything here is DRIVER-SIDE, TEST-SCALE ONLY (plain Python loops over
a few hundred pages); it exists to check the engine, not to be fast.
"""

from __future__ import annotations

import json
import os
import shutil
from collections import defaultdict

import numpy as np

# bump when oracle semantics change so stale /tmp caches are not reused
ORACLE_VERSION = 5

# Query constants shared between the engine queries (__ray_entry__) and
# this oracle — single source of truth for both sides.
PPR_SEED_COUNT = 2
# ann_lsh_topk: both sides use the same seed-deterministic LSH bucketing,
# so the candidate set is materialized here and DuckDB rescores exactly
# within it — making the "approximate" query fully oracle-checkable.
ANN_N_PLANES = 6
ANN_N_TABLES = 16
ANN_SEED = 7
ANN_QUERY_VEC_ID = 0
ANN_K = 10
HYBRID_QUERY = "Acme Inc. acquired a company"
HYBRID_ENTITIES = ["Acme Inc.", "OpenAI"]
HYBRID_K = 20
ENTITY_MATCH_NAMES = ["OpenAI", "Acme Inc.", "Berlin"]
FULLTEXT_TERMS = ["acquired", "revenue", "founded"]
SHORTEST_PATH_MAX_HOPS = 6
# rag_pipeline: small char budget so the M15 truncation path is exercised
RAG_MAX_CONTEXT_LENGTH = 1200


def oracle_dir(sf_dir: str) -> str:
    """Cache directory keyed by sf path, oracle version AND an input-data
    fingerprint (size + mtime of the source tables): regenerated testdata
    under the same path must NOT silently reuse a stale oracle."""
    tag = sf_dir.strip("/").replace("/", "_")
    fp = 0
    for t in ("documents.parquet", "embeddings.parquet"):
        path = os.path.join(sf_dir, t)
        if os.path.exists(path):
            st = os.stat(path)
            fp = (fp * 1000003) ^ st.st_size ^ st.st_mtime_ns
    fp &= (1 << 48) - 1
    return os.path.join("/tmp/tkg_oracle",
                        f"{tag}_v{ORACLE_VERSION}_{fp:012x}")


def _pages_rows(sf_dir: str) -> list[dict]:
    """One page per document row — same derivation as
    sources/synth.pages_from_documents (repeat=1)."""
    import pyarrow.parquet as pq

    from ..sources.synth import make_page

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return [
        make_page(int(d), t)
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    ]


def _alias_dict() -> dict:
    from ..sources.synth import alias_table

    at = alias_table()
    return {
        (t, a.lower()): c
        for a, c, t in zip(at["alias"].to_pylist(),
                           at["canonical"].to_pylist(),
                           at["type"].to_pylist())
    }


# ---------------------------------------------------------------------------
# sequential graph-query oracles (dict/loop implementations, independent of
# the distributed code paths in pipelines/graph.py)
# ---------------------------------------------------------------------------

def ppr_seq(edges: list[dict], seed_ids: list[str], damping: float = 0.85,
            max_iters: int = 20, tol: float = 1e-6) -> list[dict]:
    """Dict-based personalized PageRank (undirected), round-8, score > 0."""
    from ..functions.rounding import round_half_away

    degree: dict[str, int] = defaultdict(int)
    pairs = [(e["subj_id"], e["obj_id"]) for e in edges]
    for a, b in pairs:
        degree[a] += 1
        degree[b] += 1
    if not degree:
        return []
    seeds = [s for s in seed_ids if s in degree] or sorted(degree)[:1]
    scores = {s: 1.0 / len(seeds) for s in seeds}
    teleport = dict(scores)
    for _ in range(max_iters):
        new: dict[str, float] = defaultdict(float)
        for a, b in pairs:
            sa = scores.get(a)
            if sa:
                new[b] += damping * sa / degree[a]
            sb = scores.get(b)
            if sb:
                new[a] += damping * sb / degree[b]
        for s, w in teleport.items():
            new[s] += (1 - damping) * w
        total = sum(new.values())
        if total > 0:
            new = {k: v / total for k, v in new.items()}
        delta = sum(abs(new.get(k, 0.0) - scores.get(k, 0.0))
                    for k in set(scores) | set(new))
        scores = dict(new)
        if delta < tol:
            break
    out = []
    for k in sorted(scores):
        s = float(round_half_away(np.array([scores[k]]), 8)[0])
        if s > 0:
            out.append({"entity_id": k, "score": s})
    out.sort(key=lambda r: (-r["score"], r["entity_id"]))
    return out


def ppr_chunks_seq(mentions: list[dict], ppr_scores: list[dict],
                   k: int = 20, decay: float = 0.95,
                   ref_year: int = 2024) -> list[dict]:
    """Sequential chunk scoring from PPR (Q2)."""
    from ..functions.rounding import round_half_away
    from ..stages.entities import entity_id_for

    sc = {r["entity_id"]: r["score"] for r in ppr_scores}
    contrib: dict[str, float] = defaultdict(float)
    year: dict[str, int] = {}
    for m in sorted(mentions, key=lambda r: (r["chunk_id"], r["entity_key"],
                                             r["type"], r["position"])):
        p = sc.get(entity_id_for(m["type"], m["entity_key"]))
        if p:
            # engine reads confidence from float32 Parquet — round-trip it
            conf = float(np.float32(m["confidence"]))
            contrib[m["chunk_id"]] += p * conf
            y = m["valid_from"].year if m["valid_from"] is not None else ref_year
            year[m["chunk_id"]] = max(year.get(m["chunk_id"], 0), y)
    rows = []
    for cid in sorted(contrib):
        age = max(0, ref_year - year[cid])
        score = float(round_half_away(
            np.array([contrib[cid] * (decay ** age)]), 8)[0])
        rows.append({"chunk_id": cid, "score": score})
    rows.sort(key=lambda r: (-r["score"], r["chunk_id"]))
    return rows[:k]


def entity_match_seq(mentions: list[dict], names: list[str],
                     k: int = 10) -> list[dict]:
    """Sequential entity-match chunk search (Q5)."""
    from ..functions.normalize import surface_key
    from ..functions.rounding import round_half_away

    want = {surface_key(n) for n in names}
    per_chunk: dict[str, set] = defaultdict(set)
    for m in mentions:
        if m["entity_key"] in want:
            per_chunk[m["chunk_id"]].add(m["entity_key"])
    rows = [
        {"chunk_id": cid,
         "score": float(round_half_away(
             np.array([len(keys) / len(want)]), 6)[0])}
        for cid, keys in per_chunk.items()
    ]
    rows.sort(key=lambda r: (-r["score"], r["chunk_id"]))
    return rows[:k]


def hybrid_seq(chunks: list[dict], mentions: list[dict], query_text: str,
               entity_names: list[str], k: int = 10,
               rrf_c: int = 60) -> list[dict]:
    """Sequential hybrid RRF (vector rank + entity rank)."""
    from ..functions.embed import embed_text
    from ..functions.rounding import round_half_away

    q = embed_text(query_text).astype(np.float64)
    qn = float(np.linalg.norm(q))
    vec_rows = []
    for c in chunks:
        # engine stores embeddings as float32 then scores in float64
        v = embed_text(c["text"]).astype(np.float32).astype(np.float64)
        n = float(np.linalg.norm(v))
        denom = (n * qn) or np.inf
        cos = float(round_half_away(np.array([float(v @ q) / denom]), 6)[0])
        vec_rows.append({"chunk_id": c["chunk_id"], "cosine": cos})
    vec_rows.sort(key=lambda r: (-r["cosine"], r["chunk_id"]))
    vec_rank = vec_rows[:100]
    ent_rank = entity_match_seq(mentions, entity_names, k=100)

    scores: dict[str, float] = {}
    for rank, row in enumerate(vec_rank, start=1):
        cid = row["chunk_id"]
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
    for rank, row in enumerate(ent_rank, start=1):
        cid = row["chunk_id"]
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
    out = [
        {"chunk_id": cid,
         "rrf_score": float(round_half_away(np.array([s]), 8)[0])}
        for cid, s in scores.items()
    ]
    out.sort(key=lambda r: (-r["rrf_score"], r["chunk_id"]))
    return out[:k]


def rag_seq(chunks: list[dict], mentions: list[dict], nodes: list[dict],
            k: int = 5, max_context_length: int = RAG_MAX_CONTEXT_LENGTH,
            ) -> list[dict]:
    """Sequential 5-node RAG loop (Q9, reference rag/graph.py:94-345): one
    query at a time — per-query full-corpus rescoring, dict hydration, then
    context/answer/verify via the shared pure kernels. The batched engine
    (pipelines/rag.py) must match this row-for-row: that checks the
    multi-query single-pass retrieval, the per-batch top-k truncation and
    the distributed hydration against the obvious per-query loop."""
    from ..functions.context_format import (
        KEY_ENTITY_LIMIT,
        build_context,
    )
    from ..functions.embed import embed_text
    from ..functions.normalize import surface_key
    from ..functions.rounding import round_half_away
    from ..pipelines.rag import (
        NO_ANSWER_SENTINEL,
        NO_CONTEXT_SENTINEL,
        AnswerStage,
        DeterministicLlm,
        render_prompt,
        synth_rag_queries,
        understand_queries,
    )

    understood = understand_queries(synth_rag_queries(nodes))

    # chunk embeddings once (engine stores float32, scores in float64)
    chunk_vecs = [
        (c["chunk_id"],
         embed_text(c["text"]).astype(np.float32).astype(np.float64))
        for c in chunks
    ]
    by_chunk_ment: dict[str, list[dict]] = defaultdict(list)
    for m in mentions:
        by_chunk_ment[m["chunk_id"]].append(m)
    chunk_info = {
        c["chunk_id"]: {
            "document_title": c["url"], "text": c["text"],
            "created_at": c["valid_from"],
            "entities": [m["surface"] for m in sorted(
                by_chunk_ment[c["chunk_id"]],
                key=lambda m: m["position"])],
        }
        for c in chunks
    }

    llm = DeterministicLlm()
    rows = []
    for q in understood:
        qv = embed_text(q["query"]).astype(np.float64)
        qn = float(np.linalg.norm(qv))
        vec_rows = []
        for cid, v in chunk_vecs:
            n = float(np.linalg.norm(v))
            denom = (n * qn) or np.inf
            cos = float(round_half_away(
                np.array([float(v @ qv) / denom]), 6)[0])
            vec_rows.append((cid, cos))
        vec_rows.sort(key=lambda r: (-r[1], r[0]))
        vec_rank = [cid for cid, _ in vec_rows[:100]]

        names = q["entities_detected"]
        ent_rank: list[str] = []
        if names:
            ent_rows = entity_match_seq(mentions, names, k=100)
            ent_rank = [r["chunk_id"] for r in ent_rows]

        scores: dict[str, float] = {}
        for rank, cid in enumerate(vec_rank, start=1):
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (60 + rank)
        for rank, cid in enumerate(ent_rank, start=1):
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (60 + rank)
        fused = [
            (cid, float(round_half_away(np.array([s]), 8)[0]))
            for cid, s in scores.items()
        ]
        fused.sort(key=lambda r: (-r[1], r[0]))
        top = [cid for cid, _ in fused[:k]]

        results = [
            {**chunk_info[cid],
             "entities": chunk_info[cid]["entities"][:KEY_ENTITY_LIMIT]}
            for cid in top if cid in chunk_info
        ]
        ctx = build_context(q["query"], results,
                            temporal_context=q["temporal_context"],
                            max_context_length=max_context_length)
        formatted = (ctx["formatted_context"] if results
                     else NO_CONTEXT_SENTINEL)
        row = {
            "query_id": q["query_id"], "query": q["query"],
            "query_type": q["query_type"],
            "temporal_detected": bool(q["temporal_detected"]),
            "n_entities": len(q["entities_detected"]),
            "num_results": ctx["metadata"]["num_results"],
            "context_length": len(formatted),
            "truncated": bool(ctx["metadata"]["truncated"]),
            "formatted_context": formatted,
            "entity_relationships": ctx["entity_relationships"],
            "temporal_context_str": ctx["temporal_context"],
        }
        answer = (NO_ANSWER_SENTINEL if formatted == NO_CONTEXT_SENTINEL
                  else llm(render_prompt(row)))
        verified, notes = AnswerStage._verify(row, answer)
        row.update({"answer": answer, "verified": verified,
                    "verification_notes": notes})
        del row["temporal_context_str"]
        rows.append(row)
    rows.sort(key=lambda r: r["query_id"])
    return rows


def shortest_path_seq(edges: list[dict], src: str, dst: str,
                      max_hops: int = 6) -> list[dict]:
    """BFS shortest path with deterministic (lexicographic-min predecessor)
    reconstruction — the oracle for Q4 (reference operations.py:532-567,
    ``shortestPath((a)-[*1..h]-(b))``). Returns (step, entity_id) rows;
    empty if unreachable within max_hops."""
    adj: dict[str, set] = defaultdict(set)
    for e in edges:
        adj[e["subj_id"]].add(e["obj_id"])
        adj[e["obj_id"]].add(e["subj_id"])
    # BFS levels from src
    pred: dict[str, str] = {}
    dist = {src: 0}
    frontier = [src]
    for depth in range(1, max_hops + 1):
        nxt = set()
        for u in sorted(frontier):
            for v in sorted(adj[u]):
                if v not in dist:
                    nxt.add(v)
                    # lexicographic-min predecessor (sorted scan order and
                    # explicit min keep this deterministic)
                    if v not in pred or u < pred[v]:
                        pred[v] = u
        for v in nxt:
            dist[v] = depth
        if dst in dist:
            break
        frontier = sorted(nxt)
        if not frontier:
            break
    if dst not in dist:
        return []
    path = [dst]
    while path[-1] != src:
        path.append(pred[path[-1]])
    path.reverse()
    return [{"step": i, "entity_id": n} for i, n in enumerate(path)]


def top_hubs(nodes: list[dict], n: int) -> list[str]:
    """Seed selection shared by ppr/bfs/shortest-path queries: highest
    mention_count, entity_id tiebreak."""
    ranked = sorted(nodes, key=lambda r: (-r["mention_count"], r["entity_id"]))
    return [r["entity_id"] for r in ranked[:n]]


# ---------------------------------------------------------------------------
# materializer
# ---------------------------------------------------------------------------

def materialize_kg_oracle(sf_dir: str) -> str:
    """Run every sequential oracle for ``sf_dir`` and write Parquet tables
    (cached across calls via a completion marker)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    final = oracle_dir(sf_dir)
    if os.path.exists(os.path.join(final, "_COMPLETE.json")):
        return final
    # build in a process-private dir and RENAME into place: concurrent
    # callers (pytest workers + bench) otherwise interleave writes and a
    # reader can see a torn parquet file. The loser of the rename race
    # discards its build and uses the winner's (complete) directory.
    out = f"{final}.build.{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    marker = os.path.join(out, "_COMPLETE.json")
    os.makedirs(out, exist_ok=True)

    from .kg_oracle import run_oracle

    pages = _pages_rows(sf_dir)
    res = run_oracle(pages, aliases=_alias_dict())

    def write(name: str, rows: list[dict], schema: pa.Schema) -> None:
        tbl = (pa.Table.from_pylist(rows, schema=schema)
               if rows else schema.empty_table())
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))

    ts = pa.timestamp("us")
    write("edges", [
        {"subj": e["source"], "subj_id": e["subj_id"],
         "pred": e["relationship"], "obj": e["target"],
         "obj_id": e["obj_id"], "valid_from": e["valid_from"],
         "confidence": e["confidence"]}
        for e in res["edges"]
    ], pa.schema([("subj", pa.string()), ("subj_id", pa.string()),
                  ("pred", pa.string()), ("obj", pa.string()),
                  ("obj_id", pa.string()), ("valid_from", ts),
                  ("confidence", pa.float32())]))
    write("nodes", [
        {"entity_id": n["entity_id"], "name": n["name"], "type": n["type"],
         "mention_count": n["mention_count"]}
        for n in res["nodes"]
    ], pa.schema([("entity_id", pa.string()), ("name", pa.string()),
                  ("type", pa.string()), ("mention_count", pa.int64())]))
    write("mentions", [
        {"url": m["url"], "chunk_id": m["chunk_id"], "type": m["type"],
         "entity_key": m["entity_key"], "confidence": m["confidence"],
         "valid_from": m["valid_from"]}
        for m in res["mentions"]
    ], pa.schema([("url", pa.string()), ("chunk_id", pa.string()),
                  ("type", pa.string()), ("entity_key", pa.string()),
                  ("confidence", pa.float32()), ("valid_from", ts)]))
    write("chunks", [
        {"url": c["url"], "chunk_id": c["chunk_id"],
         "chunk_index": c["chunk_index"], "token_count": c["token_count"],
         "text": c["text"]}
        for c in res["chunks"]
    ], pa.schema([("url", pa.string()), ("chunk_id", pa.string()),
                  ("chunk_index", pa.int64()), ("token_count", pa.int64()),
                  ("text", pa.large_string())]))

    # ---- derived graph-query oracles ----
    hubs = top_hubs(res["nodes"], PPR_SEED_COUNT)
    ppr_rows = ppr_seq(res["edges"], hubs)
    write("ppr", ppr_rows,
          pa.schema([("entity_id", pa.string()), ("score", pa.float64())]))
    write("ppr_chunks", ppr_chunks_seq(res["mentions"], ppr_rows, k=20),
          pa.schema([("chunk_id", pa.string()), ("score", pa.float64())]))
    write("hybrid",
          hybrid_seq(res["chunks"], res["mentions"], HYBRID_QUERY,
                     HYBRID_ENTITIES, k=HYBRID_K),
          pa.schema([("chunk_id", pa.string()),
                     ("rrf_score", pa.float64())]))
    write("shortest_path",
          shortest_path_seq(res["edges"], hubs[0], hubs[-1],
                            SHORTEST_PATH_MAX_HOPS),
          pa.schema([("step", pa.int64()), ("entity_id", pa.string())]))
    write("rag", rag_seq(res["chunks"], res["mentions"], res["nodes"]),
          pa.schema([("query_id", pa.int64()), ("query", pa.string()),
                     ("query_type", pa.string()),
                     ("temporal_detected", pa.bool_()),
                     ("n_entities", pa.int64()),
                     ("num_results", pa.int64()),
                     ("context_length", pa.int64()),
                     ("truncated", pa.bool_()),
                     ("formatted_context", pa.large_string()),
                     ("entity_relationships", pa.large_string()),
                     ("answer", pa.large_string()),
                     ("verified", pa.bool_()),
                     ("verification_notes", pa.string())]))

    # ---- per-document oracles over the raw documents table ----
    import pyarrow.parquet as _pq

    from ..functions.embed import embed_text
    from ..functions.hashing import simhash64, word_shingles
    from ..functions.rounding import round_half_away

    docs = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    write("embed_norms", [
        {"doc_id": d,
         "norm": float(round_half_away(np.array([float(np.linalg.norm(
             embed_text(t).astype(np.float32).astype(np.float64)))]), 4)[0])}
        for d, t in zip(doc_ids, texts)
    ], pa.schema([("doc_id", pa.int64()), ("norm", pa.float64())]))
    write("simhash", [
        {"doc_id": d,
         "h": int(np.uint64(simhash64(word_shingles(t, 2))).astype(np.int64))}
        for d, t in zip(doc_ids, texts)
    ], pa.schema([("doc_id", pa.int64()), ("h", pa.int64())]))

    # ---- ann_lsh_topk candidate set (seed-deterministic LSH) ----
    # Recompute the multi-table bucket assignment sequentially with the
    # exact parameters the registered query uses; a vector is a candidate
    # iff it shares a (table-encoded) bucket with the query vector. DuckDB
    # then rescores exactly within this set (cosine + vec_id tiebreak).
    from ..stages.similarity import LshAnnIndexStage

    emb_tbl = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    vec_ids = np.asarray(emb_tbl["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float64)
    stage = LshAnnIndexStage(vecs.shape[1], ANN_N_PLANES, ANN_N_TABLES,
                             ANN_SEED)
    all_buckets = stage.buckets_of(vecs)  # (n, n_tables) table-encoded
    q_row = all_buckets[vec_ids == ANN_QUERY_VEC_ID][0]
    is_cand = np.isin(all_buckets, q_row).any(axis=1)
    write("ann_candidates",
          [{"vec_id": int(v)} for v in sorted(vec_ids[is_cand])],
          pa.schema([("vec_id", pa.int64())]))

    # ---- J6 evaluation fixtures: question -> evidence url ----
    write("questions", [
        {"question_id": int(d), "url": p["url"]}
        for d, p in zip(doc_ids, pages)
    ], pa.schema([("question_id", pa.int64()), ("url", pa.string())]))

    with open(marker, "w") as f:
        json.dump({
            "version": ORACLE_VERSION, "sf_dir": sf_dir,
            "edges": len(res["edges"]), "nodes": len(res["nodes"]),
            "mentions": len(res["mentions"]), "chunks": len(res["chunks"]),
        }, f)
    try:
        os.rename(out, final)
    except OSError:
        # another process completed first — its directory is complete by
        # construction (rename-after-marker), use it
        shutil.rmtree(out, ignore_errors=True)
    return final
