"""Batch RAG orchestration (Q9) re-expressed as a Ray Data dataflow.

The reference serves one query at a time through a 5-node LangGraph state
machine (/root/reference/src/temporal_kg_rag/rag/graph.py:94-345):
understand_query -> retrieve -> build_context -> generate -> verify.
Each node is deterministic heuristics except ``generate`` (an LLM call).

Here the same five stages run over a BATCH of queries as dataset passes —
the shape a 100 TB corpus needs, where the expensive side is the corpus,
not the query list:

1. understand  — per-query heuristics (query-type keywords
   graph.py:142-153, temporal parse M13, entity extraction M14). Queries
   are the small side: computed on the driver and broadcast.
2. retrieve    — ``hybrid_search_many``: ONE embedding+cosine pass over
   the chunks dataset scores ALL queries (per-batch top-M per query keeps
   driver state at O(batches x n_q x M)), plus ONE mentions pass for the
   entity legs; RRF fusion per query (hybrid_search.py:34-163 semantics,
   identical to the single-query ``hybrid_search``).
3. build_context — one chunk_ents pass hydrates the union of retrieved
   chunk ids (bounded: n_q x k rows); per-query formatting via the M15
   kernels (functions/context_format.py).
4. generate    — actor-pool ``map_batches`` stage holding the pluggable
   LLM client (constructed once per actor); bounded retry with
   empty-answer-on-failure (entity_extractor.py:151-154 semantics). The
   default client is a deterministic template renderer — honest stand-in
   for the LLM, same role as the canned-response entity extractor.
5. verify      — the reference's answer-quality heuristics
   (graph.py:300-345): length check, citation-marker check, temporal-word
   check.

Scale notes: stages 2-3 stream the corpus; driver state is only
per-query rankings and the n_q x k hydrated context rows. For millions of
concurrent queries, shard the query list and run this pipeline per shard.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.context_format import (
    DEFAULT_MAX_CONTEXT_LENGTH,
    KEY_ENTITY_LIMIT,
    build_context,
)
from ..functions.query_parsing import (
    extract_query_entities,
    parse_temporal_query,
)
from ..functions.rounding import round_half_away

RAG_TOP_K = 5
RAG_VEC_POOL = 100  # depth of the vector ranking fed into RRF
NO_CONTEXT_SENTINEL = "No relevant information found."
NO_ANSWER_SENTINEL = ("I couldn't find any relevant information to answer "
                      "your question.")

_CITATION_MARKERS = ("source", "according to", "from", "document", "[")
_TEMPORAL_WORDS = ("year", "time", "period", "date", "recent", "current")

_COMPARISON_WORDS = ("compare", "difference", "versus")
_EVOLUTION_WORDS = ("history", "evolution", "changed")
_EXPLORATORY_WORDS = ("what", "explain", "describe")


# ---------------------------------------------------------------------------
# deterministic query synthesis (tests / driver parity)
# ---------------------------------------------------------------------------

_EXTRACTABLE_NAME_RE = re.compile(r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*")

# A lowercase word always precedes "{a}"/"{b}" — the M14 extractor merges
# ADJACENT capitalized words, so "Compare {a}" would swallow the name.
RAG_QUERY_TEMPLATES = [
    "What did {a} announce?",                      # exploratory
    "Compare results of {a} versus those of {b}",  # comparison
    "How has {a} changed over time?",              # evolution + history
    "Results for {a} in 2022",                     # factual + point-in-time
    "Latest report from {a}",                      # factual + latest
    "News from 2020 to 2023 about {a}",            # factual + time range
    "Describe the role of {a}",                    # exploratory
    "Who partnered with {a}?",                     # factual
]


def synth_rag_queries(node_rows: list[dict],
                      n: int | None = None) -> list[dict]:
    """Deterministic query batch from the nodes table: the top names by
    (mention_count desc, entity_id asc) whose spelling the M14
    capitalized-sequence extractor recovers exactly, woven into the fixed
    template set (one per query type / temporal shape)."""
    n = n if n is not None else len(RAG_QUERY_TEMPLATES)
    ranked = sorted(node_rows,
                    key=lambda r: (-r["mention_count"], r["entity_id"]))
    names: list[str] = []
    for r in ranked:
        if (_EXTRACTABLE_NAME_RE.fullmatch(r["name"])
                and r["name"] not in names):
            names.append(r["name"])
        if len(names) >= n:
            break
    if not names:
        names = ["Acme"]
    return [
        {"query_id": i,
         "query": RAG_QUERY_TEMPLATES[i % len(RAG_QUERY_TEMPLATES)].format(
             a=names[i % len(names)], b=names[(i + 1) % len(names)])}
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# stage 1: understand
# ---------------------------------------------------------------------------

def classify_query_type(query: str) -> str:
    """Keyword query-type heuristic (reference rag/graph.py:142-153)."""
    q = query.lower()
    if any(w in q for w in _COMPARISON_WORDS):
        return "comparison"
    if any(w in q for w in _EVOLUTION_WORDS):
        return "evolution"
    if any(w in q for w in _EXPLORATORY_WORDS):
        return "exploratory"
    return "factual"


def understand_queries(queries: list[dict]) -> list[dict]:
    """Node 1 over the (small) query list: adds query_type, the parsed
    TemporalContext and the detected entity names (graph.py:115-161)."""
    from ..functions.query_parsing import parse_temporal_query_llm_first

    out = []
    for q in queries:
        # keyword parser unless TKG_LLM_API_BASE routes the LLM leg
        tc = parse_temporal_query_llm_first(q["query"])
        out.append({
            **q,
            "query_type": classify_query_type(q["query"]),
            "temporal_context": tc,
            "temporal_detected": tc.has_temporal_reference,
            "entities_detected": extract_query_entities(q["query"]),
        })
    return out


# ---------------------------------------------------------------------------
# stage 2: retrieve (multi-query hybrid search, one corpus pass)
# ---------------------------------------------------------------------------

class _MultiQueryCosineStage:
    """Embed chunk texts and score them against ALL query vectors in one
    pass; emit only the per-batch top-``pool`` rows per query.

    Per-batch truncation is exact for the global top-``pool``: the order
    (cosine desc, chunk_id asc) is total, so any row cut here has >= pool
    rows in its own batch that also precede it globally.
    """

    def __init__(self, qmat: np.ndarray, pool: int = RAG_VEC_POOL):
        from ..stages.embed import EmbeddingStage

        self._embed = EmbeddingStage()
        self._q = np.asarray(qmat, dtype=np.float64)  # (n_q, d)
        self._qn = np.linalg.norm(self._q, axis=1)
        self._pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        vecs = self._embed._encode(
            [t if t and t.strip() else "" for t in texts]
        ).astype(np.float32).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        denom = np.outer(norms, self._qn)  # (rows, n_q)
        denom[denom == 0] = np.inf
        cos = round_half_away((vecs @ self._q.T) / denom, 6)

        out_qi: list[int] = []
        out_cid: list[str] = []
        out_cos: list[float] = []
        order = np.argsort(cids, kind="stable")  # chunk_id asc for ties
        for qi in range(cos.shape[1]):
            col = cos[order, qi]
            top = np.argsort(-col, kind="stable")[: self._pool]
            for j in top:
                out_qi.append(qi)
                out_cid.append(cids[order[j]])
                out_cos.append(float(col[j]))
        return pa.Table.from_pydict({
            "qi": pa.array(out_qi, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.string()),
            "cosine": pa.array(out_cos, pa.float64()),
        })


def hybrid_search_many(chunks_ds, mentions_ds, qlist: list[dict],
                       k: int = RAG_TOP_K, rrf_c: int = 60,
                       pool: int = RAG_VEC_POOL,
                       distributed_reduce: bool = False,
                       ) -> dict[int, pd.DataFrame]:
    """Multi-query hybrid retrieval: one chunks pass (vector leg for every
    query), one mentions pass (entity legs), RRF per query — per-query
    results identical to ``graph.hybrid_search`` (hybrid_search.py:34-163).

    ``qlist`` rows need ``query_id``, ``query`` and ``entities_detected``.
    Returns {query_id: DataFrame(chunk_id, rrf_score)} sorted by
    (rrf_score desc, chunk_id asc), k rows each.

    ``distributed_reduce``: the scoring pass emits top-``pool`` rows per
    query PER BATCH, so the collected candidate set grows with corpus
    size (batches x n_q x pool). False (default) collects it on the
    driver — right up to millions of pages.  True inserts a per-query
    ``groupby("qi")`` truncation first, so the driver only ever holds
    n_q x pool rows — the 100 TB setting (same output bit-for-bit: the
    per-batch truncation already preserves each query's global
    top-pool; output-identity tested in tests/test_rag.py).
    """
    from ..functions.embed import embed_text
    from ..functions.normalize import surface_key

    # ---- vector legs: one embedding+cosine pass over chunks ----
    qmat = np.stack([embed_text(q["query"]).astype(np.float64)
                     for q in qlist])
    # batch_size 512 (not larger): the hash embedder dominates this pass,
    # and small batches keep all cores busy even on a few-thousand-chunk
    # corpus; per-batch output is bounded (n_q x pool rows)
    scored_ds = (
        chunks_ds.select_columns(["chunk_id", "text"])
        .map_batches(_MultiQueryCosineStage(qmat, pool),
                     batch_format="pyarrow", batch_size=512)
    )
    if distributed_reduce:
        def _top_pool(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["cosine", "chunk_id"],
                                ascending=[False, True], kind="mergesort")
            return df.head(pool)

        # the groupby shuffle needs a materialization anyway; count() on
        # the materialized set is metadata-cheap and guards the empty
        # corpus (a schema-less dataset would make groupby("qi") raise
        # where the driver path below degrades gracefully)
        mat = scored_ds.materialize()
        if mat.count() == 0:
            scored = pd.DataFrame({"qi": [], "chunk_id": [],
                                   "cosine": []})
        else:
            scored = (mat.groupby("qi")
                      .map_groups(_top_pool, batch_format="pandas")
                      .to_pandas())
    else:
        scored = scored_ds.to_pandas()
    vec_ranks: dict[int, list[str]] = {}
    if scored.empty:  # empty corpus: no columns to group on
        scored = pd.DataFrame({"qi": [], "chunk_id": [], "cosine": []})
    for qi, g in scored.groupby("qi"):
        g = g.sort_values(["cosine", "chunk_id"], ascending=[False, True],
                          kind="mergesort")
        vec_ranks[int(qi)] = g["chunk_id"].head(pool).tolist()

    # ---- entity legs: one mentions pass for the union of name keys ----
    want_by_q: list[set[str]] = [
        {surface_key(n) for n in q.get("entities_detected", [])}
        for q in qlist
    ]
    all_keys = sorted(set().union(*want_by_q)) if want_by_q else []
    ent_ranks: dict[int, list[str]] = {qi: [] for qi in range(len(qlist))}
    if all_keys:
        want_arr = pa.array(all_keys)

        def match(t: pa.Table) -> pa.Table:
            # map-side distinct: repeated (chunk, key) mentions collapse
            # before the driver collect, not after
            hit = t.filter(pc.is_in(t["entity_key"], value_set=want_arr))
            return hit.group_by(["chunk_id", "entity_key"]).aggregate([])

        hits = (
            mentions_ds.select_columns(["chunk_id", "entity_key"])
            .map_batches(match, batch_format="pyarrow")
            .to_pandas().drop_duplicates()
        )
        if not hits.empty:
            for qi, want in enumerate(want_by_q):
                if not want:
                    continue
                mine = hits[hits["entity_key"].isin(want)]
                if mine.empty:
                    continue
                counts = mine.groupby("chunk_id")["entity_key"].nunique()
                scores = (counts / len(want)).rename("score").reset_index()
                scores["score"] = round_half_away(
                    scores["score"].to_numpy(), 6)
                scores = scores.sort_values(
                    ["score", "chunk_id"], ascending=[False, True],
                    kind="mergesort")
                ent_ranks[qi] = scores["chunk_id"].head(pool).tolist()

    # ---- RRF fusion per query (driver; n_q x pool rows) ----
    out: dict[int, pd.DataFrame] = {}
    for qi, q in enumerate(qlist):
        scores: dict[str, float] = {}
        for rank, cid in enumerate(vec_ranks.get(qi, []), start=1):
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
        for rank, cid in enumerate(ent_ranks.get(qi, []), start=1):
            scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
        df = pd.DataFrame({
            "chunk_id": list(scores),
            "rrf_score": round_half_away(
                np.array(list(scores.values()), dtype=np.float64), 8),
        })
        out[q["query_id"]] = (
            df.sort_values(["rrf_score", "chunk_id"],
                           ascending=[False, True], kind="mergesort",
                           ignore_index=True).head(k)
        )
    return out


# ---------------------------------------------------------------------------
# stage 3: build context (one hydration pass + M15 kernels)
# ---------------------------------------------------------------------------

def hydrate_chunks(chunk_ents_ds, chunk_ids: list[str]) -> dict[str, dict]:
    """One pass over chunk_ents collecting the retrieval-result fields for
    the given (bounded, n_q x k) id set: url (document-title surrogate —
    pages carry no separate title column), text, valid_from, and the
    position-ordered entity names (J5 hydrate analogue)."""
    if not chunk_ids:
        return {}
    want = pa.array(sorted(set(chunk_ids)))

    def pick(t: pa.Table) -> pa.Table:
        return t.select(["chunk_id", "url", "text", "valid_from", "entities"]
                        ).filter(pc.is_in(t["chunk_id"], value_set=want))

    rows = (chunk_ents_ds.map_batches(pick, batch_format="pyarrow")
            .to_pandas())
    out: dict[str, dict] = {}
    for r in rows.itertuples():
        ents = [] if r.entities is None else list(r.entities)
        ents.sort(key=lambda e: e["position"])
        out[r.chunk_id] = {
            "document_title": r.url,
            "text": r.text,
            "created_at": r.valid_from,
            "entities": [e["name"] for e in ents],
        }
    return out


# ---------------------------------------------------------------------------
# stages 4+5: generate (pluggable LLM, actor pool) + verify
# ---------------------------------------------------------------------------

_PROMPT_TEMPLATES = {
    # Original short templates with the reference's placeholder structure
    # (prompts.py template family); selection rule = graph.py:242-268.
    "comparison": ("Compare the items in the question using only the "
                   "sources below.\nQuestion: {query}\nTemporal scope: "
                   "{temporal_context}\nSources:\n{context}"),
    "evolution": ("Trace how the subject changed over time using only the "
                  "sources below.\nQuestion: {query}\nTemporal scope: "
                  "{temporal_context}\nSources:\n{context}"),
    "exploratory": ("Explain the subject using only the sources below.\n"
                    "Question: {query}\nTemporal scope: {temporal_context}\n"
                    "Sources:\n{context}"),
    "temporal": ("Answer for the requested time period using only the "
                 "sources below.\nQuestion: {query}\nTemporal scope: "
                 "{temporal_context}\nSources:\n{context}"),
    "factual": ("Answer the question using only the sources below.\n"
                "Question: {query}\nTemporal scope: {temporal_context}\n"
                "Sources:\n{context}"),
}

_SRC_LINE_RE = re.compile(r'^\[Source 1: "(?P<title>[^"]*)" '
                          r'\((?P<date>[^)]*)\)\]$', re.M)


def select_template(query_type: str, temporal_detected: bool) -> str:
    """Template selection (graph.py:242-268): explicit type wins, then the
    temporal template, then factual."""
    if query_type in ("comparison", "evolution", "exploratory"):
        return query_type
    return "temporal" if temporal_detected else "factual"


def render_prompt(row: dict) -> str:
    template = _PROMPT_TEMPLATES[select_template(row["query_type"],
                                                 row["temporal_detected"])]
    return template.format(
        query=row["query"],
        temporal_context=row.get("temporal_context_str")
        or "Current information",
        context=row["formatted_context"],
    )


class DeterministicLlm:
    """Default ``generate`` client: a deterministic template renderer.

    Stands in for the real LLM exactly like the canned-response entity
    extractor — it reads the prompt it is given and produces a cited,
    period-aware answer from the first source block, so the verify node has
    real signal to check. Swap in any ``callable(prompt) -> str`` (an HTTP
    LLM client) without touching the pipeline.
    """

    def __call__(self, prompt: str) -> str:
        m = _SRC_LINE_RE.search(prompt)
        if not m:
            return NO_ANSWER_SENTINEL
        title, date = m.group("title"), m.group("date")
        # first text line after the source header
        after = prompt[m.end():].lstrip("\n").splitlines()
        first_line = after[0].strip() if after else ""
        answer = (f'According to Source 1 ("{title}", {date}): {first_line}')
        scope_m = re.search(r"^Temporal scope: (.+)$", prompt, re.M)
        if scope_m and scope_m.group(1) != "Current information":
            answer += f" [time period: {scope_m.group(1)}]"
        return answer


class AnswerStage:
    """Nodes 4+5 as one actor-pool batch stage: render the prompt, call the
    (pluggable) client with bounded retry, then verify.

    Client construction happens once per actor in ``__init__``; a client
    that keeps failing yields the empty-answer sentinel for that query and
    the pipeline completes (generator.py:63-71 / graph.py:287-292
    error-row semantics).
    """

    def __init__(self, client_factory=None, max_attempts: int = 3):
        if client_factory is None:
            # live path is one env setting away (TKG_LLM_API_BASE):
            # the actor builds its HTTP client here, once — unset, the
            # deterministic renderer stays the default
            from ..functions.llm_client import client_factory_from_env

            client_factory = client_factory_from_env()
        self._client = (client_factory or DeterministicLlm)()
        self._max_attempts = max_attempts

    def _call_with_retry(self, prompt: str) -> str | None:
        for attempt in range(self._max_attempts):
            try:
                return self._client(prompt)
            except Exception:
                if attempt == self._max_attempts - 1:
                    return None
        return None

    def _generate(self, row: dict) -> str:
        if row["formatted_context"] == NO_CONTEXT_SENTINEL:
            return NO_ANSWER_SENTINEL
        answer = self._call_with_retry(render_prompt(row))
        return answer if answer is not None else "Error generating answer"

    @staticmethod
    def _verify(row: dict, answer: str) -> tuple[bool, str | None]:
        """Answer-quality heuristics (graph.py:300-345)."""
        notes: list[str] = []
        verified = True
        if not answer or len(answer) < 10:
            verified = False
            notes.append("Answer is too short or empty")
        low = answer.lower()
        has_citation = any(mk in low for mk in _CITATION_MARKERS)
        if not has_citation and row["num_results"] > 0:
            notes.append("Answer may lack proper source citations")
        if row["temporal_detected"] and not any(
                w in low for w in _TEMPORAL_WORDS):
            notes.append("Answer may lack temporal context despite "
                         "temporal query")
        return verified, "; ".join(notes) if notes else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        answers, verifieds, notes_col = [], [], []
        for row in batch.to_dict("records"):
            answer = self._generate(row)
            ok, notes = self._verify(row, answer)
            answers.append(answer)
            verifieds.append(ok)
            notes_col.append(notes)
        out = batch.copy()
        out["answer"] = answers
        out["verified"] = verifieds
        # explicit string dtype: an all-None batch must still carry a
        # string column (Arrow null type breaks schema comparison)
        out["verification_notes"] = pd.array(notes_col, dtype="string")
        return out


# ---------------------------------------------------------------------------
# the full 5-node batch pipeline
# ---------------------------------------------------------------------------

RAG_OUTPUT_COLUMNS = [
    "query_id", "query", "query_type", "temporal_detected", "n_entities",
    "num_results", "context_length", "truncated", "formatted_context",
    "entity_relationships", "answer", "verified", "verification_notes",
]


def rag_answer_batch(chunks_ds, mentions_ds, queries: list[dict],
                     client_factory=None, k: int = RAG_TOP_K,
                     max_context_length: int = DEFAULT_MAX_CONTEXT_LENGTH,
                     distributed_reduce: bool = False,
                     ) -> pd.DataFrame:
    """Run understand -> retrieve -> build_context -> generate -> verify
    over a batch of ``{"query_id", "query"}`` rows; one result row per
    query, sorted by query_id. See module docstring for the stage shapes.
    """
    import ray.data as rd

    understood = understand_queries(queries)
    retrieved = hybrid_search_many(chunks_ds, mentions_ds, understood, k=k,
                                   distributed_reduce=distributed_reduce)

    all_ids = [cid for df in retrieved.values() for cid in df["chunk_id"]]
    chunk_info = hydrate_chunks(chunks_ds, all_ids)

    rows = []
    for q in understood:
        hits = retrieved.get(q["query_id"])
        results = [
            {**chunk_info[cid], "entities":
                chunk_info[cid]["entities"][:KEY_ENTITY_LIMIT]}
            for cid in (hits["chunk_id"] if hits is not None else [])
            if cid in chunk_info
        ]
        ctx = build_context(q["query"], results,
                            temporal_context=q["temporal_context"],
                            max_context_length=max_context_length)
        # reference graph.py:204-216: an empty retrieval short-circuits
        # the context node with the no-context sentinel
        formatted = (ctx["formatted_context"] if results
                     else NO_CONTEXT_SENTINEL)
        rows.append({
            "query_id": q["query_id"],
            "query": q["query"],
            "query_type": q["query_type"],
            "temporal_detected": bool(q["temporal_detected"]),
            "n_entities": len(q["entities_detected"]),
            "num_results": ctx["metadata"]["num_results"],
            "context_length": len(formatted),
            "truncated": bool(ctx["metadata"]["truncated"]),
            "formatted_context": formatted,
            "entity_relationships": ctx["entity_relationships"],
            "temporal_context_str": ctx["temporal_context"],
        })

    per_query = pd.DataFrame(rows).sort_values("query_id",
                                               ignore_index=True)
    answered = (
        rd.from_pandas(per_query)
        .map_batches(AnswerStage, batch_format="pandas",
                     fn_constructor_kwargs={"client_factory": client_factory},
                     concurrency=1, batch_size=256)
        .to_pandas()
    )
    return (answered[RAG_OUTPUT_COLUMNS]
            .sort_values("query_id", ignore_index=True))
