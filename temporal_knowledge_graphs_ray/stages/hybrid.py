"""Hybrid (sparse + dense) document retrieval with RRF fusion.

The reference's hybrid search fuses a Neo4j/Lucene full-text list with
a vector-similarity list via reciprocal-rank fusion
(retrieval/hybrid_search.py:106-163). ``q_rrf_fusion``
(pipelines/queries.py) covers the fusion arithmetic over generic
ranked lists; THIS wires the real retrieval legs together over a
document corpus:

- sparse leg: BM25 over the bucketed posting index (stages/bm25.py) —
  query-term-pruned scans only, never a corpus scan;
- dense leg: the house deterministic embedder (functions/embed.py)
  over an actor pool + brute-force cosine top-k with the per-block
  partial-top-k bound (stages/similarity.py) — swap in
  ``AnnIndex``/``IvfIndex`` when the corpus outgrows brute force;
- fusion: RRF ``sum_l 1 / (c + rank_l(d))`` over the two k-bounded
  lists, driver-side by design (inputs are ≤ n_each rows each).

Scale notes: both legs are fully distributed; the driver only ever
holds the two top-n lists, so memory is O(n_each) regardless of
corpus size. Pass a prebuilt/persisted ``Bm25Index`` and a Dataset
that already carries an embedding column to make repeated queries
index-speed (build-once / query-many, the Neo4j-index analogue).
"""

from __future__ import annotations

import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import embed_texts
from ..functions.rounding import round_half_away


def rrf_fuse(ranked_lists: dict[str, list], c: int = 60,
             id_name: str = "id") -> pd.DataFrame:
    """Fuse ranked id lists: score(d) = sum over lists of
    1/(c + rank) with 1-based ranks; ties break score desc, id asc.
    Also emits each list's rank as ``rank_<name>`` (0 = absent)."""
    scores: dict = {}
    ranks: dict[str, dict] = {}
    for name, ids in ranked_lists.items():
        ranks[name] = {}
        for rank, did in enumerate(ids, start=1):
            scores[did] = scores.get(did, 0.0) + 1.0 / (c + rank)
            ranks[name][did] = rank
    out = pd.DataFrame({id_name: list(scores),
                        "rrf_score": list(scores.values())})
    out["rrf_score"] = round_half_away(out["rrf_score"], 6)
    for name in ranked_lists:
        out[f"rank_{name}"] = [ranks[name].get(d, 0)
                               for d in out[id_name]]
    return out.sort_values(["rrf_score", id_name],
                           ascending=[False, True], ignore_index=True)


def hybrid_search(docs, query_text: str, k: int = 10, n_each: int = 50,
                  c: int = 60, id_col: str = "doc_id",
                  text_col: str = "text", bm25_index=None,
                  embedded=None, num_buckets: int = 64,
                  cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Top-k (id, rrf_score, rank_bm25, rank_dense) for ``query_text``
    over a (id, text) document Dataset. ``bm25_index`` / ``embedded``
    (a Dataset with ``embedding``) reuse prebuilt legs."""
    from .bm25 import Bm25Index
    from .embed import embed_documents
    from .similarity import knn_brute_force

    idx = bm25_index if bm25_index is not None else Bm25Index(
        docs, text_col=text_col, id_col=id_col, num_buckets=num_buckets)
    sparse = idx.score([query_text], k=n_each)

    if embedded is None:
        embedded = embed_documents(docs.select_columns([id_col, text_col]),
                                   text_col=text_col, cfg=cfg)
    qv = embed_texts([query_text], cfg.embed_dim, cfg.embed_ngram)[0]
    dense = knn_brute_force(embedded, qv, k=n_each,
                            id_col=id_col).to_pandas()

    fused = rrf_fuse({"bm25": sparse[id_col].tolist(),
                      # an empty corpus yields a column-less frame
                      "dense": dense[id_col].tolist()
                      if id_col in dense else []},
                     c=c, id_name=id_col)
    return fused.head(k).reset_index(drop=True)


def hybrid_search_many(docs, queries: list[str], k: int = 10,
                       n_each: int = 50, c: int = 60,
                       id_col: str = "doc_id", text_col: str = "text",
                       bm25_index=None, embedded=None,
                       num_buckets: int = 64,
                       cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Batched hybrid retrieval: BOTH legs process the whole query set
    in one corpus pass each (Bm25Index.score_many + the batched exact
    kNN), then each query fuses its two k-bounded lists driver-side.
    Returns (qi, id, rrf_score, rank_bm25, rank_dense) rows, <= k per
    query — identity-tested against per-query ``hybrid_search``."""
    import numpy as np

    from .bm25 import Bm25Index
    from .embed import embed_documents
    from .similarity import knn_brute_force_many

    idx = bm25_index if bm25_index is not None else Bm25Index(
        docs, text_col=text_col, id_col=id_col, num_buckets=num_buckets)
    sparse = idx.score_many(queries, k=n_each)

    if embedded is None:
        embedded = embed_documents(docs.select_columns([id_col, text_col]),
                                   text_col=text_col, cfg=cfg)
    qm = embed_texts(queries, cfg.embed_dim, cfg.embed_ngram) \
        .astype(np.float64)
    dense = knn_brute_force_many(embedded, qm, k=n_each, id_col=id_col)

    outs = []
    for qi in range(len(queries)):
        s_ids = sparse[sparse["qi"] == qi][id_col].tolist()
        d_ids = dense[dense["qi"] == qi][id_col].tolist()
        fused = rrf_fuse({"bm25": s_ids, "dense": d_ids},
                         c=c, id_name=id_col).head(k)
        fused.insert(0, "qi", qi)
        outs.append(fused)
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
        {"qi": [], id_col: [], "rrf_score": [],
         "rank_bm25": [], "rank_dense": []})
