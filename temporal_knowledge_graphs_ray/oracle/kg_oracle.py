"""Sequential KG-construction oracle.

Mirrors the reference's one-document-at-a-time loop
(/root/reference/src/temporal_kg_rag/ingestion/pipeline.py:57-155): load ->
extract text -> chunk -> extract entities -> extract relations -> dedup,
then the graph-wide canonicalization (consolidation.py:60-178) — but built
on exactly the same pure kernels as the Ray pipeline, so the distributed
result must match it row-for-row. P/R of the Ray pipeline's (subj, pred,
obj) triples against this oracle is the correctness gate (>= 0.95).

Driver-side only, test-scale only: everything in Python lists.
"""

from __future__ import annotations

from collections import defaultdict

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.chunking import chunk_text
from ..functions.hashing import md5_hex
from ..functions.html_text import extract_text_from_html
from ..functions.ner import MENTION_CONFIDENCE, extract_entities
from ..functions.normalize import surface_key
from ..functions.relations import extract_quads, merge_duplicate_relations
from ..stages.canonicalize import make_canonicalize_group_fn
from ..stages.entities import entity_id_for


def run_oracle(
    pages: list[dict],
    cfg: EngineConfig = DEFAULT_CONFIG,
    aliases: dict | None = None,
) -> dict:
    """pages rows -> {texts, chunks, mentions, nodes, edges} (python rows)."""
    import pandas as pd

    aliases = aliases or {}
    texts, chunks, mentions, raw_edges = [], [], [], []

    for page in pages:
        url, warc_ts = page["url"], page["warc_ts"]
        text = extract_text_from_html(page["html"])
        texts.append({"url": url, "text": text})
        url_key = md5_hex(url)[:12]
        for row in chunk_text(text, cfg.chunk_size, cfg.chunk_overlap,
                              cfg.chunk_strategy):
            chunk_id = f"{url_key}#{row.chunk_index}"
            chunks.append({
                "url": url, "chunk_id": chunk_id,
                "chunk_index": row.chunk_index, "text": row.text,
                "token_count": row.token_count, "valid_from": warc_ts,
            })
            ents = extract_entities(row.text)
            type_of: dict[str, str] = {}
            for e in ents:
                type_of.setdefault(e["name"], e["type"])
                linked = aliases.get((e["type"], e["name"].lower()), e["name"])
                mentions.append({
                    "url": url, "chunk_id": chunk_id, "surface": e["name"],
                    "type": e["type"], "position": e["position"],
                    "mention_count": e["mention_count"],
                    "confidence": MENTION_CONFIDENCE, "valid_from": warc_ts,
                    "linked_name": linked, "entity_key": surface_key(linked),
                })
            if len(ents) >= 2:
                for q in extract_quads(row.text, [e["name"] for e in ents],
                                       warc_ts):
                    s_type = type_of.get(q["source"], "OTHER")
                    t_type = type_of.get(q["target"], "OTHER")
                    raw_edges.append({
                        "source": aliases.get((s_type, q["source"].lower()),
                                              q["source"]),
                        "subj_type": s_type,
                        "target": aliases.get((t_type, q["target"].lower()),
                                              q["target"]),
                        "obj_type": t_type,
                        "relationship": q["relationship"],
                        "valid_from": q["valid_from"],
                        "description": q["description"],
                        "confidence": q["confidence"],
                        "source_chunks": [chunk_id],
                    })

    # ---- canonicalization: same group kernel as the distributed stage ----
    group_fn = make_canonicalize_group_fn(cfg)
    by_block: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for m in mentions:
        by_block[(m["type"], m["entity_key"][:cfg.blocking_prefix_len])].append(m)
    canonical_rows = []
    for (etype, block), ms in sorted(by_block.items()):
        df = pd.DataFrame({
            "type": [etype] * len(ms),
            "entity_key": [m["entity_key"] for m in ms],
            "linked_name": [m["linked_name"] for m in ms],
            "cnt": [m["mention_count"] for m in ms],
            "first_seen": [m["valid_from"] for m in ms],
            "last_seen": [m["valid_from"] for m in ms],
        })
        canonical_rows.extend(group_fn(df).to_dict("records"))

    cmap = {
        (r["type"], r["entity_key"]): (r["entity_id"], r["name"])
        for r in canonical_rows
    }
    nodes = [
        {
            "entity_id": r["entity_id"], "name": r["name"], "type": r["type"],
            "first_seen": r["first_seen"], "last_seen": r["last_seen"],
            "mention_count": r["mention_count"], "aliases": r["aliases"],
        }
        for r in canonical_rows
        if r["entity_key"] == r["canonical_key"]
    ]

    rewritten = []
    for r in raw_edges:
        sid, sname = cmap.get(
            (r["subj_type"], surface_key(r["source"])),
            (entity_id_for(r["subj_type"], surface_key(r["source"])),
             r["source"]),
        )
        oid, oname = cmap.get(
            (r["obj_type"], surface_key(r["target"])),
            (entity_id_for(r["obj_type"], surface_key(r["target"])),
             r["target"]),
        )
        rewritten.append({
            "source": sname, "subj_id": sid, "target": oname, "obj_id": oid,
            "relationship": r["relationship"], "valid_from": r["valid_from"],
            "description": r["description"], "confidence": r["confidence"],
            "source_chunks": r["source_chunks"],
        })
    # key on entity ids, like the reference (relation_extractor.py:447-451)
    edges = merge_duplicate_relations(
        rewritten, key_fields=("subj_id", "obj_id"),
        max_source_chunks=cfg.max_source_chunks)

    return {
        "texts": texts,
        "chunks": chunks,
        "mentions": mentions,
        "nodes": nodes,
        "edges": edges,
    }


def triple_set(edges: list[dict]) -> set[tuple[str, str, str]]:
    return {
        (e.get("source", e.get("subj")), e["relationship"].lower()
         if "relationship" in e else e["pred"].lower(),
         e.get("target", e.get("obj")))
        for e in edges
    }


def precision_recall(
    ours: set[tuple], oracle: set[tuple]
) -> tuple[float, float]:
    if not ours or not oracle:
        return (0.0, 0.0)
    inter = len(ours & oracle)
    return inter / len(ours), inter / len(oracle)
