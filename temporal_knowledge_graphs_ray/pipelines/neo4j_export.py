"""Neo4j bulk-import bridge: Parquet graph store -> neo4j-admin CSVs.

The reference materializes its graph INTO Neo4j (graph/schema.py:
Entity/Chunk nodes, MENTIONS + typed entity-entity relationships);
this engine materializes to partitioned Parquet instead. This exporter
closes the loop for reference users: it renders the store as
`neo4j-admin database import full`-ready CSVs, so a graph built here
loads straight into the reference's serving stack.

Layout under ``out_dir``::

    entities_header.csv            one header line
    entities/part-*.csv            data rows, no header (one file per
                                   input block, written by its own task)
    relationships_header.csv
    relationships/part-*.csv
    import.sh                      the neo4j-admin command wired up

Format notes (neo4j-admin CSV conventions):
- node id space: ``id:ID(Entity)``; label emitted per row (:LABEL).
- relationship type = the edge's ``pred`` sanitized to a legal Neo4j
  type name (uppercased, non-alphanumerics -> ``_``) via ``:TYPE``.
- array fields (aliases, source_chunks) join with ``;`` — Neo4j's
  array delimiter. A ``;`` INSIDE a value would split wrongly, so it
  is replaced with ``,`` (documented lossy edge; entity aliases are
  names, where this is cosmetic).
- timestamps render ISO-8601 (``:datetime`` header suffix).

Scale: both tables stream block-by-block; each map task writes its own
CSV part file (atomic tmp rename) — the driver never holds rows, and a
re-run replaces the output deterministically. Part filenames derive
from the BATCH CONTENT (first id, row count), so a retried task
rewrites the same file instead of duplicating rows. On a multi-node
cluster ``out_dir`` must be shared storage (the same constraint as
every file sink here).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

_TYPE_RE = re.compile(r"[^0-9A-Za-z_]")

ENTITY_HEADER = ("id:ID(Entity),name,type,first_seen:datetime,"
                 "last_seen:datetime,mention_count:long,"
                 "aliases:string[],:LABEL")
REL_HEADER = (":START_ID(Entity),:END_ID(Entity),:TYPE,subj,obj,"
              "valid_from:datetime,valid_to:datetime,description,"
              "confidence:double,source_chunks:string[]")


def rel_type_of(pred: str | None) -> str:
    """Edge pred -> legal Neo4j relationship type (RELATED_TO for
    empty)."""
    t = _TYPE_RE.sub("_", (pred or "").strip().upper())
    t = re.sub("_+", "_", t).strip("_")
    return t or "RELATED_TO"


def _csv_cell(v) -> str:
    if v is None:
        return ""
    s = str(v)
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s


def _arr_cell(vals) -> str:
    if not vals:
        return ""
    return _csv_cell(";".join(
        str(v).replace(";", ",") for v in vals if v is not None))


def _ts_cell(v) -> str:
    return v.isoformat() if v is not None else ""


def _write_part(out_sub: str, lines: list[str], task_tag: str) -> None:
    os.makedirs(out_sub, exist_ok=True)
    final = os.path.join(out_sub, f"part-{task_tag}.csv")
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    os.replace(tmp, final)


def export_neo4j_csv(store_dir: str, out_dir: str) -> dict:
    """Render ``store_dir``'s nodes/edges Parquet as neo4j-admin import
    CSVs under ``out_dir``; returns {entities, relationships, out}."""
    import hashlib
    import shutil

    import ray.data as rd

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def node_rows(t: pa.Table) -> pa.Table:
        lines = []
        for r in t.to_pylist():
            lines.append(",".join([
                _csv_cell(r["entity_id"]), _csv_cell(r["name"]),
                _csv_cell(r["type"]), _ts_cell(r["first_seen"]),
                _ts_cell(r["last_seen"]), str(r["mention_count"] or 0),
                _arr_cell(r["aliases"]), "Entity"]))
        tag = hashlib.sha1(
            f"{lines[0] if lines else ''}|{len(lines)}".encode()
        ).hexdigest()[:12]
        _write_part(os.path.join(out_dir, "entities"), lines, tag)
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    def edge_rows(t: pa.Table) -> pa.Table:
        lines = []
        for r in t.to_pylist():
            lines.append(",".join([
                _csv_cell(r["subj_id"]), _csv_cell(r["obj_id"]),
                rel_type_of(r["pred"]), _csv_cell(r["subj"]),
                _csv_cell(r["obj"]), _ts_cell(r["valid_from"]),
                _ts_cell(r["valid_to"]), _csv_cell(r["description"]),
                str(r["confidence"] if r["confidence"] is not None
                    else ""),
                _arr_cell(r["source_chunks"])]))
        tag = hashlib.sha1(
            f"{lines[0] if lines else ''}|{len(lines)}".encode()
        ).hexdigest()[:12]
        _write_part(os.path.join(out_dir, "relationships"), lines, tag)
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    n_nodes = int(rd.read_parquet(os.path.join(store_dir, "nodes"))
                  .map_batches(node_rows, batch_format="pyarrow")
                  .sum(on="n") or 0)
    n_edges = int(rd.read_parquet(os.path.join(store_dir, "edges"))
                  .map_batches(edge_rows, batch_format="pyarrow")
                  .sum(on="n") or 0)

    with open(os.path.join(out_dir, "entities_header.csv"), "w") as f:
        f.write(ENTITY_HEADER + "\n")
    with open(os.path.join(out_dir, "relationships_header.csv"),
              "w") as f:
        f.write(REL_HEADER + "\n")
    with open(os.path.join(out_dir, "import.sh"), "w") as f:
        f.write(
            "#!/bin/sh\n"
            "# neo4j-admin bulk import of the exported graph store\n"
            "neo4j-admin database import full \\\n"
            "  --nodes=entities_header.csv,entities/part-.*\\.csv \\\n"
            "  --relationships=relationships_header.csv,"
            "relationships/part-.*\\.csv \\\n"
            "  --array-delimiter=';' neo4j\n")
    return {"entities": n_nodes, "relationships": n_edges,
            "out": out_dir}
