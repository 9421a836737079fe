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

Scale: both tables stream through ONE bucketed groupby each (bucket =
hash(id) % 64) whose group task renders and writes ``part-<bucket>.csv``
(atomic tmp rename) — deterministic filenames, so a retried task
rewrites its own file instead of duplicating or colliding, and the
driver never holds rows. ``import.sh`` passes
``--multiline-fields=true`` because quoted cells may legally contain
newlines (LLM-extracted descriptions). On a multi-node cluster
``out_dir`` must be shared storage (the same constraint as every file
sink here).
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
    # pandas-group rows hand lists over as numpy arrays, and a NULL
    # list column arrives as None/NaN — treat all of those as empty
    if vals is None or not hasattr(vals, "__len__") or len(vals) == 0:
        return ""
    return _csv_cell(";".join(
        str(v).replace(";", ",") for v in vals if v is not None))


def _ts_cell(v) -> str:
    import pandas as pd

    # pandas groups surface NULL timestamps as NaT, not None
    if v is None or pd.isna(v):
        return ""
    return v.isoformat()


def _write_part(out_sub: str, lines: list[str], task_tag: str) -> None:
    os.makedirs(out_sub, exist_ok=True)
    final = os.path.join(out_sub, f"part-{task_tag}.csv")
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    os.replace(tmp, final)


def export_neo4j_csv(store_dir: str, out_dir: str,
                     num_buckets: int = 64) -> dict:
    """Render ``store_dir``'s nodes/edges Parquet as neo4j-admin import
    CSVs under ``out_dir``; returns {entities, relationships, out}."""
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.hashing import hash64_vec

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # import.sh references entities/part-*.csv and
    # relationships/part-*.csv unconditionally — create both dirs (and
    # an empty part file each) up front so the emitted script runs on a
    # valid-but-empty graph instead of failing on a missing glob.
    for sub in ("entities", "relationships"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        _write_part(os.path.join(out_dir, sub), [], "00000")

    def bucketer(key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            b = (hash64_vec([x or "" for x in t[key_col].to_pylist()])
                 % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("_csv_bucket", pa.array(b))

        return fn

    def node_rows(g: pd.DataFrame) -> pd.DataFrame:
        lines = []
        for r in g.to_dict("records"):
            lines.append(",".join([
                _csv_cell(r["entity_id"]), _csv_cell(r["name"]),
                _csv_cell(r["type"]), _ts_cell(r["first_seen"]),
                _ts_cell(r["last_seen"]),
                str(int(r["mention_count"])
                    if pd.notna(r["mention_count"]) else 0),
                _arr_cell(r["aliases"]), "Entity"]))
        if not len(g):
            # empty group: write NOTHING — falling back to bucket 0
            # would os.replace-clobber the real bucket-0 part file
            return pd.DataFrame({"n": [0]})
        bucket = int(g["_csv_bucket"].iloc[0])
        _write_part(os.path.join(out_dir, "entities"), lines,
                    f"{bucket:05d}")
        return pd.DataFrame({"n": [len(lines)]})

    def edge_rows(g: pd.DataFrame) -> pd.DataFrame:
        lines = []
        for r in g.to_dict("records"):
            lines.append(",".join([
                _csv_cell(r["subj_id"]), _csv_cell(r["obj_id"]),
                rel_type_of(r["pred"]), _csv_cell(r["subj"]),
                _csv_cell(r["obj"]), _ts_cell(r["valid_from"]),
                _ts_cell(r["valid_to"]), _csv_cell(r["description"]),
                str(r["confidence"])
                if pd.notna(r["confidence"]) else "",
                _arr_cell(r["source_chunks"])]))
        if not len(g):
            # empty group: write NOTHING — falling back to bucket 0
            # would os.replace-clobber the real bucket-0 part file
            return pd.DataFrame({"n": [0]})
        bucket = int(g["_csv_bucket"].iloc[0])
        _write_part(os.path.join(out_dir, "relationships"), lines,
                    f"{bucket:05d}")
        return pd.DataFrame({"n": [len(lines)]})

    n_nodes = int(rd.read_parquet(os.path.join(store_dir, "nodes"))
                  .map_batches(bucketer("entity_id"),
                               batch_format="pyarrow")
                  .groupby("_csv_bucket")
                  .map_groups(node_rows, batch_format="pandas")
                  .sum(on="n") or 0)
    n_edges = int(rd.read_parquet(os.path.join(store_dir, "edges"))
                  .map_batches(bucketer("subj_id"),
                               batch_format="pyarrow")
                  .groupby("_csv_bucket")
                  .map_groups(edge_rows, batch_format="pandas")
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
            "  --array-delimiter=';' --multiline-fields=true neo4j\n")
    return {"entities": n_nodes, "relationships": n_edges,
            "out": out_dir}
