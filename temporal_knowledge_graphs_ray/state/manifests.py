"""Per-partition lineage manifests + checkpoint markers (north_rule).

Output layout written by the pipeline:

    out_dir/
      chunks/part=K/*.parquet
      mentions/part=K/*.parquet
      nodes/*.parquet                (small, unpartitioned)
      edges/part=K/*.parquet
      _manifests/<table>-part-K.json   <- lineage + completion marker
      _manifests/_run.json             <- run-level metrics

A partition K of a table is COMPLETE iff its manifest file exists (the
manifest is written atomically via tmp+rename AFTER the partition's data).
A killed run is resumed by filtering input pages to partitions without an
``edges`` manifest — partition-granular resume of the whole construction
chain, since every table inherits ``part = hash(url) % P``.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_DIR = "_manifests"


def _manifest_path(out_dir: str, table: str, part: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{table}-part-{part}.json")


def write_manifest(out_dir: str, table: str, part: int,
                   payload: dict[str, Any]) -> None:
    """Atomic write (tmp + rename): the marker appears only when complete."""
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(out_dir, table, part)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"table": table, "part": part, **payload}, f, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(out_dir: str, table: str, part: int) -> dict | None:
    path = _manifest_path(out_dir, table, part)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def completed_parts(out_dir: str, table: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    prefix = f"{table}-part-"
    out = set()
    for fn in os.listdir(mdir):
        if fn.startswith(prefix) and fn.endswith(".json"):
            out.add(int(fn[len(prefix):-len(".json")]))
    return out


URL_HASH_SCHEME = "siphash64"  # pd.util.hash_array, fixed default key


def write_layout(out_dir: str, num_partitions: int) -> None:
    """Persist the partition-layout decision BEFORE any data is written
    (atomic tmp+rename). Resume / increment / supersede runs must reuse
    this count — a drifting layout would mis-assign urls to parts. The
    url->part hash scheme is recorded too: a layout is only addressable
    with the exact hash that wrote it."""
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    path = os.path.join(out_dir, MANIFEST_DIR, "_layout.json")
    if os.path.exists(path):
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_partitions": int(num_partitions),
                   "url_hash": URL_HASH_SCHEME}, f)
    os.replace(tmp, path)


def read_layout(out_dir: str) -> int | None:
    """Recorded partition count for an existing output dir (layout
    manifest, falling back to the run manifest for pre-layout outputs)."""
    for name in ("_layout.json", "_run.json"):
        path = os.path.join(out_dir, MANIFEST_DIR, name)
        if os.path.exists(path):
            with open(path) as f:
                n = json.load(f).get("num_partitions")
            if n:
                return int(n)
    return None


def read_layout_scheme(out_dir: str) -> str | None:
    """url->part hash scheme the existing output was partitioned with.

    ``_layout.json`` outputs are siphash64 (the layout manifest postdates
    the hash switch, and newer manifests record the scheme explicitly);
    an output with only the pre-layout ``_run.json`` was partitioned with
    the legacy per-url md5 (``stable_hash64``) — resuming it with the
    current hash would silently misassign partitions, so callers must
    REFUSE it. None = no recorded layout at all (fresh dir)."""
    lpath = os.path.join(out_dir, MANIFEST_DIR, "_layout.json")
    if os.path.exists(lpath):
        with open(lpath) as f:
            return json.load(f).get("url_hash", URL_HASH_SCHEME)
    rpath = os.path.join(out_dir, MANIFEST_DIR, "_run.json")
    if os.path.exists(rpath):
        return "legacy-md5"
    return None


def write_run_manifest(out_dir: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    path = os.path.join(out_dir, MANIFEST_DIR, "_run.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True, default=str)
    os.replace(tmp, path)


def verify_output(out_dir: str) -> dict:
    """Output-layout verification (the reference's ``init_db.py
    --verify-only`` schema check, graph/schema.py:344-392, applied to the
    Parquet graph store): tables present, schemas match the engine's
    published schemas, every data partition has a completion marker.
    Returns {"ok": bool, "problems": [...], "tables": {...}}.
    """
    import pyarrow.dataset as pads

    from ..pipelines.kg import EDGES_SCHEMA, NODES_SCHEMA

    problems: list[str] = []
    tables: dict[str, dict] = {}

    def check(table: str, required_fields: dict | None, partitioned: bool):
        path = os.path.join(out_dir, table)
        if not os.path.isdir(path):
            problems.append(f"missing table dir: {table}")
            return
        try:
            ds = pads.dataset(path, format="parquet",
                              partitioning="hive" if partitioned else None)
            schema = ds.schema
            n_rows = sum(f.metadata.num_rows for f in ds.get_fragments())
        except Exception as exc:  # unreadable parquet
            problems.append(f"{table}: unreadable ({exc})")
            return
        names = set(schema.names)
        if required_fields:
            for fname, ftype in required_fields.items():
                if fname not in names:
                    problems.append(f"{table}: missing column {fname}")
                elif ftype is not None and schema.field(fname).type != ftype:
                    problems.append(
                        f"{table}.{fname}: type {schema.field(fname).type}"
                        f" != {ftype}")
        if partitioned:
            data_parts = set()
            for frag in ds.get_fragments():
                for piece in frag.path.split(os.sep):
                    if piece.startswith("part="):
                        data_parts.add(int(piece[len("part="):]))
            marked = completed_parts(out_dir, table)
            unmarked = data_parts - marked
            if unmarked:
                problems.append(
                    f"{table}: partitions without completion markers: "
                    f"{sorted(unmarked)}")
        tables[table] = {"rows": n_rows, "columns": sorted(names)}

    edge_req = {f.name: f.type for f in EDGES_SCHEMA
                if f.name != "part"}
    node_req = {f.name: f.type for f in NODES_SCHEMA}
    check("edges", edge_req, partitioned=True)
    check("nodes", node_req, partitioned=False)
    check("mentions", None, partitioned=True)
    check("chunk_ents", None, partitioned=True)
    return {"ok": not problems, "problems": problems, "tables": tables}
