"""Partition compaction (OPTIMIZE) for the checkpointed KG store.

Every incremental ingest (pipelines/kg.py `ingest_increment`) APPENDS new
Parquet files into the existing ``<table>/part=K`` dirs — after many
increments a part holds many small files, which at 100 TB means bloated
footers, dead compression and a file-listing tax on every resume /
global-phase re-read.  This module rewrites each part's files into
size-targeted single-row-group files (content-identical, fewer files),
the batch-store analogue of Delta/Iceberg ``OPTIMIZE``.

Crash-safety reuses the purge swap protocol from pipelines/kg.py
(`_purge_urls_from_table`, itself modeled on the reference's
"supersede then recompute" lifecycle, operations.py): the compacted copy
is written to ``.purge_new/part=K`` by a Ray task, then two atomic
renames swap the dirs.  A kill in ANY window leaves a complete copy of
the part on disk — at the live path or parked — and
`_recover_purge_swaps` — which every store entry point (build/resume,
ingest_increment, supersede, purge, compaction) runs before reading the
checkpoint tables — finishes or discards the swap.  Unlike the
purge, compaction does NOT delete the part manifest during the swap:
row counts are unchanged by construction, so the manifest stays valid
in every crash window (deleting it would make a killed compaction look
like an incomplete partition to the resume path's garbage cleanup).

Scale notes:
- one Ray task per part; the driver only does metadata renames,
- a task holds at most ``target_bytes`` of input buffered (it streams the
  part's files one at a time and flushes a combined file whenever the
  buffered input reaches the target) — never the whole part,
- parts already consisting of a single file are skipped (no-op detected
  from the listing alone, no data read).

Storage contract (multi-node): the store dir must live on SHARED
storage every node mounts at the same path (NFS/FSx/blob-FUSE) — the
compaction task writes ``.purge_new`` on whichever node runs it and
the DRIVER then performs the two atomic renames, so both must see one
filesystem; same contract as the neo4j_export and jsonl-export sinks.
"""

from __future__ import annotations

import os
import shutil

# tables that accumulate appended files across increments; edges/nodes are
# rewritten wholesale by every global phase and never fragment
CHECKPOINT_TABLES = ("chunk_ents", "mentions", "edges_raw")


def _compact_part_files(pdir: str, tmp_dir: str, target_bytes: int) -> None:
    """Stream one part's files into size-targeted combined files under
    ``tmp_dir``.  Bounded memory: at most ``target_bytes`` of input is
    buffered; each output file is one combined row group (the same
    row-group coalescing rationale as stages/blocks.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tmp_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(pdir) if n.endswith(".parquet"))
    buf: list = []
    buf_bytes = 0
    out_i = 0

    def flush() -> None:
        nonlocal buf, buf_bytes, out_i
        if not buf:
            return
        t = pa.concat_tables(buf).combine_chunks()
        pq.write_table(t, os.path.join(tmp_dir, f"compact-{out_i}.parquet"))
        buf, buf_bytes = [], 0
        out_i += 1

    for name in names:
        path = os.path.join(pdir, name)
        size = os.path.getsize(path)
        if buf and buf_bytes + size > target_bytes:
            flush()
        buf.append(pq.read_table(path))
        buf_bytes += size
    flush()


def compact_table(out_dir: str, table: str,
                  target_bytes: int = 256 << 20) -> dict:
    """Compact every fragmented ``part=K`` dir of one table.

    Returns a report: parts touched, file and byte counts before/after.
    Content-identical by construction (files are concatenated in sorted
    name order; the global phases are order-independent anyway —
    tests/test_compact.py asserts bit-identical rebuilt edges/nodes).
    """
    import ray

    from .kg import _recover_purge_swaps, _write_part_manifests

    _recover_purge_swaps(out_dir, table)
    tdir = os.path.join(out_dir, table)
    report = {"table": table, "parts_compacted": 0,
              "files_before": 0, "files_after": 0,
              "bytes_before": 0, "bytes_after": 0}
    if not os.path.isdir(tdir):
        return report

    todo: list[int] = []
    for entry in sorted(os.listdir(tdir)):
        if not entry.startswith("part="):
            continue
        pdir = os.path.join(tdir, entry)
        files = [n for n in os.listdir(pdir) if n.endswith(".parquet")]
        report["files_before"] += len(files)
        report["bytes_before"] += sum(
            os.path.getsize(os.path.join(pdir, n)) for n in files)
        if len(files) >= 2:
            todo.append(int(entry[len("part="):]))

    if not todo:
        report["files_after"] = report["files_before"]
        report["bytes_after"] = report["bytes_before"]
        return report

    @ray.remote
    def compact_part(part: int) -> int:
        _compact_part_files(
            os.path.join(tdir, f"part={part}"),
            os.path.join(tdir, ".purge_new", f"part={part}"),
            target_bytes)
        return part

    done = ray.get([compact_part.remote(p) for p in todo])
    # swap on the driver (cheap metadata renames; the data moved remotely)
    for part in sorted(done):
        pdir = os.path.join(tdir, f"part={part}")
        tmp_new = os.path.join(tdir, ".purge_new", f"part={part}")
        if not os.path.isdir(tmp_new):
            continue
        old = os.path.join(tdir, ".purge_old", f"part={part}")
        os.makedirs(os.path.dirname(old), exist_ok=True)
        os.rename(pdir, old)
        os.rename(tmp_new, pdir)
        report["parts_compacted"] += 1
    shutil.rmtree(os.path.join(tdir, ".purge_new"), ignore_errors=True)
    shutil.rmtree(os.path.join(tdir, ".purge_old"), ignore_errors=True)
    _write_part_manifests(out_dir, table)

    for entry in sorted(os.listdir(tdir)):
        if not entry.startswith("part="):
            continue
        pdir = os.path.join(tdir, entry)
        files = [n for n in os.listdir(pdir) if n.endswith(".parquet")]
        report["files_after"] += len(files)
        report["bytes_after"] += sum(
            os.path.getsize(os.path.join(pdir, n)) for n in files)
    return report


def compact_store(out_dir: str, target_bytes: int = 256 << 20) -> dict:
    """Compact all checkpoint tables of a built KG store.

    Tables compact concurrently (one thread per table submitting its Ray
    tasks): a per-table ``ray.get`` barrier would otherwise idle the
    cluster between tables when a table has fewer fragmented parts than
    cores. Safe: tasks are per-part, and each table's swap/manifest
    metadata is touched only by its own thread."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(CHECKPOINT_TABLES)) as pool:
        reports = list(pool.map(
            lambda t: compact_table(out_dir, t, target_bytes),
            CHECKPOINT_TABLES))
    return {
        "tables": reports,
        "parts_compacted": sum(r["parts_compacted"] for r in reports),
        "files_before": sum(r["files_before"] for r in reports),
        "files_after": sum(r["files_after"] for r in reports),
        "bytes_before": sum(r["bytes_before"] for r in reports),
        "bytes_after": sum(r["bytes_after"] for r in reports),
    }
