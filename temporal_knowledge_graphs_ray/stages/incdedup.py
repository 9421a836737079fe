"""Cross-snapshot incremental dedup against a persisted fingerprint
store (scale addition — the recurring-crawl shape: each new crawl
must drop documents already in the accumulated corpus WITHOUT
re-reading the corpus text; the reference's nearest analogue is
recrawl supersession in pipelines/kg.py, which keys on url — this
keys on CONTENT).

The store holds only fingerprints: ``md5(trim(regexp_replace(
lower(text), '\\s+', ' ', 'g')))`` — the exact-dedup key from
functions/textstats.fingerprint, so membership has the same exact
DuckDB oracle as the in-corpus exact_dedup query. Appends are new
Parquet files (``inc-NNNNN``), never rewrites — a killed update
leaves a valid store (at worst missing the newest increment, which
re-running the increment regenerates; single-writer per store by
contract, like state/manifests.py).

Dedup semantics: among the NEW docs, one representative per
fingerprint (min id — exact_dedup's rule); drop representatives whose
fingerprint is already in the store.

Scale notes: the new increment is fingerprinted in one streaming
pass; the store side ships ONCE via ``ray.put`` as a zero-copy Arrow
array below ``broadcast_limit`` rows, and above it the membership
check becomes Ray's native LEFT ANTI hash join (both sides shuffle
once on the uniform fingerprint key — no skew by construction). At
100 TB the store is fingerprints only: ~32 bytes/doc, 3 orders of
magnitude smaller than the corpus.

Storage contract (multi-node): the fingerprint-store dir must live on
SHARED storage every node mounts at the same path — appends are
tmp-write + atomic ``os.replace`` on the driver, and worker tasks
read the store files directly; same contract as the compaction and
export sinks.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import add_fingerprint

_FP = "fingerprint"


def _store_files(store_dir: str) -> list[str]:
    if not os.path.isdir(store_dir):
        return []
    return sorted(
        os.path.join(store_dir, f) for f in os.listdir(store_dir)
        if f.endswith(".parquet"))


def _next_inc_path(store_dir: str) -> str:
    # max existing index + 1, NOT file count: compaction collapses the
    # store to one high-numbered file, so a count-derived name would
    # eventually collide with (and os.replace-overwrite) the compacted
    # file holding every historical fingerprint
    os.makedirs(store_dir, exist_ok=True)
    nxt = 0
    for f in _store_files(store_dir):
        stem = os.path.basename(f)
        try:
            nxt = max(nxt, int(stem[4:-8]) + 1)  # inc-NNNNN.parquet
        except ValueError:
            continue
    return os.path.join(store_dir, f"inc-{nxt:05d}.parquet")


def _write_increment(fp_ds, store_dir: str) -> int:
    """Append fingerprints as one new store file (atomic: written to a
    temp name, renamed into place). The write STREAMS batches through
    a ParquetWriter — driver memory is one batch, not the increment
    (a lifetime-store takedown rewrite funnels tens of GB through
    here); a zero-batch dataset publishes a valid empty file."""
    import pyarrow.parquet as pq

    path = _next_inc_path(store_dir)
    tmp = path + ".tmp"
    writer = None
    n = 0
    for batch in (fp_ds.select_columns([_FP])
                  .iter_batches(batch_format="pyarrow")):
        if writer is None:
            writer = pq.ParquetWriter(tmp, batch.schema)
        writer.write_table(batch)
        n += batch.num_rows
    if writer is None:
        pq.write_table(pa.table({_FP: pa.array([], pa.string())}), tmp)
    else:
        writer.close()
    os.replace(tmp, path)
    return n


def compact_fingerprint_store(store_dir: str) -> dict:
    """Merge every increment file into one distinct-fingerprint file.

    Crash-safe WITHOUT journals because duplicate fingerprints are
    membership-neutral: the merged file lands first (tmp → rename),
    old files are deleted after — a kill in any window leaves the
    merged file plus a subset of the old ones, which over-counts
    nothing and drops nothing."""
    import ray.data as rd

    files = _store_files(store_dir)
    if len(files) <= 1:
        return {"files_before": len(files), "files_after": len(files),
                "fingerprints": None}
    distinct = (rd.read_parquet(files, columns=[_FP])
                .groupby(_FP).count().select_columns([_FP]))
    n = _write_increment(distinct, store_dir)
    for f in files:
        os.remove(f)
    return {"files_before": len(files), "files_after": 1,
            "fingerprints": n}


def write_fingerprint_store(docs, store_dir: str, text_col: str = "text",
                            id_col: str = "doc_id") -> int:
    """Initialize/extend a store with a corpus's DISTINCT fingerprints;
    returns the number written."""
    from ray.data.aggregate import Min

    reps = (add_fingerprint(docs, text_col, id_col)
            .groupby(_FP).aggregate(Min(id_col, alias_name="keep_id")))
    return _write_increment(reps, store_dir)


def dedup_against_store(new_docs, store_dir: str, text_col: str = "text",
                        id_col: str = "doc_id", update_store: bool = False,
                        broadcast_limit: int = 2_000_000,
                        join_partitions: int | None = None,
                        fingerprint_col: str | None = None):
    """Surviving rows of ``new_docs``: one representative (min id) per
    NEW fingerprint not already in the store. ``update_store=True``
    appends the survivors' fingerprints afterwards, so the next
    increment dedups against this one too. ``fingerprint_col`` names a
    PRECOMPUTED fingerprint column (must be functions/textstats
    ``fingerprint`` values — e.g. the curate funnel's signal column),
    skipping the full-text md5 pass."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    def _fp_rows(ds):
        if fingerprint_col is None:
            return add_fingerprint(ds, text_col, id_col)
        out = ds.select_columns([fingerprint_col, id_col])
        if fingerprint_col != _FP:
            out = out.rename_columns({fingerprint_col: _FP})
        return out

    reps = (_fp_rows(new_docs)
            .groupby(_FP).aggregate(Min(id_col, alias_name="keep_id")))

    files = _store_files(store_dir)
    if files:
        store = rd.read_parquet(files, columns=[_FP])
        n_store = store.count()
        if n_store <= broadcast_limit:
            seen_ref = ray.put(pa.concat_tables(
                [b for b in store.iter_batches(batch_format="pyarrow")]
            )[_FP].combine_chunks())

            def drop_seen(t: pa.Table) -> pa.Table:
                seen = ray.get(seen_ref)
                return t.filter(pc.invert(
                    pc.is_in(t[_FP], value_set=seen)))

            fresh = reps.map_batches(drop_seen, batch_format="pyarrow")
        else:
            if join_partitions is None:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                join_partitions = max(2, min(64, ncpu // 2))
            fresh = reps.join(store, "left_anti",
                              join_partitions, on=(_FP,))
    else:
        fresh = reps

    # materialize the (fingerprint, keep_id) table — bounded by the
    # INCREMENT's distinct fingerprints, not the corpus — both to feed
    # the semi join without re-running the groupby and because Ray's
    # hash join raises on an all-empty right side (the every-doc-seen
    # replay case), which the count short-circuits.
    fresh = fresh.materialize()
    if fresh.count() == 0:
        return new_docs.limit(0)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = max(2, min(64, ncpu // 2))
    # repartition before the join: when new_docs rode in on a join
    # lineage (e.g. the curate funnel's exact-dedup semi-join), sparse
    # partitions are schema-less empties that Ray's hash join rejects
    # — repartition rebuilds uniform schema'd blocks
    keep_ids = (fresh.select_columns(["keep_id"])
                .rename_columns({"keep_id": id_col})
                .repartition(n_parts))
    survivors = new_docs.join(keep_ids, "left_semi", n_parts,
                              on=(id_col,))
    if update_store:
        survivors = survivors.materialize()
        _write_increment(_fp_rows(survivors), store_dir)
    return survivors


def remove_from_fingerprint_store(store_dir: str, docs,
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> dict:
    """Takedown support (mirrors stages/incneardup.py
    remove_from_neardup_store): delete the given documents' CONTENT
    fingerprints from the store so byte-identical recrawls of them
    stop being absorbed. ``docs`` is a Dataset of the documents to
    remove (fingerprints are recomputed from their text — the store
    holds no ids). Compaction-shaped rewrite: every store file is read
    distributed, anti-filtered, rewritten as one new increment, old
    files deleted after; a kill mid-way leaves the removed
    fingerprints transiently present — re-running completes the
    removal, never corrupts. Note a fingerprint shared by a removed
    doc and a kept doc is removed outright (content-grain store)."""
    import pyarrow.compute as pc
    import ray.data as rd

    batches = list(add_fingerprint(docs, text_col, id_col)
                   .select_columns([_FP])
                   .iter_batches(batch_format="pyarrow"))
    fps = (pc.unique(pa.concat_tables(batches)[_FP].combine_chunks())
           if batches else pa.array([], pa.string()))
    files = _store_files(store_dir)
    if not files:
        return {"removed_fps": len(fps), "rows_before": 0,
                "rows_after": 0}
    ds = rd.read_parquet(files, columns=[_FP])
    before = ds.count()

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[_FP], value_set=fps)))

    kept = ds.map_batches(drop, batch_format="pyarrow").materialize()
    n = kept.count()
    if n:  # _write_increment's concat rejects a zero-batch dataset
        _write_increment(kept, store_dir)
    for f in files:
        os.remove(f)
    return {"removed_fps": len(fps), "rows_before": before,
            "rows_after": n}
