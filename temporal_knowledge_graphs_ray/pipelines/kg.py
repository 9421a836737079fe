"""The flagship pipeline: Common-Crawl-style pages -> temporal knowledge graph.

Reference lifecycle rebuilt Ray-Data-first (SURVEY.md §3.1):

    read pages (Parquet)
      -> map_batches(html -> text)          [byte-identical gate vs reference]
      -> map_batches(chunker)               [1 -> N Arrow fan-out]
      -> map_batches(EntityExtractorStage)  [actor pool, "model" pinned]
      -> write chunk_ents/part=K            [stage checkpoint, resumable]
    read chunk_ents
      -> MentionLinkStage (broadcast alias dict) -> write mentions/part=K
      -> RelationExtractorStage             -> write edges_raw/part=K
    read mentions (all parts)
      -> canonicalize (partial agg -> groupby(type, block) -> map_groups UF)
      -> nodes table + canonical map (small; broadcast)
    read edges_raw (all parts)
      -> canonical rewrite (broadcast map) -> partial merge per batch
      -> groupby(subj_id, pred_key, obj_id).map_groups(merge)  [G3 shuffle]
      -> write edges/part=K

Phase boundaries are Parquet stage-materializations on purpose: at 100 TB
the extraction phases are the expensive work, and the per-partition
manifests make a killed ``ray job submit`` run resume at partition
granularity by skipping pages whose ``part = hash(url) % P`` already has
complete chunk_ents/mentions/edges_raw markers. The global phases
(canonicalize + edge merge) are orders of magnitude smaller (distinct
entities / distinct triples, not pages) and are recomputed from the
checkpointed tables on every run — deterministic, so re-runs are
idempotent (unlike the reference, whose re-ingest duplicates nodes;
operations.py:42-45, a bug SURVEY.md §7.5 says not to replicate).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.hashing import stable_hash64
from ..functions.relations import merge_duplicate_relations
from ..state.broadcast import put_alias_dict, put_canonical_map
from ..state.manifests import completed_parts, write_manifest, write_run_manifest
from ..stages.canonicalize import CANONICAL_SCHEMA, canonicalize
from ..stages.entities import EntityExtractorStage, MentionLinkStage
from ..stages.extract_text import (
    dedup_recrawls_keep_latest,
    make_chunk_stage,
    make_extract_text_stage,
)
from ..stages.relations import RelationExtractorStage

EDGES_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("subj_id", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_id", pa.string()),
    ("valid_from", pa.timestamp("us")),
    ("valid_to", pa.timestamp("us")),
    ("description", pa.large_string()),
    ("confidence", pa.float32()),
    ("source_chunks", pa.list_(pa.string())),
    ("part", pa.int32()),
])

NODES_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("type", pa.string()),
    ("first_seen", pa.timestamp("us")),
    ("last_seen", pa.timestamp("us")),
    ("mention_count", pa.int64()),
    ("aliases", pa.list_(pa.string())),
])


def _parts_filter(done: set[int], num_partitions: int):
    """Drop pages whose partition already completed (resume path)."""
    done_arr = pa.array(sorted(done), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        parts = pa.array(
            [int(stable_hash64(u) % num_partitions)
             for u in batch["url"].to_pylist()],
            pa.int32(),
        )
        keep = pc.invert(pc.is_in(parts, value_set=done_arr))
        return batch.filter(keep)

    return fn


def _per_part_rowcounts(path: str) -> dict[int, int]:
    """Row count per part=K dir from Parquet footers (metadata only)."""
    out: dict[int, int] = {}
    if not os.path.isdir(path):
        return out
    ds = pads.dataset(path, format="parquet", partitioning="hive")
    for frag in ds.get_fragments():
        # fragment path .../part=K/<file>.parquet
        part = None
        for piece in frag.path.split(os.sep):
            if piece.startswith("part="):
                part = int(piece[len("part="):])
        if part is None:
            continue
        out[part] = out.get(part, 0) + frag.metadata.num_rows
    return out


def _write_part_manifests(out_dir: str, table: str) -> dict[int, int]:
    counts = _per_part_rowcounts(os.path.join(out_dir, table))
    for part, rows in counts.items():
        write_manifest(out_dir, table, part, {"rows": rows})
    return counts


def build_kg(
    pages_ds,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    alias_table: pa.Table | None = None,
    resume: bool = False,
    dedup_recrawls: bool = False,
) -> dict:
    """Run the full construction pipeline. Returns output paths + metrics.

    ``pages_ds``: Ray Dataset with the input_hint schema
    (url, warc_ts, html, text?, lang). Ray must already be initialised by
    the caller (driver contract).
    """
    import time

    import ray
    import ray.data as rd

    phase_sec: dict[str, float] = {}
    _t = time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _t
        now = time.perf_counter()
        phase_sec[name] = round(now - _t, 3)
        _t = now

    os.makedirs(out_dir, exist_ok=True)
    # size actor pools to the cluster unless pinned in cfg
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ner_conc = cfg.ner_concurrency or (2, max(4, ncpu))
    rel_conc = cfg.relation_concurrency or (2, max(4, ncpu))
    as_tasks = cfg.extractor_compute == "tasks"
    alias_ref = put_alias_dict(alias_table) if alias_table is not None else None

    chunk_ents_dir = os.path.join(out_dir, "chunk_ents")
    mentions_dir = os.path.join(out_dir, "mentions")
    edges_raw_dir = os.path.join(out_dir, "edges_raw")
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")

    if not resume:
        # a fresh run must not append into a previous run's partitions
        # (APPEND-mode writes would silently duplicate data); resume=True is
        # the only path that builds on existing output
        for d in (chunk_ents_dir, mentions_dir, edges_raw_dir, nodes_dir,
                  edges_dir, os.path.join(out_dir, "_manifests")):
            shutil.rmtree(d, ignore_errors=True)

    if dedup_recrawls:
        # keep only the latest crawl of each url (V1 supersession); the one
        # stage that shuffles raw page bytes — off by default because the
        # synthetic input's url is a primary key
        pages_ds = dedup_recrawls_keep_latest(pages_ds)

    # ---- phase A: extraction (heavy, per-partition resumable) ----
    done = (
        completed_parts(out_dir, "chunk_ents") if resume else set()
    )
    if done:
        pages_ds = pages_ds.map_batches(
            _parts_filter(done, cfg.num_partitions), batch_format="pyarrow",
            batch_size=cfg.read_batch_size,
        )
    texts = pages_ds.map_batches(
        make_extract_text_stage(cfg), batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    chunks = texts.map_batches(
        make_chunk_stage(cfg), batch_format="pyarrow",
        batch_size=cfg.chunk_batch_size,
    )
    if as_tasks:
        chunk_ents = chunks.map_batches(
            EntityExtractorStage(cfg), batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
        )
    else:
        chunk_ents = chunks.map_batches(
            EntityExtractorStage,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
            concurrency=ner_conc,
        )
    # stage-cache chunk_ents in the object store (spills under pressure):
    # phases B1/B2 consume it twice without re-running extraction, and the
    # durable Parquet checkpoint (resume contract) is written from the
    # cached copy. At 100 TB prefer cfg.stage_cache="disk": skip the
    # materialize and re-read the written Parquet instead (cold-path cost,
    # no object-store footprint).
    ce_mat = chunk_ents.materialize()

    # checkpoint writes are durable-lineage only in memory mode — nothing
    # downstream reads them in this run — so they proceed on background
    # threads, off the critical path; each thread writes its manifests
    # AFTER its data (the resume contract: marker => partition complete).
    # All writers are joined before returning.
    import threading

    checkpoint_threads: list[threading.Thread] = []

    def _checkpoint(ds, path: str, table: str) -> None:
        def run() -> None:
            ds.write_parquet(path, partition_cols=["part"])
            _write_part_manifests(out_dir, table)

        t = threading.Thread(target=run, name=f"ckpt-{table}", daemon=True)
        t.start()
        checkpoint_threads.append(t)

    _checkpoint(ce_mat, chunk_ents_dir, "chunk_ents")
    _mark("A_extract_chunk_ner")

    # ---- phase B: mentions + raw edges from the checkpointed chunk_ents ----
    done_b = completed_parts(out_dir, "mentions") if resume else set()
    ce = ce_mat
    ce_mentions = ce
    if done_b:
        keep_set = pa.array(sorted(done_b), pa.int32())
        ce_mentions = ce.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part"].cast(pa.int32()),
                                   value_set=keep_set))
            ),
            batch_format="pyarrow",
        )
    # on resume (or stage_cache="disk") phase C must see old + new parts,
    # so it reads the durable Parquet; otherwise it reuses the in-memory
    # materialized table and the Parquet write is checkpoint-only
    use_disk = resume or cfg.stage_cache == "disk"
    if as_tasks:
        mentions_new = ce_mentions.map_batches(
            MentionLinkStage(alias_ref, cfg), batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
        )
    else:
        mentions_new = ce_mentions.map_batches(
            MentionLinkStage,
            fn_constructor_kwargs={"alias_ref": alias_ref, "cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
            concurrency=ner_conc,
        )
    if use_disk:
        mentions_new.write_parquet(mentions_dir, partition_cols=["part"])
        _write_part_manifests(out_dir, "mentions")
        mentions_for_c = None
    else:
        mentions_mat = mentions_new.materialize()
        _checkpoint(mentions_mat, mentions_dir, "mentions")
        mentions_for_c = mentions_mat
    _mark("B1_mentions")

    done_e = completed_parts(out_dir, "edges_raw") if resume else set()
    ce_edges = ce
    if done_e:
        keep_set_e = pa.array(sorted(done_e), pa.int32())
        ce_edges = ce.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["part"].cast(pa.int32()),
                                   value_set=keep_set_e))
            ),
            batch_format="pyarrow",
        )
    if as_tasks:
        edges_raw_new = ce_edges.map_batches(
            RelationExtractorStage(alias_ref, cfg), batch_format="pyarrow",
            batch_size=cfg.relation_batch_size,
        )
    else:
        edges_raw_new = ce_edges.map_batches(
            RelationExtractorStage,
            fn_constructor_kwargs={"alias_ref": alias_ref, "cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.relation_batch_size,
            concurrency=rel_conc,
        )
    if use_disk:
        edges_raw_new.write_parquet(edges_raw_dir, partition_cols=["part"])
        _write_part_manifests(out_dir, "edges_raw")
        edges_raw_for_c = None
    else:
        edges_raw_mat = edges_raw_new.materialize()
        _checkpoint(edges_raw_mat, edges_raw_dir, "edges_raw")
        edges_raw_for_c = edges_raw_mat
    _mark("B2_relations")

    # ---- phase C: global shuffles over the (much smaller) derived tables ----
    if mentions_for_c is not None:
        mentions_all = mentions_for_c.select_columns(
            ["type", "entity_key", "linked_name", "mention_count",
             "valid_from"])
    else:
        mentions_all = rd.read_parquet(
            mentions_dir,
            columns=["type", "entity_key", "linked_name", "mention_count",
                     "valid_from"],
        )
    canonical_ds = canonicalize(mentions_all, cfg).materialize()  # small
    _mark("C1_canonicalize")
    canonical_pdf = canonical_ds.to_pandas()
    if canonical_pdf.empty:
        canonical_tbl = CANONICAL_SCHEMA.empty_table()
    else:
        canonical_tbl = pa.Table.from_pandas(
            canonical_pdf, schema=CANONICAL_SCHEMA, preserve_index=False,
        )

    # nodes = canonical rows where the member IS the canonical key
    nodes_tbl = (
        canonical_tbl.filter(
            pc.equal(canonical_tbl["entity_key"],
                     canonical_tbl["canonical_key"])
        )
        .select(["entity_id", "name", "type", "first_seen", "last_seen",
                 "mention_count", "aliases"])
        .cast(NODES_SCHEMA)
    )
    shutil.rmtree(nodes_dir, ignore_errors=True)
    rd.from_arrow(nodes_tbl).write_parquet(nodes_dir)

    cmap_ref = put_canonical_map(canonical_tbl)

    class CanonicalRewriteStage:
        """Rewrite stage: broadcast canonical map, resolved lazily once
        per worker process (task mode) / per actor (actor mode)."""

        def __init__(self):
            self._cmap = None
            self.n = cfg.num_partitions

        @property
        def cmap(self):
            if self._cmap is None:
                import ray

                self._cmap = ray.get(cmap_ref)
            return self._cmap

        def __call__(self, batch: pa.Table) -> pa.Table:
            # column-wise (no per-row dicts): resolve both endpoints via
            # the broadcast map
            cmap = self.cmap
            s_types = batch["subj_type"].to_pylist()
            s_keys = batch["subj_key"].to_pylist()
            s_surf = batch["subj_surface"].to_pylist()
            o_types = batch["obj_type"].to_pylist()
            o_keys = batch["obj_key"].to_pylist()
            o_surf = batch["obj_surface"].to_pylist()
            preds = batch["pred"].to_pylist()

            def resolve(ts, ks, surfs):
                ids, names = [], []
                for t, k, s in zip(ts, ks, surfs):
                    hit = cmap.get((t, k))
                    if hit is None:
                        # endpoint with no mention row (cannot happen for
                        # our extractor, guarded for pluggable ones)
                        ids.append("x" + hex(stable_hash64(t + "|" + k))[2:17])
                        names.append(s)
                    else:
                        ids.append(hit[0])
                        names.append(hit[1])
                return ids, names

            sids, snames = resolve(s_types, s_keys, s_surf)
            oids, onames = resolve(o_types, o_keys, o_surf)
            rows = [
                {
                    "source": sn, "subj_id": si, "target": on, "obj_id": oi,
                    "relationship": p, "valid_from": vf, "description": d,
                    "confidence": c, "source_chunks": sc,
                }
                for sn, si, on, oi, p, vf, d, c, sc in zip(
                    snames, sids, onames, oids, preds,
                    batch["valid_from"].to_pylist(),
                    batch["description"].to_pylist(),
                    batch["confidence"].to_pylist(),
                    batch["source_chunks"].to_pylist(),
                )
            ]
            merged = merge_duplicate_relations(
                rows, key_fields=("subj_id", "obj_id"),
                max_source_chunks=cfg.max_source_chunks)
            ekey_bucket = [
                int(stable_hash64(
                    f"{m['subj_id']}|{m['relationship'].lower()}|{m['obj_id']}"
                ) % 64)
                for m in merged
            ]
            return pa.Table.from_arrays(
                [
                    pa.array([m["source"] for m in merged], pa.string()),
                    pa.array([m["subj_id"] for m in merged], pa.string()),
                    pa.array([m["relationship"] for m in merged], pa.string()),
                    pa.array([m["target"] for m in merged], pa.string()),
                    pa.array([m["obj_id"] for m in merged], pa.string()),
                    pa.array([m["valid_from"] for m in merged], pa.timestamp("us")),
                    pa.array([m["description"] for m in merged], pa.large_string()),
                    pa.array([m["confidence"] for m in merged], pa.float32()),
                    pa.array([m["source_chunks"] for m in merged], pa.list_(pa.string())),
                    pa.array([int(stable_hash64(m["subj_id"]) % self.n) for m in merged], pa.int32()),
                    pa.array(ekey_bucket, pa.int32()),
                ],
                names=["subj", "subj_id", "pred", "obj", "obj_id",
                       "valid_from", "description", "confidence",
                       "source_chunks", "part", "ekey_bucket"],
            )

    import pandas as pd

    def final_merge(group: pd.DataFrame) -> pd.DataFrame:
        # one call per hash bucket (64 total), merging every (subj, pred,
        # obj) key inside it via the dict-keyed kernel — O(rows), not
        # O(groups) scheduling overhead
        rows = group.to_dict("records")
        for r in rows:
            r["source"] = r.pop("subj")
            r["target"] = r.pop("obj")
            r["relationship"] = r.pop("pred")
            r["source_chunks"] = list(r["source_chunks"])
        merged = merge_duplicate_relations(
            rows, key_fields=("subj_id", "obj_id"),
            max_source_chunks=cfg.max_source_chunks)
        for m in merged:
            m["subj"] = m.pop("source")
            m["obj"] = m.pop("target")
            m["pred"] = m.pop("relationship")
            m.pop("ekey_bucket", None)
        return pd.DataFrame(merged)

    edges_final = (
        (edges_raw_for_c if edges_raw_for_c is not None
         else rd.read_parquet(edges_raw_dir))
        .map_batches(CanonicalRewriteStage(), batch_format="pyarrow",
                     batch_size=8192)
        .groupby("ekey_bucket")
        .map_groups(final_merge, batch_format="pandas")
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t["subj"].cast(pa.string()).combine_chunks(),
                    t["subj_id"].cast(pa.string()).combine_chunks(),
                    t["pred"].cast(pa.string()).combine_chunks(),
                    t["obj"].cast(pa.string()).combine_chunks(),
                    t["obj_id"].cast(pa.string()).combine_chunks(),
                    t["valid_from"].cast(pa.timestamp("us")).combine_chunks(),
                    pa.nulls(len(t), pa.timestamp("us")),
                    t["description"].cast(pa.large_string()).combine_chunks(),
                    t["confidence"].cast(pa.float32()).combine_chunks(),
                    t["source_chunks"].cast(pa.list_(pa.string())).combine_chunks(),
                    t["part"].cast(pa.int32()).combine_chunks(),
                ],
                schema=EDGES_SCHEMA,
            ),
            batch_format="pyarrow",
        )
    )
    shutil.rmtree(edges_dir, ignore_errors=True)
    edges_final.write_parquet(edges_dir, partition_cols=["part"])
    edge_counts = _write_part_manifests(out_dir, "edges")
    for t in checkpoint_threads:  # durable lineage complete before return
        t.join()
    _mark("C2_edge_merge")

    write_run_manifest(out_dir, {
        "tables": ["chunk_ents", "mentions", "edges_raw", "nodes", "edges"],
        "num_partitions": cfg.num_partitions,
        "edge_rows": sum(edge_counts.values()),
        "node_rows": nodes_tbl.num_rows,
        "phase_sec": phase_sec,
        "cluster_cpus": ncpu,
        "extractor_compute": cfg.extractor_compute,
    })
    return {
        "out_dir": out_dir,
        "chunk_ents": chunk_ents_dir,
        "mentions": mentions_dir,
        "edges_raw": edges_raw_dir,
        "nodes": nodes_dir,
        "edges": edges_dir,
        "node_rows": nodes_tbl.num_rows,
        "edge_rows": sum(edge_counts.values()),
        "phase_sec": phase_sec,
    }
