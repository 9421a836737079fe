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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..config import DEFAULT_CONFIG, EngineConfig, effective_partitions
from ..functions.hashing import stable_hash64
from ..state.broadcast import put_alias_dict, put_canonical_map
from ..state.manifests import (
    completed_parts,
    read_layout,
    write_layout,
    write_manifest,
    write_run_manifest,
)
from ..stages.blocks import coalesce_blocks as _coalesce_blocks
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


class _LlmStageFromFactory:
    """Actor wrapper: builds the LLM client from its factory ONCE per
    actor in ``__init__`` (the factory closes over config only, so it
    serializes into the actor cleanly), then delegates every batch to
    the wrapped LLM-shaped stage."""

    def __init__(self, factory, cfg, stage_cls):
        self._stage = stage_cls(factory(), cfg=cfg)

    def __call__(self, batch):
        return self._stage(batch)


def _require_current_url_hash(out_dir: str) -> None:
    """Refuse to build on an output partitioned with a DIFFERENT url->part
    hash: every part-addressing operation (resume filter, increment
    append, supersede purge) recomputes parts from urls, and a scheme
    mismatch silently drops/duplicates rows instead of erroring."""
    from ..state.manifests import URL_HASH_SCHEME, read_layout_scheme

    scheme = read_layout_scheme(out_dir)
    if scheme is not None and scheme != URL_HASH_SCHEME:
        raise ValueError(
            f"output at {out_dir} was partitioned with url hash "
            f"'{scheme}', but this engine version partitions with "
            f"'{URL_HASH_SCHEME}' — resume/increment/supersede would "
            f"misassign partitions. Rebuild the output (or run it with "
            f"the engine version that wrote it).")


def _resolve_partitions(pages_ds, out_dir: str, cfg: EngineConfig,
                        existing: bool) -> EngineConfig:
    """Return ``cfg`` with a concrete ``num_partitions``.

    Priority: (1) the layout recorded with an existing output — resume /
    increment / supersede MUST reuse it or urls land in the wrong parts;
    (2) an explicit cfg value; (3) auto-derivation targeting
    ``target_part_bytes`` of INPUT per partition, estimated from source
    file metadata (never executes the dataset) with the in-memory size as
    the fallback. At 100 TB / 2 GB targets that is ~50k parts — each a
    resumable, compactable unit — instead of 16 multi-TB ones.
    """
    import dataclasses

    recorded = read_layout(out_dir) if existing else None
    if recorded:
        _require_current_url_hash(out_dir)
        if cfg.num_partitions not in (None, recorded):
            raise ValueError(
                f"num_partitions={cfg.num_partitions} conflicts with the "
                f"existing output layout ({recorded}) at {out_dir}")
        return dataclasses.replace(cfg, num_partitions=recorded)
    if cfg.num_partitions is not None:
        return cfg
    est = 0
    try:
        for f in pages_ds.input_files():
            if os.path.exists(f):
                est += os.path.getsize(f)
    except Exception:
        est = 0
    if not est:
        # size_bytes() on a LAZY dataset executes the whole pipeline just
        # to size it (measured: +1.3 s on the critical path at sf0.1) —
        # only ask a dataset that is already materialized; otherwise take
        # the floor and let the recorded layout keep later runs consistent
        from ray.data.dataset import MaterializedDataset

        if isinstance(pages_ds, MaterializedDataset):
            try:
                est = int(pages_ds.size_bytes() or 0)
            except Exception:
                est = 0
    n = max(cfg.min_partitions,
            min(cfg.max_partitions,
                -(-est // cfg.target_part_bytes) if est else 0))
    return dataclasses.replace(cfg, num_partitions=n)


def _parts_filter(done: set[int], num_partitions: int):
    """Drop pages whose partition already completed (resume path)."""
    done_arr = pa.array(sorted(done), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import url_parts_vec

        parts = pa.array(
            url_parts_vec(batch["url"].to_pylist(), num_partitions),
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


def _fallback_id(etype: str, key: str) -> str:
    """Entity id for an endpoint with no mention row (cannot happen for
    the built-in extractor, guarded for pluggable ones)."""
    return "x" + hex(stable_hash64(etype + "|" + key))[2:17]


_MERGED_NAMES = ["subj", "subj_id", "pred", "obj", "obj_id",
                 "valid_from", "description", "confidence",
                 "source_chunks", "part"]

_NAT_I64 = np.iinfo(np.int64).min  # numpy datetime64 NaT payload
_I64_MAX = np.iinfo(np.int64).max


def _vec_bucket64(strings: pa.Array, modulus: int) -> np.ndarray:
    """Vectorized stable string -> bucket hash (siphash via pandas with
    its fixed default key — deterministic across processes). Buckets are
    within-lineage shuffle/layout keys only; nothing durable addresses a
    row by recomputing this hash from content, so it does not need to
    match ``url_parts_vec`` (the URL-partition hash the resume manifests
    depend on — its scheme is recorded in the layout manifest and
    enforced by ``_require_current_url_hash``)."""
    from ..functions.hashing import hash64_vec

    return (hash64_vec(strings.to_pylist())
            % np.uint64(modulus)).astype(np.int64)


def merge_edges_vectorized(tbl: pa.Table, cfg: EngineConfig,
                           with_bucket: bool = True) -> pa.Table:
    """Vectorized exact equivalent of ``merge_duplicate_relations`` over an
    edge table (G3 semantics, reference relation_extractor.py:430-467 with
    the order-insensitive tiebreaks documented in functions/relations.py):
    group on (subj_id, lower(pred), obj_id); confidence = max, valid_from =
    min, description = longest (lexicographically-smallest tiebreak),
    source_chunks = sorted distinct union capped at smallest-N. The dict
    kernel remains the test oracle (tests/test_edge_merge_vectorized.py);
    this Arrow/numpy path is what the hot stages run — no per-row Python.

    Output rows appear in first-occurrence order of their group key, the
    same order the dict kernel's insertion-ordered dict produces.
    """
    names = _MERGED_NAMES + (["ekey_bucket"] if with_bucket else [])
    # guard for pluggable extractors: an edge with a null endpoint or
    # predicate is meaningless, and null group keys would poison the
    # dictionary-encode below (null indices break the zero-copy to_numpy)
    key_valid = pc.and_(
        pc.and_(pc.is_valid(tbl["subj_id"]), pc.is_valid(tbl["obj_id"])),
        pc.is_valid(tbl["pred"]))
    if not pc.all(key_valid).as_py():
        tbl = tbl.filter(key_valid)
    n = tbl.num_rows
    if n == 0:
        empty = {
            "subj": pa.array([], pa.string()),
            "subj_id": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "obj_id": pa.array([], pa.string()),
            "valid_from": pa.array([], pa.timestamp("us")),
            "description": pa.array([], pa.large_string()),
            "confidence": pa.array([], pa.float32()),
            "source_chunks": pa.array([], pa.list_(pa.string())),
            "part": pa.array([], pa.int32()),
            "ekey_bucket": pa.array([], pa.int32()),
        }
        return pa.Table.from_arrays([empty[c] for c in names], names=names)

    subj_id = tbl["subj_id"].cast(pa.string()).combine_chunks()
    obj_id = tbl["obj_id"].cast(pa.string()).combine_chunks()
    pred = tbl["pred"].cast(pa.string()).combine_chunks()
    gkey = pc.binary_join_element_wise(
        subj_id, pc.utf8_lower(pred), obj_id, "\x00")
    enc = gkey.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    num_groups = len(enc.dictionary)

    # first-occurrence representative per group (dictionary order IS
    # first-appearance order, so group g's first row index is increasing
    # in g and the output keeps the dict kernel's insertion order)
    first = np.full(num_groups, n, dtype=np.int64)
    np.minimum.at(first, codes, np.arange(n, dtype=np.int64))
    first_ix = pa.array(first)

    # confidence = max; fmax ignores NaN/null from pluggable extractors
    # (np.maximum would propagate a single NaN into the group's merge)
    conf = tbl["confidence"].cast(pa.float32()).to_numpy(
        zero_copy_only=False)
    conf_out = np.full(num_groups, -np.inf, dtype=np.float32)
    np.fmax.at(conf_out, codes, conf)

    # valid_from = min, nulls ignored (all-null group stays null)
    vf_np = tbl["valid_from"].cast(pa.timestamp("us")).to_numpy(
        zero_copy_only=False)
    vfi = vf_np.view("i8").copy()
    vfi[np.isnat(vf_np)] = _I64_MAX
    vf_out = np.full(num_groups, _I64_MAX, dtype=np.int64)
    np.minimum.at(vf_out, codes, vfi)
    vf_out[vf_out == _I64_MAX] = _NAT_I64  # back to NaT

    # description = longest, ties -> lexicographically smallest: sort by
    # (group, len desc, desc asc) and take each group's first
    desc = tbl["description"].cast(pa.large_string()).combine_chunks()
    dsort = pc.sort_indices(
        pa.table({"c": codes, "l": pc.utf8_length(desc), "d": desc}),
        sort_keys=[("c", "ascending"), ("l", "descending"),
                   ("d", "ascending")],
    ).to_numpy()
    firstpos = np.searchsorted(codes[dsort], np.arange(num_groups))
    desc_out = pc.take(desc, pa.array(dsort[firstpos]))

    # source_chunks = sorted distinct union, capped at smallest-N
    sc = tbl["source_chunks"].cast(pa.list_(pa.string())).combine_chunks()
    flat = pc.list_flatten(sc)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    pcodes = codes[pc.list_parent_indices(sc).to_numpy()]
    ssort = pc.sort_indices(
        pa.table({"c": pcodes, "s": flat}),
        sort_keys=[("c", "ascending"), ("s", "ascending")]).to_numpy()
    cs = pcodes[ssort]
    ss = pc.take(flat, pa.array(ssort))
    if len(cs):
        keep = np.ones(len(cs), dtype=bool)
        keep[1:] = (cs[1:] != cs[:-1]) | pc.not_equal(
            ss.slice(1), ss.slice(0, len(cs) - 1)
        ).to_numpy(zero_copy_only=False)
        cs, ss = cs[keep], ss.filter(pa.array(keep))
    counts = np.bincount(cs, minlength=num_groups)
    if cfg.max_source_chunks is not None and len(cs):
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(cs)) - np.repeat(starts, counts)
        cap_keep = pos < cfg.max_source_chunks
        cs, ss = cs[cap_keep], ss.filter(pa.array(cap_keep))
        counts = np.bincount(cs, minlength=num_groups)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    sc_out = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), ss.cast(pa.string()))

    subj_id_out = pc.take(subj_id, first_ix)
    arrays = [
        pc.take(tbl["subj"].cast(pa.string()).combine_chunks(), first_ix),
        subj_id_out,
        pc.take(pred, first_ix),
        pc.take(tbl["obj"].cast(pa.string()).combine_chunks(), first_ix),
        pc.take(obj_id, first_ix),
        pa.array(vf_out.view("M8[us]")),
        desc_out,
        pa.array(conf_out, pa.float32()),
        sc_out,
        pa.array(_vec_bucket64(subj_id_out, effective_partitions(cfg))
                 .astype(np.int32)),
    ]
    if with_bucket:
        arrays.append(pa.array(
            _vec_bucket64(enc.dictionary, 64).astype(np.int32)))
    return pa.Table.from_arrays(arrays, names=names)


class CanonicalRewriteStage:
    """Edge-endpoint rewrite via the BROADCAST canonical map.

    The map ships as an Arrow resolve-table (``ray.put`` once, read
    zero-copy per worker); both endpoints resolve with vectorized
    ``pc.index_in`` + ``pc.take`` — no per-row Python in the hot path.
    Misses (endpoints without a mention row) fall back to a hashed id via
    a loop over ONLY the missing positions.
    """

    def __init__(self, cmap_ref, cfg: EngineConfig):
        self.cmap_ref = cmap_ref
        self.cfg = cfg
        self._keys = None
        self._ids = None
        self._names = None

    def _ensure(self):
        if self._keys is None:
            import ray

            tbl = ray.get(self.cmap_ref)
            self._keys = tbl["jk"].combine_chunks()
            self._ids = tbl["entity_id"].combine_chunks()
            self._names = tbl["name"].combine_chunks()

    def _resolve(self, types, keys, surfaces):
        ix = pc.index_in(
            pc.binary_join_element_wise(types.cast(pa.string()),
                                        keys.cast(pa.string()), "\x00"),
            value_set=self._keys,
        )
        ids = pc.take(self._ids, ix)
        names = pc.coalesce(pc.take(self._names, ix),
                            surfaces.cast(pa.string()))
        if ids.null_count:
            import numpy as np

            miss = np.flatnonzero(pc.is_null(ix).to_numpy(
                zero_copy_only=False))
            id_list = ids.to_pylist()
            t_list, k_list = types.to_pylist(), keys.to_pylist()
            for i in miss:
                id_list[i] = _fallback_id(t_list[i], k_list[i])
            ids = pa.array(id_list, pa.string())
        return ids, names

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        sids, snames = self._resolve(batch["subj_type"], batch["subj_key"],
                                     batch["subj_surface"])
        oids, onames = self._resolve(batch["obj_type"], batch["obj_key"],
                                     batch["obj_surface"])
        resolved = pa.table({
            "subj": snames, "subj_id": sids, "pred": batch["pred"],
            "obj": onames, "obj_id": oids,
            "valid_from": batch["valid_from"],
            "description": batch["description"],
            "confidence": batch["confidence"],
            "source_chunks": batch["source_chunks"],
        })
        return merge_edges_vectorized(resolved, self.cfg)


def rewrite_edges_distributed(edges_raw_ds, canonical_tbl,
                              cfg: EngineConfig,
                              num_partitions: int | None = None):
    """Edge-endpoint rewrite via Ray Data's DISTRIBUTED hash join — the
    scale path when the canonical map exceeds
    ``cfg.canonical_broadcast_limit`` (10^8+ entities): nothing is
    broadcast; edges shuffle twice (``Dataset.join`` left-outer, once per
    endpoint) keyed by jk = type + NUL + entity_key, misses fall back to
    the hashed id exactly like the broadcast stage. Produces the same
    partially-merged table, bit-for-bit."""
    import ray
    import pyarrow.compute as pcc
    import ray.data as rd

    if num_partitions is None:
        # one join partition per ~2 cores, capped: each partition is an
        # aggregating actor; too many starves small clusters, too few
        # limits shuffle parallelism
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(64, ncpu // 2))

    def _resolve_project(t: pa.Table) -> pa.Table:
        jk = pcc.binary_join_element_wise(
            t["type"].cast(pa.string()),
            t["entity_key"].cast(pa.string()), "\x00")
        return pa.Table.from_arrays(
            [jk.combine_chunks() if isinstance(jk, pa.ChunkedArray) else jk,
             t["entity_id"].cast(pa.string()).combine_chunks(),
             t["name"].cast(pa.string()).combine_chunks()],
            names=["jk", "cm_id", "cm_name"])

    if isinstance(canonical_tbl, pa.Table):
        resolve_ds = rd.from_arrow(_resolve_project(canonical_tbl))
    else:  # a Dataset: the canonical map never touches the driver.
        # materialize: resolve_ds feeds BOTH the subj and obj joins below;
        # unmaterialized, the projection (and everything upstream of the
        # canonical dataset) would re-execute for the second join
        resolve_ds = canonical_tbl.map_batches(
            _resolve_project, batch_format="pyarrow").materialize()

    def _add_jk(side: str):
        def fn(t: pa.Table) -> pa.Table:
            if "source_chunks" in t.column_names:
                # Acero hash joins reject list payload columns — carry the
                # provenance as a NUL-joined string through the two joins
                # (chunk ids never contain NUL)
                sc = pcc.binary_join(
                    t["source_chunks"].cast(pa.list_(pa.string())), "\x00")
                t = t.drop_columns(["source_chunks"]).append_column(
                    "sc_str", sc)
            if "jk" in t.column_names:
                t = t.drop_columns(["jk"])
            return t.append_column("jk", pcc.binary_join_element_wise(
                t[f"{side}_type"].cast(pa.string()),
                t[f"{side}_key"].cast(pa.string()), "\x00"))

        return fn

    def _finish(side: str):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["cm_id"]
            names = pc.coalesce(t["cm_name"],
                                t[f"{side}_surface"].cast(pa.string()))
            if ids.null_count:
                miss = np.flatnonzero(
                    pc.is_null(ids).to_numpy(zero_copy_only=False))
                id_list = ids.to_pylist()
                t_list = t[f"{side}_type"].to_pylist()
                k_list = t[f"{side}_key"].to_pylist()
                for i in miss:
                    id_list[i] = _fallback_id(t_list[i], k_list[i])
                ids = pa.array(id_list, pa.string())
            else:
                ids = ids.cast(pa.string())
            t = t.drop_columns(["cm_id", "cm_name", "jk"])
            t = t.append_column(f"{side}_id", ids)
            return t.append_column(f"{side}_name", names)

        return fn

    resolved = edges_raw_ds.map_batches(_add_jk("subj"),
                                        batch_format="pyarrow")
    resolved = resolved.join(resolve_ds, "left_outer", num_partitions,
                             on=("jk",))
    resolved = resolved.map_batches(_finish("subj"), batch_format="pyarrow")
    resolved = resolved.map_batches(_add_jk("obj"), batch_format="pyarrow")
    resolved = resolved.join(resolve_ds, "left_outer", num_partitions,
                             on=("jk",))
    resolved = resolved.map_batches(_finish("obj"), batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        # re-inflate the NUL-joined provenance carried through the joins;
        # empty strings mean "no chunks" (split would yield [""])
        sc_str = t["sc_str"].cast(pa.string()).combine_chunks()
        sc = pc.split_pattern(sc_str, "\x00")
        empty = pc.equal(sc_str, "")
        if len(sc_str) and pc.any(empty).as_py():
            # split("") yields [""]; raw edges always carry >= 1 chunk so
            # this is a guard, not a hot path
            lst = sc.to_pylist()
            for i in np.flatnonzero(empty.to_numpy(zero_copy_only=False)):
                lst[i] = []
            sc = pa.array(lst, pa.list_(pa.string()))
        resolved = pa.table({
            "subj": t["subj_name"], "subj_id": t["subj_id"],
            "pred": t["pred"], "obj": t["obj_name"],
            "obj_id": t["obj_id"], "valid_from": t["valid_from"],
            "description": t["description"],
            "confidence": t["confidence"], "source_chunks": sc,
        })
        return merge_edges_vectorized(resolved, cfg)

    return resolved.map_batches(finalize, batch_format="pyarrow",
                                batch_size=8192)


def _buckets_from_skew(probe: dict, base: int = 64,
                       max_buckets: int = 1024) -> int:
    """Deterministic canonicalization bucket count from a skew_report
    probe of the entity_key column. Two signals widen the shuffle:

    - distinct keys set the parallelism floor (>=1 blocking group per
      bucket is pointless; ~4k distinct keys per bucket is the sweet
      spot the 64-bucket default assumes at ~256k keys);
    - a large hot-key skew factor (max group / mean group) adds buckets
      so a hub entity's blocking group co-resides with FEWER innocent
      groups per task. A group never spans buckets — the within-group
      salting is canonicalize's bounded hierarchical pass — so bucket
      count only shapes task balance and the output is invariant to it
      (layout-invariance tests pin this).
    """
    chosen = base
    distinct = int(probe.get("distinct", 0))
    if distinct > 0:
        # next power of two >= distinct/4096 (so exactly 256k keys
        # still choose the 64-bucket default, 1M keys choose 256)
        ratio = (distinct + 4095) // 4096
        chosen = max(chosen, min(max_buckets,
                                 1 << max(0, ratio - 1).bit_length()))
    if float(probe.get("skew_factor", 0.0)) > 16.0:
        chosen = min(max_buckets, max(chosen * 2, 128))
    return chosen


def build_kg(
    pages_ds,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    alias_table: pa.Table | None = None,
    resume: bool = False,
    dedup_recrawls: bool = False,
    increment: bool = False,
    blocked_domains: list[str] | None = None,
    probe_skew: bool = False,
) -> dict:
    """Run the full construction pipeline. Returns output paths + metrics.

    ``pages_ds``: Ray Dataset with the input_hint schema
    (url, warc_ts, html, text?, lang). Ray must already be initialised by
    the caller (driver contract). ``blocked_domains`` drops pages whose
    registrable domain is listed (stages/urlfilter.py — the crawl-side
    deny list) BEFORE any extraction work; default None is a no-op.
    ``probe_skew`` runs the one-pass sketch skew probe
    (stages/profile.skew_report) on the canonicalization key before the
    phase-C shuffle and auto-sizes its bucket count
    (_buckets_from_skew) — the "salt this key BEFORE the 100 TB
    groupby" probe wired into the flagship; the probe result and chosen
    count land in the returned metrics as ``skew_probe``.
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
    if resume:
        # make an interrupted purge/compaction/supersede/increment whole
        # BEFORE anything reads the checkpoint tables or the orphan
        # cleanup below inspects manifests. Fresh builds wipe the dir
        # (recovery would be wasted work); increments recover at the
        # ingest_increment entrance — which then writes ITS journal for
        # the appends this call performs, so re-consuming it here would
        # destroy that crash protection
        _recover_pending_journals(out_dir, cfg, alias_table)
    if blocked_domains:
        from ..stages.urlfilter import filter_domains

        pages_ds = filter_domains(pages_ds, blocked_domains,
                                  url_col="url", mode="block")
    cfg = _resolve_partitions(pages_ds, out_dir, cfg,
                              existing=(resume or increment))
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

    if not resume and not increment:
        # a fresh run must not append into a previous run's partitions
        # (APPEND-mode writes would silently duplicate data); resume=True
        # and increment=True are the only paths that build on existing
        # output
        for d in (chunk_ents_dir, mentions_dir, edges_raw_dir, nodes_dir,
                  edges_dir, os.path.join(out_dir, "_manifests")):
            shutil.rmtree(d, ignore_errors=True)
    else:
        # a resumed run may find part=K dirs WITHOUT a completion manifest:
        # files a killed write left behind. Ray write_parquet appends
        # uniquely-named files, so recomputation alongside the orphans
        # would silently duplicate rows — delete them first (marker =>
        # complete implies no-marker dirs are garbage).
        for tdir, table in ((chunk_ents_dir, "chunk_ents"),
                            (mentions_dir, "mentions"),
                            (edges_raw_dir, "edges_raw")):
            if not os.path.isdir(tdir):
                continue
            marked = completed_parts(out_dir, table)
            for entry in os.listdir(tdir):
                if entry.startswith("part=") and \
                        int(entry[len("part="):]) not in marked:
                    shutil.rmtree(os.path.join(tdir, entry),
                                  ignore_errors=True)

    # record the layout decision before any data is written so a killed
    # run's resume reuses the same partition count (no-op when a layout
    # manifest already exists)
    write_layout(out_dir, cfg.num_partitions)

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
    # the live-LLM path is one env setting away: with TKG_LLM_API_BASE
    # set, extraction runs the LLM-shaped actor stage against that
    # endpoint (client built once per actor, bounded retry, failure ->
    # zero entities); unset, the deterministic extractor stays the
    # default (functions/llm_client.py — reference settings.py:27-31)
    from ..functions.llm_client import client_factory_from_env

    llm_factory = client_factory_from_env()
    if llm_factory is not None:
        from ..stages.entities import LlmEntityExtractorStage

        chunk_ents = chunks.map_batches(
            _LlmStageFromFactory,
            fn_constructor_kwargs={"factory": llm_factory, "cfg": cfg,
                                   "stage_cls": LlmEntityExtractorStage},
            batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
            concurrency=ner_conc,
        )
    elif as_tasks:
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
    # checkpoint writes are durable-lineage only in memory mode — nothing
    # downstream reads them in this run — so they proceed on background
    # threads, off the critical path; each thread writes its manifests
    # AFTER its data (the resume contract: marker => partition complete).
    # All writers are joined before returning.
    import threading

    checkpoint_threads: list[threading.Thread] = []
    checkpoint_errors: list[tuple[str, BaseException]] = []

    def _checkpoint(ds, path: str, table: str) -> None:
        def run() -> None:
            # exceptions must not die with the daemon thread — a failed
            # checkpoint silently breaks the durable-resume guarantee, so
            # they are collected and re-raised after join()
            try:
                _coalesce_blocks(ds).write_parquet(
                    path, partition_cols=["part"])
                _write_part_manifests(out_dir, table)
            except BaseException as e:  # noqa: BLE001 - re-raised below
                checkpoint_errors.append((table, e))

        t = threading.Thread(target=run, name=f"ckpt-{table}", daemon=True)
        t.start()
        checkpoint_threads.append(t)

    disk_mode = cfg.stage_cache == "disk"
    # INCREMENT in disk mode must NOT source phases B from the durable
    # Parquet: it holds every pre-existing part too, and re-deriving
    # mentions/edges_raw for those parts would APPEND duplicates into the
    # already-complete part dirs. An increment's new-page set is small
    # relative to the corpus by definition, so materializing just the new
    # pages' chunk_ents (memory-mode shape) is bounded by increment size;
    # the pure streaming layout applies to the full build.
    if disk_mode and not increment:
        # 100 TB mode: phase A STREAMS straight to the durable Parquet —
        # the page-grain table is never materialized in the object store
        # (blocks flow read -> extract -> chunk -> NER -> write with
        # backpressure and are released as they are written); phases B/C
        # re-read the written Parquet instead
        _coalesce_blocks(chunk_ents).write_parquet(
            chunk_ents_dir, partition_cols=["part"])
        _write_part_manifests(out_dir, "chunk_ents")
        ce_mat = None
    else:
        # stage-cache chunk_ents in the object store (spills under
        # pressure): phases B1/B2 consume it twice without re-running
        # extraction, and the durable Parquet checkpoint (resume contract)
        # is written from the cached copy off the critical path
        ce_mat = chunk_ents.materialize()
        _checkpoint(ce_mat, chunk_ents_dir, "chunk_ents")
    _mark("A_extract_chunk_ner")

    # ---- phase B: mentions + raw edges from the checkpointed chunk_ents ----
    def _chunk_ents_from_disk(want_parts: set[int] | None):
        """Durable chunk_ents rows for ``want_parts`` (None = all parts),
        schema-aligned to the in-memory materialization (hive reads type
        partition columns and strings differently) so a union is
        well-typed.  With ``want_parts`` given, only those part dirs are
        READ (partition pruning at the file listing): repairing a
        one-partition resume hole must not scan the whole store."""
        from ..stages.entities import CHUNK_ENTS_SCHEMA

        target = CHUNK_ENTS_SCHEMA

        def conv_for(part: int | None):
            def conv(t: pa.Table) -> pa.Table:
                if part is not None and "part" not in t.column_names:
                    # reading a part=K dir directly loses the hive column
                    t = t.append_column(
                        "part", pa.array(
                            np.full(t.num_rows, part, np.int32)))
                cols = [t[f.name].cast(f.type).combine_chunks()
                        for f in target]
                return pa.Table.from_arrays(cols, schema=target)

            return conv

        if want_parts is None:
            return rd.read_parquet(chunk_ents_dir).map_batches(
                conv_for(None), batch_format="pyarrow")
        pieces = []
        for p in sorted(want_parts):
            pdir = os.path.join(chunk_ents_dir, f"part={p}")
            if os.path.isdir(pdir):
                pieces.append(rd.read_parquet(pdir).map_batches(
                    conv_for(p), batch_format="pyarrow"))
        if not pieces:
            return rd.from_arrow(target.empty_table())
        ds0 = pieces[0]
        return ds0.union(*pieces[1:]) if len(pieces) > 1 else ds0

    done_b = completed_parts(out_dir, "mentions") if resume else set()
    # disk mode: the durable Parquet just written IS the phase-B source —
    # it holds every part (old + new), streamed back block by block
    ce = ce_mat if ce_mat is not None else _chunk_ents_from_disk(None)
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
    # RESUME HOLE GUARD: a partition whose chunk_ents checkpoint completed
    # but whose mentions were never written (kill window between the
    # background chunk_ents write and phase B) is absent from BOTH ce_mat
    # (phase A skipped it) and done_b — source it from the durable Parquet
    missing_b = (done - done_b) if (resume and not disk_mode) else set()
    if missing_b:
        ce_mentions = ce_mentions.union(_chunk_ents_from_disk(missing_b))
    # on resume (or stage_cache="disk") phase C must see old + new parts,
    # so it reads the durable Parquet; otherwise it reuses the in-memory
    # materialized table and the Parquet write is checkpoint-only
    use_disk = resume or increment or cfg.stage_cache == "disk"
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
        _coalesce_blocks(mentions_new).write_parquet(
            mentions_dir, partition_cols=["part"])
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
    missing_e = (done - done_e) if (resume and not disk_mode) else set()
    if missing_e:  # same resume-hole guard as mentions
        ce_edges = ce_edges.union(_chunk_ents_from_disk(missing_e))
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
        _coalesce_blocks(edges_raw_new).write_parquet(
            edges_raw_dir, partition_cols=["part"])
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
    skew_probe = None
    canon_buckets = 64
    if probe_skew:
        from ..stages.profile import skew_report

        probe = skew_report(mentions_all, "entity_key")
        canon_buckets = _buckets_from_skew(probe)
        skew_probe = {"distinct": probe["distinct"],
                      "rows": probe["rows"],
                      "skew_factor": round(float(probe["skew_factor"]), 3),
                      "chosen_buckets": canon_buckets}
        _mark("C0_skew_probe")
    canonical_ds = canonicalize(mentions_all, cfg,
                                num_buckets=canon_buckets).materialize()
    _mark("C1_canonicalize")
    n_canonical = canonical_ds.count()
    use_broadcast = n_canonical <= cfg.canonical_broadcast_limit

    def _nodes_project(t: pa.Table) -> pa.Table:
        # nodes = canonical rows where the member IS the canonical key
        t = t.filter(pc.equal(t["entity_key"], t["canonical_key"]))
        return t.select(["entity_id", "name", "type", "first_seen",
                         "last_seen", "mention_count", "aliases"]).cast(
                             NODES_SCHEMA)

    shutil.rmtree(nodes_dir, ignore_errors=True)
    if use_broadcast:
        canonical_pdf = canonical_ds.to_pandas()
        if canonical_pdf.empty:
            canonical_tbl = CANONICAL_SCHEMA.empty_table()
        else:
            canonical_tbl = pa.Table.from_pandas(
                canonical_pdf, schema=CANONICAL_SCHEMA, preserve_index=False,
            )
        nodes_tbl = _nodes_project(canonical_tbl)
        # broadcast path: the table is already on the driver and bounded
        # by canonical_broadcast_limit — a direct write skips a whole Ray
        # dataset job (~1 s of scheduling for a tiny table)
        import pyarrow.parquet as _pq

        os.makedirs(nodes_dir, exist_ok=True)
        _pq.write_table(nodes_tbl, os.path.join(nodes_dir,
                                                "nodes-0.parquet"))
        node_rows = nodes_tbl.num_rows
        cmap_ref = put_canonical_map(canonical_tbl)
    else:
        # entity table too large to hold on the driver: nodes are written
        # and the edge rewrite joined WITHOUT ever collecting the
        # canonical map (no to_pandas, no broadcast)
        nodes_out = canonical_ds.map_batches(_nodes_project,
                                             batch_format="pyarrow")
        nodes_out.write_parquet(nodes_dir)
        node_rows = int(
            pads.dataset(nodes_dir, format="parquet").count_rows())
        canonical_tbl = None
        cmap_ref = None

    def final_merge(group: pa.Table) -> pa.Table:
        # one call per hash bucket (64 total), merging every (subj, pred,
        # obj) key inside it via the vectorized Arrow kernel — O(rows),
        # no per-row Python (the dict kernel in functions/relations.py
        # remains the semantics oracle)
        return merge_edges_vectorized(
            group.drop_columns(["ekey_bucket"]), cfg, with_bucket=False)

    edges_raw_ds = (edges_raw_for_c if edges_raw_for_c is not None
                    else rd.read_parquet(edges_raw_dir))
    if use_broadcast:
        rewritten = edges_raw_ds.map_batches(
            CanonicalRewriteStage(cmap_ref, cfg), batch_format="pyarrow",
            batch_size=8192)
    else:
        rewritten = rewrite_edges_distributed(
            edges_raw_ds, canonical_ds, cfg)
    # same small-shuffle gate as canonicalize: the rewrite stage already
    # partial-merged per batch, so its output is ~distinct triples; below
    # the gate the global merge runs as one call instead of paying the
    # all-to-all barrier for a few thousand rows
    import time as _time

    _dbg = os.environ.get("TKG_PHASE_DEBUG") == "1"
    _t0 = _time.perf_counter()
    # SECOND-LEVEL combine before the wide merge: the per-batch partial
    # rows grow with the input while distinct triples stay bounded, so
    # re-merging in 128k-row batches collapses the shuffle input near the
    # distinct-triple count (measured 1.89M -> ~50k at 1.28M pages) —
    # the merge kernel is associative, so this is a pure reduction
    rewritten = rewritten.map_batches(
        lambda t: merge_edges_vectorized(
            t.drop_columns(["ekey_bucket"]), cfg, with_bucket=True),
        batch_format="pyarrow", batch_size=131072)
    rewritten = rewritten.materialize()
    if _dbg:
        print(f"C2.rewrite_materialize {_time.perf_counter() - _t0:.2f}s",
              flush=True)
    _t0 = _time.perf_counter()
    n_rewritten = rewritten.count()
    if _dbg:
        print(f"C2.count {_time.perf_counter() - _t0:.2f}s "
              f"rows={n_rewritten}", flush=True)
    _t0 = _time.perf_counter()
    if n_rewritten <= cfg.small_shuffle_rows:
        # driver-side bucket split, parallel merge tasks (one per bucket
        # block) — no all-to-all for a small triple table
        df_all = rewritten.to_pandas()
        if df_all.empty:
            merged_src = rewritten.limit(0)
        else:
            # to_pandas turns list<string> cells into numpy object arrays,
            # which Arrow cannot convert back — re-list them for the
            # pandas->arrow round-trip (small-table path only)
            df_all["source_chunks"] = df_all["source_chunks"].map(list)
            frames = [g for _, g in df_all.groupby("ekey_bucket",
                                                   sort=True)]
            merged_src = rd.from_pandas(frames).map_batches(
                final_merge, batch_format="pyarrow", batch_size=None)
    else:
        merged_src = (rewritten.groupby("ekey_bucket")
                      .map_groups(final_merge, batch_format="pyarrow"))
    edges_final = (
        merged_src
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
    if _dbg:
        print(f"C2.merge_build {_time.perf_counter() - _t0:.2f}s",
              flush=True)
    _t0 = _time.perf_counter()
    edges_final.write_parquet(edges_dir, partition_cols=["part"])
    if _dbg:
        print(f"C2.merge_write {_time.perf_counter() - _t0:.2f}s",
              flush=True)
    _t0 = _time.perf_counter()
    edge_counts = _write_part_manifests(out_dir, "edges")
    if _dbg:
        print(f"C2.edge_manifests {_time.perf_counter() - _t0:.2f}s",
              flush=True)
    _t0 = _time.perf_counter()
    for t in checkpoint_threads:  # durable lineage complete before return
        t.join()
    if _dbg:
        print(f"C2.ckpt_join {_time.perf_counter() - _t0:.2f}s", flush=True)
    if checkpoint_errors:
        table, err = checkpoint_errors[0]
        raise RuntimeError(
            f"checkpoint write failed for table '{table}' "
            f"({len(checkpoint_errors)} failure(s) total)") from err
    _mark("C2_edge_merge")

    write_run_manifest(out_dir, {
        "tables": ["chunk_ents", "mentions", "edges_raw", "nodes", "edges"],
        "num_partitions": cfg.num_partitions,
        "edge_rows": sum(edge_counts.values()),
        "node_rows": node_rows,
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
        "node_rows": node_rows,
        "edge_rows": sum(edge_counts.values()),
        "phase_sec": phase_sec,
        "skew_probe": skew_probe,
    }


def ingest_increment(
    pages_ds,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    alias_table: pa.Table | None = None,
    dedup_recrawls: bool = False,
) -> dict:
    """Add new pages to an EXISTING graph — the reference's primary
    lifecycle (ingest more documents later, operations.py / scripts/
    ingest_documents.py) without its re-ingest duplication bug:

    1. anti-join the incoming pages against the already-ingested url set
       (Ray native ``left_anti`` hash join on the chunk_ents checkpoint —
       re-submitted urls are skipped, making increments idempotent),
    2. run the extraction phases on the NEW pages only, appending to the
       per-partition checkpoint tables (manifests recounted afterwards),
    3. rebuild the global phases (canonicalize + edge merge) from the
       full checkpointed tables — deterministic, so the result is
       bit-identical to a fresh build over the union corpus
       (tests/test_increment.py).

    The expensive work (extraction) is proportional to the INCREMENT;
    only the entity/triple-grain global phases touch history.

    Within-batch recrawls (the SAME url twice in one increment) follow
    fresh-build semantics: both versions are kept unless
    ``dedup_recrawls=True`` (keep only the latest warc_ts per url, like
    build_kg's flag) or ``ingest_increment_supersede`` is used — this is
    what keeps increments bit-identical to a fresh union build.
    """
    import ray
    import ray.data as rd

    chunk_ents_dir = os.path.join(out_dir, "chunk_ents")
    if not os.path.isdir(chunk_ents_dir):
        return build_kg(pages_ds, out_dir, cfg, alias_table=alias_table,
                        dedup_recrawls=dedup_recrawls)
    if dedup_recrawls:
        pages_ds = dedup_recrawls_keep_latest(pages_ds)

    # the existing-url read below must see a WHOLE store: finished swaps
    # (a parked part dir would otherwise be invisible — its urls would
    # re-ingest and recovery would then discard the parked copy), no
    # half-applied supersede, no half-landed previous increment
    _recover_pending_journals(out_dir, cfg, alias_table)

    existing_urls = (
        rd.read_parquet(chunk_ents_dir, columns=["url"])
        .groupby("url").count().select_columns(["url"])
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(64, ncpu // 2))
    # materialize: the new-page set is increment-bounded and is consumed
    # twice (journal urls + the build); re-executing the anti-join would
    # scan the store's url column a second time
    new_pages = pages_ds.join(existing_urls, "left_anti", nparts,
                              on=("url",)).materialize()
    url_df = new_pages.select_columns(["url"]).to_pandas()
    new_urls = (sorted(set(url_df["url"]))
                if "url" in url_df.columns else [])
    journal = _increment_journal_path(out_dir)
    if new_urls:
        # journal FIRST: the appends below land in three tables with no
        # atomicity between them; a kill mid-append is re-applied from
        # this journal (purge journaled urls + recompute touched
        # edges_raw partitions) before the next store read
        _write_url_journal(journal, new_urls)
    res = build_kg(new_pages, out_dir, cfg, alias_table=alias_table,
                   increment=True)
    if new_urls:
        os.remove(journal)
    return res


def _recover_purge_swaps(out_dir: str, table: str) -> None:
    """Finish (or discard) partition swaps a killed purge left behind.

    Invariant of the swap protocol below: a complete copy of every part's
    data exists on disk at all times — either at ``part=K`` or parked under
    ``.purge_new`` / ``.purge_old``. This recovery makes the protocol
    idempotent: new-copy present + live dir missing -> finish the swap;
    live dir present -> the parked copies are leftovers, drop them.
    """
    tdir = os.path.join(out_dir, table)
    new_root = os.path.join(tdir, ".purge_new")
    old_root = os.path.join(tdir, ".purge_old")
    if os.path.isdir(new_root):
        for entry in os.listdir(new_root):
            live = os.path.join(tdir, entry)
            if not os.path.isdir(live):
                os.rename(os.path.join(new_root, entry), live)
    shutil.rmtree(new_root, ignore_errors=True)
    shutil.rmtree(old_root, ignore_errors=True)


def _purge_part_files(pdir: str, tmp_dir: str, url_arr: pa.Array) -> None:
    """Stream one part's parquet files through the url filter into
    ``tmp_dir`` — one FILE resident at a time, never the whole part (a
    part of a 100 TB corpus is many bounded-size files)."""
    import pyarrow.parquet as pq

    names = sorted(n for n in os.listdir(pdir) if n.endswith(".parquet"))
    if not names:
        # a killed write can leave a part dir with no files at all —
        # nothing to purge, and no schema to synthesize an empty file
        # from; leave the dir untouched (hive discovery ignores it)
        return
    os.makedirs(tmp_dir, exist_ok=True)
    i = 0
    for name in names:
        t = pq.read_table(os.path.join(pdir, name))
        t = t.filter(pc.invert(pc.is_in(t["url"], value_set=url_arr)))
        if t.num_rows:
            pq.write_table(t, os.path.join(tmp_dir, f"purged-{i}.parquet"))
            i += 1
    if i == 0:
        # keep the part dir non-empty so hive discovery still sees the
        # partition (typed empty file)
        schema = pq.read_schema(os.path.join(pdir, names[0]))
        pq.write_table(schema.empty_table(),
                       os.path.join(tmp_dir, "purged-0.parquet"))


def _purge_urls_from_table(out_dir: str, table: str, urls_ref,
                           parts: set[int]) -> None:
    """Rewrite the affected part dirs of a url-carrying table with the
    superseded urls' rows removed (partition-granular compaction — the
    resumable layout makes 'rewrite one part' the unit of work).

    Distributed: one Ray task per touched part, each streaming its files
    (the driver never holds a part's rows). Crash-safe: the purged copy is
    written to ``.purge_new/part=K`` first, the part's manifest is deleted
    (officially incomplete), then two atomic renames swap the dirs — a
    kill in any window leaves a complete on-disk copy that
    ``_recover_purge_swaps`` finishes or discards.
    """
    import ray

    _recover_purge_swaps(out_dir, table)
    tdir = os.path.join(out_dir, table)

    @ray.remote
    def purge_part(part: int) -> int:
        pdir = os.path.join(tdir, f"part={part}")
        if not os.path.isdir(pdir):
            return part
        url_arr = pa.array(sorted(ray.get(urls_ref)))
        _purge_part_files(pdir, os.path.join(tdir, ".purge_new",
                                             f"part={part}"), url_arr)
        return part

    done = ray.get([purge_part.remote(p) for p in sorted(parts)])
    # swap on the driver (cheap metadata ops; the data moves were remote)
    for part in done:
        pdir = os.path.join(tdir, f"part={part}")
        tmp_new = os.path.join(tdir, ".purge_new", f"part={part}")
        if not os.path.isdir(tmp_new):
            continue
        mpath = os.path.join(out_dir, "_manifests",
                             f"{table}-part-{part}.json")
        if os.path.exists(mpath):
            os.remove(mpath)
        old = os.path.join(tdir, ".purge_old", f"part={part}")
        os.makedirs(os.path.dirname(old), exist_ok=True)
        os.rename(pdir, old)
        os.rename(tmp_new, pdir)
    shutil.rmtree(os.path.join(tdir, ".purge_new"), ignore_errors=True)
    shutil.rmtree(os.path.join(tdir, ".purge_old"), ignore_errors=True)


def _supersede_journal_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests", "supersede_pending.json")


def _increment_journal_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests", "increment_pending.json")


def _write_url_journal(path: str, urls) -> None:
    import json

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"urls": sorted(urls)}, f)
    os.replace(tmp, path)


def _recover_pending_journals(out_dir: str, cfg: EngineConfig,
                              alias_table: pa.Table | None) -> None:
    """Make an interrupted multi-table operation whole BEFORE anything
    reads the checkpoint tables. Three layers, in order:

    1. parked purge/compaction swap dirs are finished or discarded
       (a kill between a swap's two renames),
    2. a pending SUPERSEDE journal is re-applied (kill between the
       chunk_ents purge and the mentions purge would otherwise leave the
       two tables disagreeing about a url — and the purge path deletes
       part manifests that only ``_apply_supersede`` restores, so
       entering via resume/increment without this re-apply would let the
       orphan cleanup delete complete-but-manifest-less partitions),
    3. a pending INCREMENT journal is re-applied: an increment appends
       to chunk_ents on a background thread and to mentions/edges_raw
       synchronously, so a kill can land a url's rows in SOME tables
       only. Purging the journaled (increment-bounded) url set from the
       url-grain tables and recomputing the touched partitions'
       edges_raw — exactly ``_apply_supersede`` — returns the store to
       its pre-increment state; the retried increment then re-ingests
       those urls from scratch.

    Every store entry point (build_kg resume/increment,
    ingest_increment, ingest_increment_supersede) calls this first.
    Idempotent: re-running any layer is a no-op once the store is whole.
    """
    import json

    for table in ("chunk_ents", "mentions", "edges_raw"):
        _recover_purge_swaps(out_dir, table)
    for journal in (_supersede_journal_path(out_dir),
                    _increment_journal_path(out_dir)):
        if not os.path.exists(journal):
            continue
        with open(journal) as f:
            pending = set(json.load(f)["urls"])
        if pending:
            _apply_supersede(out_dir, cfg, alias_table, pending)
        os.remove(journal)


def _apply_supersede(out_dir: str, cfg: EngineConfig,
                     alias_table: pa.Table | None,
                     supersede_urls: set[str]) -> None:
    """Steps 1-2 of supersession: purge the superseded urls' rows from the
    url-carrying tables and recompute edges_raw for the touched
    partitions. IDEMPOTENT — purging already-purged urls rewrites the same
    rows and the edges_raw recompute is deterministic — so the journaled
    recovery path can simply re-apply it."""
    import ray
    import ray.data as rd

    _require_current_url_hash(out_dir)
    nparts = read_layout(out_dir) or effective_partitions(cfg)
    from ..functions.hashing import url_parts_vec

    parts = set(url_parts_vec(sorted(supersede_urls), nparts).tolist())
    urls_ref = ray.put(sorted(supersede_urls))
    # 1. purge the old versions' rows (url-carrying tables) — Ray tasks
    #    per part, crash-safe swap
    for table in ("chunk_ents", "mentions"):
        _purge_urls_from_table(out_dir, table, urls_ref, parts)
        _write_part_manifests(out_dir, table)
    # 2. recompute edges_raw for the touched partitions from the purged
    #    chunk_ents (edge rows have no url after the partial merge —
    #    partition recompute is the exact unit)
    from ..stages.entities import CHUNK_ENTS_SCHEMA

    for part in sorted(parts):
        er_dir = os.path.join(out_dir, "edges_raw", f"part={part}")
        shutil.rmtree(er_dir, ignore_errors=True)
        mpath = os.path.join(out_dir, "_manifests",
                             f"edges_raw-part-{part}.json")
        if os.path.exists(mpath):
            os.remove(mpath)
    part_arr = pa.array(sorted(parts), pa.int32())

    def only_parts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["part"].cast(pa.int32()),
                              value_set=part_arr))
        cols = [t[f.name].cast(f.type).combine_chunks()
                for f in CHUNK_ENTS_SCHEMA]
        return pa.Table.from_arrays(cols, schema=CHUNK_ENTS_SCHEMA)

    alias_ref = (put_alias_dict(alias_table)
                 if alias_table is not None else None)
    ce_parts = rd.read_parquet(
        os.path.join(out_dir, "chunk_ents")).map_batches(
        only_parts, batch_format="pyarrow")
    _coalesce_blocks(ce_parts.map_batches(
        RelationExtractorStage(alias_ref, cfg),
        batch_format="pyarrow", batch_size=cfg.relation_batch_size)
    ).write_parquet(os.path.join(out_dir, "edges_raw"),
                    partition_cols=["part"])
    _write_part_manifests(out_dir, "edges_raw")


def ingest_increment_supersede(
    pages_ds,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    alias_table: pa.Table | None = None,
) -> dict:
    """Increment with RE-CRAWL SUPERSESSION (V1 across increments): a
    resubmitted url with a NEWER warc_ts replaces its previous version —
    the reference's ``is_current=false`` supersession applied at ingest
    time (versioning.py:26-74) instead of the plain increment's
    skip-existing policy.

    Partition-granular repair: superseded urls' rows are purged from
    chunk_ents and mentions (both carry url); edges_raw rows can span
    urls after the partial merge, so the affected PARTITIONS' edges_raw
    are recomputed from the purged chunk_ents — bounded by the touched
    partitions, never the corpus. Then the standard increment ingests the
    new crawls and rebuilds the global phases.
    """
    import ray
    import ray.data as rd

    chunk_ents_dir = os.path.join(out_dir, "chunk_ents")
    if not os.path.isdir(chunk_ents_dir):
        return build_kg(pages_ds, out_dir, cfg, alias_table=alias_table)

    # swap + journal recovery (see _recover_pending_journals): without the
    # supersede-journal re-apply in particular, a kill between the
    # chunk_ents purge and the mentions purge would be unrecoverable —
    # the superseded urls are already gone from chunk_ents, so recomputing
    # the supersede set from it yields an EMPTY set and the stale
    # mentions/edges_raw rows persist forever.
    _recover_pending_journals(out_dir, cfg, alias_table)
    journal = _supersede_journal_path(out_dir)

    # latest crawl per incoming url
    pages_latest = dedup_recrawls_keep_latest(pages_ds).materialize()
    # supersede set via a DISTRIBUTED join: the full historical url -> ts
    # map stays sharded across the cluster (at 100 TB it is far larger
    # than driver memory); the driver ends up holding only the superseded
    # url list, which is bounded by the INCREMENT size
    incoming = pages_latest.select_columns(["url", "warc_ts"])
    existing_max = (
        rd.read_parquet(chunk_ents_dir, columns=["url", "valid_from"])
        .groupby("url").max("valid_from")
    )
    ncpu_j = int(ray.cluster_resources().get("CPU", 8))
    nparts_j = max(2, min(64, ncpu_j // 2))
    joined = incoming.join(existing_max, "inner", nparts_j, on=("url",))

    def newer_only(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["warc_ts"].cast(pa.timestamp("us")),
                          t["max(valid_from)"].cast(pa.timestamp("us")))
        return t.filter(keep).select(["url"])

    sup_df = joined.map_batches(newer_only,
                                batch_format="pyarrow").to_pandas()
    # an all-filtered result comes back as a COLUMN-LESS empty frame
    # (Ray's to_pandas drops the schema on empty) — no superseded urls
    supersede_urls = (set(sup_df["url"]) if "url" in sup_df.columns
                      else set())

    if supersede_urls:
        # journal FIRST (atomic tmp+rename): any kill during the purge /
        # recompute below is re-applied from the journal on the next run
        _write_url_journal(journal, supersede_urls)
        _apply_supersede(out_dir, cfg, alias_table, supersede_urls)
        os.remove(journal)

    # 3. standard increment over genuinely-new + superseding crawls
    #    (the superseded urls are gone from chunk_ents, so the anti-join
    #    lets their new versions through)
    return ingest_increment(pages_latest, out_dir, cfg,
                            alias_table=alias_table)
