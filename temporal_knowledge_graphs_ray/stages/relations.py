"""Relation-extraction actor stage (chunk_ents -> raw edges).

The reference calls an LLM per chunk with the chunk's entity list and
resolves returned names fuzzily (relation_extractor.py:60-122); our stage
runs the deterministic pattern kernel (functions/relations.py) per chunk
inside an actor pool. Chunks with < 2 entities are skipped (reference
relation_extractor.py:90-91, pipeline.py:388-390).

Raw edges carry SURFACE names + types; canonicalization rewrites them to
canonical entity names/ids later. A per-batch partial merge (the exact
same kernel as the global merge — it is associative and commutative under
this engine's deterministic merge spec) shrinks the shuffle input before
the global groupby, which is the hub-subject skew mitigation.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.normalize import surface_key
from ..functions.relations import extract_quads, merge_duplicate_relations

RAW_EDGES_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("subj_surface", pa.string()),
    ("subj_type", pa.string()),
    ("subj_key", pa.string()),
    ("pred", pa.string()),
    ("pred_key", pa.string()),
    ("obj_surface", pa.string()),
    ("obj_type", pa.string()),
    ("obj_key", pa.string()),
    ("valid_from", pa.timestamp("us")),
    ("description", pa.large_string()),
    ("confidence", pa.float32()),
    ("source_chunks", pa.list_(pa.string())),
])


class RelationExtractorStage:
    """Actor-pool stage: chunk_ents -> raw (pre-merged) edge rows."""

    def __init__(self, alias_ref=None, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self._alias_ref = alias_ref
        self._aliases: dict | None = None

    @property
    def aliases(self) -> dict:
        if self._aliases is None:
            if self._alias_ref is None:
                self._aliases = {}
            else:
                import ray

                self._aliases = ray.get(self._alias_ref)
        return self._aliases

    def _extract(self, text: str, entity_names: list[str], valid_from):
        return extract_quads(text, entity_names, valid_from)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # rows bucketed per input partition: the per-batch partial merge must
        # not merge across partitions, or edges_raw rows would not belong to
        # exactly one input part and partition-granular resume would break.
        rows_by_part: dict[int, list[dict]] = {}
        texts = batch["text"].to_pylist()
        chunk_ids = batch["chunk_id"].to_pylist()
        vfs = batch["valid_from"].to_pylist()
        parts = batch["part"].to_pylist()
        # flat name/type arrays + list offsets instead of to_pylist() of
        # the struct column: per-mention dicts are pure conversion cost
        ents_col = batch["entities"]
        if isinstance(ents_col, pa.ChunkedArray):
            ents_col = ents_col.combine_chunks()
        flat = ents_col.flatten()  # values sliced to [offsets[0], offsets[-1])
        offs = ents_col.offsets.to_numpy()
        offs = offs - offs[0]
        fnames = flat.field("name").to_pylist()
        ftypes = flat.field("type").to_pylist()
        for i, (text, chunk_id, vf, part) in enumerate(zip(
            texts, chunk_ids, vfs, parts
        )):
            lo, hi = offs[i], offs[i + 1]
            if hi - lo < 2:
                continue
            rows = rows_by_part.setdefault(int(part), [])
            names = fnames[lo:hi]
            # first type wins for a name (dict-insertion semantics, like the
            # reference's entity_lookup built in listing order)
            type_of: dict[str, str] = {}
            for nm, tp in zip(names, ftypes[lo:hi]):
                type_of.setdefault(nm, tp)
            for q in self._extract(text, names, vf):
                s_name, t_name = q["source"], q["target"]
                s_type = type_of.get(s_name, "OTHER")
                t_type = type_of.get(t_name, "OTHER")
                s_linked = self.aliases.get((s_type, s_name.lower()), s_name)
                t_linked = self.aliases.get((t_type, t_name.lower()), t_name)
                rows.append({
                    # partial-merge keys must include the TYPE: the same
                    # surface can be typed differently in different chunks,
                    # and a type-blind merge would keep whichever type came
                    # first in the batch (batch-order nondeterminism)
                    "_skey": f"{s_type}|{s_linked}",
                    "_tkey": f"{t_type}|{t_linked}",
                    "source": s_linked,
                    "subj_type": s_type,
                    "target": t_linked,
                    "obj_type": t_type,
                    "relationship": q["relationship"],
                    "valid_from": q["valid_from"],
                    "description": q["description"],
                    "confidence": q["confidence"],
                    "source_chunks": [chunk_id],
                })
        # partial merge inside the batch, per input partition (skew/volume
        # reduction before the global (subj, pred, obj) shuffle)
        merged: list[dict] = []
        for part in sorted(rows_by_part):
            for r in merge_duplicate_relations(
                rows_by_part[part], key_fields=("_skey", "_tkey"),
                max_source_chunks=self.cfg.max_source_chunks,
            ):
                r["part"] = part
                merged.append(r)
        return pa.Table.from_arrays(
            [
                pa.array([r["part"] for r in merged], pa.int32()),
                pa.array([r["source"] for r in merged], pa.string()),
                pa.array([r["subj_type"] for r in merged], pa.string()),
                pa.array([surface_key(r["source"]) for r in merged], pa.string()),
                pa.array([r["relationship"] for r in merged], pa.string()),
                pa.array([r["relationship"].lower() for r in merged], pa.string()),
                pa.array([r["target"] for r in merged], pa.string()),
                pa.array([r["obj_type"] for r in merged], pa.string()),
                pa.array([surface_key(r["target"]) for r in merged], pa.string()),
                pa.array([r["valid_from"] for r in merged], pa.timestamp("us")),
                pa.array([r["description"] for r in merged], pa.large_string()),
                pa.array([r["confidence"] for r in merged], pa.float32()),
                pa.array([r["source_chunks"] for r in merged],
                         pa.list_(pa.string())),
            ],
            schema=RAW_EDGES_SCHEMA,
        )
