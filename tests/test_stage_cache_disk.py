"""stage_cache="disk" (the 100 TB streaming layout) matches memory mode."""

from __future__ import annotations

import dataclasses

import pyarrow.dataset as pads
import pytest


@pytest.mark.usefixtures("ray_session")
def test_disk_mode_matches_memory_mode(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    pages = pages_table(list(range(60)))
    mem = build_kg(rd.from_arrow(pages), str(tmp_path / "mem"),
                   alias_table=alias_table())

    # Instrument materialize(): in disk mode NOTHING page/chunk-grain may
    # be pinned in the object store — the 100 TB claim is that phase A
    # streams straight to Parquet. Phase C may still materialize its small
    # derived tables (canonical entities, merged triples), but any
    # materialized dataset carrying chunk text is a violation.
    from ray.data import Dataset

    materialized_schemas: list[list[str]] = []
    orig_mat = Dataset.materialize

    def spy_mat(self):
        out = orig_mat(self)
        materialized_schemas.append(list(out.schema().names))
        return out

    Dataset.materialize = spy_mat
    try:
        disk_cfg = dataclasses.replace(DEFAULT_CONFIG, stage_cache="disk")
        dsk = build_kg(rd.from_arrow(pages), str(tmp_path / "dsk"),
                       cfg=disk_cfg, alias_table=alias_table())
    finally:
        Dataset.materialize = orig_mat

    for names in materialized_schemas:
        assert "text" not in names and "html" not in names, (
            f"disk mode materialized a page/chunk-grain dataset: {names}")

    def edge_keys(path):
        t = pads.dataset(path, partitioning="hive").to_table(
            columns=["subj_id", "pred", "obj_id", "valid_from"])
        return set(zip(t["subj_id"].to_pylist(), t["pred"].to_pylist(),
                       t["obj_id"].to_pylist(), t["valid_from"].to_pylist()))

    assert edge_keys(mem["edges"]) == edge_keys(dsk["edges"])
    assert mem["node_rows"] == dsk["node_rows"]


@pytest.mark.usefixtures("ray_session")
def test_disk_mode_increment_equals_fresh_union(tmp_path):
    """disk-mode increment must NOT re-derive mentions/edges_raw for the
    pre-existing partitions (the durable chunk_ents Parquet holds every
    part — sourcing phase B from it would append duplicate rows into the
    already-complete part dirs, roughly doubling mention counts)."""
    import pandas.testing as pdt
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.pipelines.kg import (
        build_kg,
        ingest_increment,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    cfg = dataclasses.replace(DEFAULT_CONFIG, stage_cache="disk")

    full = build_kg(rd.from_arrow(pages_table(list(range(90)))),
                    str(tmp_path / "full"), cfg=cfg,
                    alias_table=alias_table())

    inc_dir = str(tmp_path / "inc")
    build_kg(rd.from_arrow(pages_table(list(range(60)))), inc_dir,
             cfg=cfg, alias_table=alias_table())
    r2 = ingest_increment(rd.from_arrow(pages_table(list(range(30, 90)))),
                          inc_dir, cfg=cfg, alias_table=alias_table())

    def graph_key(res):
        edges = (pads.dataset(res["edges"], partitioning="hive").to_table()
                 .select(["subj_id", "pred", "obj_id", "valid_from",
                          "confidence"]).to_pandas()
                 .sort_values(["subj_id", "pred", "obj_id"],
                              ignore_index=True))
        nodes = (pads.dataset(res["nodes"]).to_table()
                 .select(["entity_id", "name", "type", "mention_count"])
                 .to_pandas().sort_values("entity_id", ignore_index=True))
        return edges, nodes

    fe, fn = graph_key(full)
    ie, inn = graph_key(r2)
    pdt.assert_frame_equal(fe, ie)
    pdt.assert_frame_equal(fn, inn)

    # mention rows must appear exactly once per (chunk, surface, position)
    # — duplicates are the disk+increment failure mode
    m = (pads.dataset(str(tmp_path / "inc" / "mentions"),
                      partitioning="hive").to_table()
         .select(["chunk_id", "surface", "position"]).to_pandas())
    assert not m.duplicated().any()
