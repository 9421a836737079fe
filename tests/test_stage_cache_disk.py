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
    disk_cfg = dataclasses.replace(DEFAULT_CONFIG, stage_cache="disk")
    dsk = build_kg(rd.from_arrow(pages), str(tmp_path / "dsk"),
                   cfg=disk_cfg, alias_table=alias_table())

    def edge_keys(path):
        t = pads.dataset(path, partitioning="hive").to_table(
            columns=["subj_id", "pred", "obj_id", "valid_from"])
        return set(zip(t["subj_id"].to_pylist(), t["pred"].to_pylist(),
                       t["obj_id"].to_pylist(), t["valid_from"].to_pylist()))

    assert edge_keys(mem["edges"]) == edge_keys(dsk["edges"])
    assert mem["node_rows"] == dsk["node_rows"]
