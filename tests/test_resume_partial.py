"""Partition-granular resume after a simulated mid-job kill (north_rule).

Simulates a killed run by deleting the data + manifests of a subset of
partitions from a completed run, then resumes and verifies:
- the final graph equals an uninterrupted run's graph,
- completed partitions were NOT recomputed (their files untouched).
"""

from __future__ import annotations

import os
import shutil

import pyarrow.dataset as pads
import pytest


def _edge_keys(path: str) -> set:
    t = pads.dataset(path, partitioning="hive").to_table(
        columns=["subj_id", "pred", "obj_id"])
    return set(zip(t["subj_id"].to_pylist(), t["pred"].to_pylist(),
                   t["obj_id"].to_pylist()))


def _files_in(path: str) -> set:
    out = set()
    for root, _, files in os.walk(path):
        for f in files:
            out.add(os.path.join(root, f))
    return out


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import completed_parts

    pages = pages_table(list(range(80)))
    pristine_dir = str(tmp_path / "pristine")
    killed_dir = str(tmp_path / "killed")

    r_pristine = build_kg(rd.from_arrow(pages), pristine_dir,
                          alias_table=alias_table())
    build_kg(rd.from_arrow(pages), killed_dir, alias_table=alias_table())

    # simulate a kill that lost half the partitions of every phase table
    all_parts = sorted(completed_parts(killed_dir, "chunk_ents"))
    lost = set(all_parts[: len(all_parts) // 2])
    kept = set(all_parts) - lost
    assert lost and kept
    for table in ("chunk_ents", "mentions", "edges_raw"):
        for part in lost:
            shutil.rmtree(os.path.join(killed_dir, table, f"part={part}"),
                          ignore_errors=True)
            mpath = os.path.join(killed_dir, "_manifests",
                                 f"{table}-part-{part}.json")
            if os.path.exists(mpath):
                os.remove(mpath)

    kept_files_before = {
        table: {
            part: _files_in(os.path.join(killed_dir, table, f"part={part}"))
            for part in kept
        }
        for table in ("chunk_ents", "mentions", "edges_raw")
    }

    r_resumed = build_kg(rd.from_arrow(pages), killed_dir,
                         alias_table=alias_table(), resume=True)

    # final graph identical to the uninterrupted run
    assert _edge_keys(r_resumed["edges"]) == _edge_keys(r_pristine["edges"])
    assert r_resumed["node_rows"] == r_pristine["node_rows"]

    # completed partitions were not recomputed: their files are untouched
    for table, per_part in kept_files_before.items():
        for part, files in per_part.items():
            now = _files_in(os.path.join(killed_dir, table, f"part={part}"))
            assert files <= now, (table, part)

    # lost partitions were rebuilt and re-marked complete
    assert completed_parts(killed_dir, "chunk_ents") == set(all_parts)
    assert completed_parts(killed_dir, "edges_raw") == set(all_parts)


@pytest.mark.usefixtures("ray_session")
def test_skewed_kill_chunk_ents_done_mentions_missing(tmp_path):
    """ADVICE r1 (high): a partition whose chunk_ents checkpoint completed
    but whose mentions/edges_raw were never written (kill window between
    the background chunk_ents write and phase B) must be reprocessed from
    the durable chunk_ents Parquet on resume — not silently dropped."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import completed_parts

    pages = pages_table(list(range(80)))
    pristine_dir = str(tmp_path / "pristine")
    killed_dir = str(tmp_path / "killed")
    r_pristine = build_kg(rd.from_arrow(pages), pristine_dir,
                          alias_table=alias_table())
    build_kg(rd.from_arrow(pages), killed_dir, alias_table=alias_table())

    all_parts = sorted(completed_parts(killed_dir, "chunk_ents"))
    # SKEWED kill: chunk_ents manifest/data KEPT, mentions + edges_raw
    # deleted, for half the partitions
    lost = set(all_parts[: len(all_parts) // 2])
    assert lost
    for table in ("mentions", "edges_raw"):
        for part in lost:
            shutil.rmtree(os.path.join(killed_dir, table, f"part={part}"),
                          ignore_errors=True)
            mpath = os.path.join(killed_dir, "_manifests",
                                 f"{table}-part-{part}.json")
            if os.path.exists(mpath):
                os.remove(mpath)

    r_resumed = build_kg(rd.from_arrow(pages), killed_dir,
                         alias_table=alias_table(), resume=True)
    assert _edge_keys(r_resumed["edges"]) == _edge_keys(r_pristine["edges"])
    assert r_resumed["node_rows"] == r_pristine["node_rows"]
    assert completed_parts(killed_dir, "mentions") == set(all_parts)
    assert completed_parts(killed_dir, "edges_raw") == set(all_parts)


@pytest.mark.usefixtures("ray_session")
def test_resume_cleans_partial_unmarked_files(tmp_path):
    """ADVICE r1 (medium): part dirs WITHOUT a manifest may hold partial
    files from a killed write; resume must delete them before recomputing,
    or the append-mode rewrite silently duplicates rows."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import completed_parts

    pages = pages_table(list(range(80)))
    pristine_dir = str(tmp_path / "pristine")
    killed_dir = str(tmp_path / "killed")
    r_pristine = build_kg(rd.from_arrow(pages), pristine_dir,
                          alias_table=alias_table())
    build_kg(rd.from_arrow(pages), killed_dir, alias_table=alias_table())

    all_parts = sorted(completed_parts(killed_dir, "mentions"))
    victim = all_parts[0]
    part_dir = os.path.join(killed_dir, "mentions", f"part={victim}")
    # simulate the kill: manifest removed (write "didn't finish"), but the
    # data files SURVIVE as orphans — plus an extra partial file copy
    os.remove(os.path.join(killed_dir, "_manifests",
                           f"mentions-part-{victim}.json"))
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    shutil.copy(os.path.join(part_dir, files[0]),
                os.path.join(part_dir, "partial_leftover.parquet"))

    r_resumed = build_kg(rd.from_arrow(pages), killed_dir,
                         alias_table=alias_table(), resume=True)
    assert _edge_keys(r_resumed["edges"]) == _edge_keys(r_pristine["edges"])

    # mentions table has no duplicates: same row count as pristine
    def _count(d):
        return pads.dataset(os.path.join(d, "mentions"),
                            partitioning="hive").count_rows()

    assert _count(killed_dir) == _count(pristine_dir)
    _ = pq


@pytest.mark.usefixtures("ray_session")
def test_partition_count_invariance_and_layout_reuse(tmp_path):
    """The partition count is a LAYOUT choice, not a semantics one: builds
    at two different counts produce identical graphs, and a resumed run
    (or an auto-config increment) reuses the recorded layout instead of
    re-deriving it (VERDICT r2 item 10)."""
    import dataclasses

    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import (
        completed_parts,
        read_layout,
    )

    pages = pages_table(list(range(80)))
    cfg16 = dataclasses.replace(DEFAULT_CONFIG, num_partitions=16)
    cfg7 = dataclasses.replace(DEFAULT_CONFIG, num_partitions=7)
    r16 = build_kg(rd.from_arrow(pages), str(tmp_path / "n16"), cfg=cfg16,
                   alias_table=alias_table())
    r7 = build_kg(rd.from_arrow(pages), str(tmp_path / "n7"), cfg=cfg7,
                  alias_table=alias_table())
    assert _edge_keys(r16["edges"]) == _edge_keys(r7["edges"])
    assert r16["node_rows"] == r7["node_rows"]
    assert read_layout(str(tmp_path / "n7")) == 7
    assert max(completed_parts(str(tmp_path / "n7"), "chunk_ents")) < 7

    # resume with auto config (num_partitions=None) against the n7 output
    # must reuse the recorded 7-part layout, and an explicit conflicting
    # count must be rejected
    lost = sorted(completed_parts(str(tmp_path / "n7"), "chunk_ents"))[:2]
    for table in ("chunk_ents", "mentions", "edges_raw"):
        for part in lost:
            shutil.rmtree(os.path.join(str(tmp_path / "n7"), table,
                                       f"part={part}"), ignore_errors=True)
            mpath = os.path.join(str(tmp_path / "n7"), "_manifests",
                                 f"{table}-part-{part}.json")
            if os.path.exists(mpath):
                os.remove(mpath)
    r_resume = build_kg(rd.from_arrow(pages), str(tmp_path / "n7"),
                        alias_table=alias_table(), resume=True)
    assert _edge_keys(r_resume["edges"]) == _edge_keys(r16["edges"])
    assert read_layout(str(tmp_path / "n7")) == 7

    with pytest.raises(ValueError, match="conflicts with the existing"):
        build_kg(rd.from_arrow(pages), str(tmp_path / "n7"), cfg=cfg16,
                 alias_table=alias_table(), resume=True)


@pytest.mark.usefixtures("ray_session")
def test_legacy_url_hash_layout_is_refused(tmp_path):
    """An output partitioned with a different url->part hash (a pre-layout
    output carrying only _run.json, or a layout manifest naming another
    scheme) must be REFUSED loudly on resume/increment/supersede — the
    part-addressing operations would otherwise silently drop/duplicate
    rows by recomputing parts with the wrong hash."""
    import json
    import os

    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        build_kg,
        ingest_increment,
        ingest_increment_supersede,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    out = str(tmp_path / "legacy")
    build_kg(rd.from_arrow(pages_table(list(range(20)))), out,
             alias_table=alias_table())
    # simulate a pre-layout output: only _run.json records the count
    os.remove(os.path.join(out, "_manifests", "_layout.json"))
    with open(os.path.join(out, "_manifests", "_run.json")) as f:
        assert json.load(f)["num_partitions"]  # fallback path is live

    inc = rd.from_arrow(pages_table(list(range(20, 25))))
    with pytest.raises(ValueError, match="url hash"):
        ingest_increment(inc, out, alias_table=alias_table())
    with pytest.raises(ValueError, match="url hash"):
        ingest_increment_supersede(inc, out, alias_table=alias_table())
    with pytest.raises(ValueError, match="url hash"):
        build_kg(inc, out, alias_table=alias_table(), resume=True)

    # an explicit foreign scheme in the layout manifest is refused too
    out2 = str(tmp_path / "foreign")
    build_kg(rd.from_arrow(pages_table(list(range(20)))), out2,
             alias_table=alias_table())
    lpath = os.path.join(out2, "_manifests", "_layout.json")
    with open(lpath) as f:
        layout = json.load(f)
    assert layout["url_hash"] == "siphash64"
    layout["url_hash"] = "md5"
    with open(lpath, "w") as f:
        json.dump(layout, f)
    with pytest.raises(ValueError, match="url hash"):
        build_kg(inc, out2, alias_table=alias_table(), resume=True)
