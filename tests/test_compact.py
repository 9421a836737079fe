"""Partition compaction (OPTIMIZE): content-identical, fewer files,
crash-safe, and the rebuilt global phases are bit-identical afterwards."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

_SORT_KEYS = {
    "chunk_ents": ["url", "chunk_index"],          # unique per chunk
    "mentions": ["url", "chunk_id", "position", "surface", "type"],
    "edges_raw": None,                             # no natural unique key
}


def _canon_table(out_dir, table):
    """Read a checkpoint table into a canonically-ordered Arrow table
    (content comparison independent of file layout)."""
    t = pads.dataset(os.path.join(out_dir, table),
                     partitioning="hive").to_table()
    t = t.combine_chunks()
    keys = _SORT_KEYS[table]
    if keys is not None:
        idx = pc.sort_indices(t, sort_keys=[(k, "ascending")
                                            for k in keys])
        return t.take(idx)
    # edges_raw: canonicalize the list column, then sort by everything
    df = t.to_pandas()
    df["source_chunks"] = df["source_chunks"].map(
        lambda v: "|".join(sorted(v)))
    return df.sort_values(sorted(df.columns),
                          ignore_index=True)[sorted(df.columns)]


def _assert_same(a, b):
    import pandas as pd
    import pandas.testing as pdt

    if isinstance(a, pd.DataFrame):
        pdt.assert_frame_equal(a, b)
    else:
        assert a.schema.equals(b.schema)
        assert a.equals(b)


def _files_per_part(out_dir, table):
    tdir = os.path.join(out_dir, table)
    out = {}
    for entry in sorted(os.listdir(tdir)):
        if entry.startswith("part="):
            out[entry] = sorted(
                n for n in os.listdir(os.path.join(tdir, entry))
                if n.endswith(".parquet"))
    return out


def _graph_key(res):
    edges = (pads.dataset(res["edges"], partitioning="hive").to_table()
             .select(["subj_id", "pred", "obj_id", "valid_from",
                      "confidence"]).to_pandas()
             .sort_values(["subj_id", "pred", "obj_id"],
                          ignore_index=True))
    nodes = (pads.dataset(res["nodes"]).to_table()
             .select(["entity_id", "name", "type", "mention_count"])
             .to_pandas().sort_values("entity_id", ignore_index=True))
    return edges, nodes


@pytest.mark.usefixtures("ray_session")
def test_compact_identity_and_file_reduction(tmp_path):
    import pandas.testing as pdt
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.compact import (
        CHECKPOINT_TABLES,
        compact_store,
    )
    from temporal_knowledge_graphs_ray.pipelines.kg import (
        build_kg,
        ingest_increment,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    out = str(tmp_path / "kg")
    build_kg(rd.from_arrow(pages_table(list(range(40)))), out,
             alias_table=alias_table())
    # three increments fragment the checkpoint tables
    for lo, hi in ((40, 80), (80, 110), (110, 140)):
        res = ingest_increment(
            rd.from_arrow(pages_table(list(range(lo, hi)))), out,
            alias_table=alias_table())

    before = {t: _canon_table(out, t) for t in CHECKPOINT_TABLES}
    files_before = {t: _files_per_part(out, t) for t in CHECKPOINT_TABLES}
    assert any(len(fs) >= 2
               for t in CHECKPOINT_TABLES
               for fs in files_before[t].values()), \
        "fixture did not fragment — test is vacuous"
    edges_before, nodes_before = _graph_key(res)

    report = compact_store(out, target_bytes=1 << 30)
    assert report["parts_compacted"] > 0
    assert report["files_after"] < report["files_before"]

    for t in CHECKPOINT_TABLES:
        # every part is now a single file (1 GiB target >> fixture size)
        for part, fs in _files_per_part(out, t).items():
            assert len(fs) == 1, (t, part, fs)
        _assert_same(before[t], _canon_table(out, t))

    # second compaction is a no-op
    report2 = compact_store(out, target_bytes=1 << 30)
    assert report2["parts_compacted"] == 0
    assert report2["files_after"] == report2["files_before"]

    # the global phases rebuilt from the compacted store are bit-identical
    res2 = ingest_increment(
        rd.from_arrow(pages_table(list(range(140)))), out,
        alias_table=alias_table())
    edges_after, nodes_after = _graph_key(res2)
    pdt.assert_frame_equal(edges_before, edges_after)
    pdt.assert_frame_equal(nodes_before, nodes_after)


@pytest.mark.usefixtures("ray_session")
def test_compact_crash_windows_recover(tmp_path):
    """A kill in either swap window leaves a recoverable store: parked
    copy + live dir present -> parked copy discarded; parked copy + live
    dir missing -> swap finished.  Either way content is intact and the
    part manifests (never deleted by compaction) stay valid."""
    import pandas.testing as pdt  # noqa: F401 (used via _assert_same)
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.compact import (
        _compact_part_files,
        compact_table,
    )
    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _recover_purge_swaps,
        build_kg,
        ingest_increment,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import (
        completed_parts,
    )

    out = str(tmp_path / "kg")
    build_kg(rd.from_arrow(pages_table(list(range(30)))), out,
             alias_table=alias_table())
    ingest_increment(rd.from_arrow(pages_table(list(range(30, 60)))),
                     out, alias_table=alias_table())
    table = "chunk_ents"
    want = _canon_table(out, table)
    marked = completed_parts(out, table)

    tdir = os.path.join(out, table)
    frag = next(e for e, fs in _files_per_part(out, table).items()
                if len(fs) >= 2)

    # window 1: compacted copy written, kill before the renames
    _compact_part_files(os.path.join(tdir, frag),
                        os.path.join(tdir, ".purge_new", frag), 1 << 30)
    _recover_purge_swaps(out, table)  # live dir present -> parked dropped
    assert not os.path.isdir(os.path.join(tdir, ".purge_new"))
    _assert_same(want, _canon_table(out, table))

    # window 2: kill between the two renames (live dir parked, new copy
    # still under .purge_new) -> recovery must finish the swap
    _compact_part_files(os.path.join(tdir, frag),
                        os.path.join(tdir, ".purge_new", frag), 1 << 30)
    os.makedirs(os.path.join(tdir, ".purge_old"), exist_ok=True)
    os.rename(os.path.join(tdir, frag),
              os.path.join(tdir, ".purge_old", frag))
    _recover_purge_swaps(out, table)
    assert os.path.isdir(os.path.join(tdir, frag))
    _assert_same(want, _canon_table(out, table))
    assert len(_files_per_part(out, table)[frag]) == 1  # swap finished
    assert completed_parts(out, table) == marked

    # full compaction still works after the recoveries
    compact_table(out, table, target_bytes=1 << 30)
    for part, fs in _files_per_part(out, table).items():
        assert len(fs) == 1
    assert completed_parts(out, table) == marked
    _assert_same(want, _canon_table(out, table))

    # window 3: kill between the renames, then the user runs a plain
    # ingest_increment WITHOUT any manual recovery — the entry point must
    # finish the swap BEFORE reading existing urls, or it would re-ingest
    # the parked part's urls and the recreated live dir would make
    # recovery discard the parked complete copy (permanent loss)
    some = sorted(_files_per_part(out, table))[0]
    _compact_part_files(os.path.join(tdir, some),
                        os.path.join(tdir, ".purge_new", some), 1 << 30)
    os.makedirs(os.path.join(tdir, ".purge_old"), exist_ok=True)
    os.rename(os.path.join(tdir, some),
              os.path.join(tdir, ".purge_old", some))
    res = ingest_increment(
        rd.from_arrow(pages_table(list(range(60)))), out,
        alias_table=alias_table())  # pure re-submit: must be a no-op
    assert os.path.isdir(os.path.join(tdir, some))
    _assert_same(want, _canon_table(out, table))
    assert res["edge_rows"] > 0
