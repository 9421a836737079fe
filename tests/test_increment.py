"""Incremental ingestion: build(A) + ingest_increment(B) must equal a
fresh build over A ∪ B, and re-submitting already-ingested pages must be
a no-op (idempotent increments — the reference's re-ingest duplicates,
operations.py:42-45; this engine must not)."""

from __future__ import annotations

import pyarrow.dataset as pads
import pytest


def _graph_key(res):
    edges = (pads.dataset(res["edges"], partitioning="hive").to_table()
             .select(["subj_id", "pred", "obj_id", "valid_from",
                      "confidence"]).to_pandas())
    edges = edges.sort_values(["subj_id", "pred", "obj_id"],
                              ignore_index=True)
    nodes = (pads.dataset(res["nodes"]).to_table()
             .select(["entity_id", "name", "type", "mention_count"])
             .to_pandas().sort_values("entity_id", ignore_index=True))
    return edges, nodes


@pytest.mark.usefixtures("ray_session")
def test_increment_equals_fresh_union_build(tmp_path):
    import pandas.testing as pdt
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        build_kg,
        ingest_increment,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    full = build_kg(rd.from_arrow(pages_table(list(range(120)))),
                    str(tmp_path / "full"), alias_table=alias_table())

    inc_dir = str(tmp_path / "inc")
    build_kg(rd.from_arrow(pages_table(list(range(80)))), inc_dir,
             alias_table=alias_table())
    # increment overlaps the base (pages 40..79 already ingested) — the
    # anti-join must skip them
    r2 = ingest_increment(rd.from_arrow(pages_table(list(range(40, 120)))),
                          inc_dir, alias_table=alias_table())

    fe, fn = _graph_key(full)
    ie, inn = _graph_key(r2)
    pdt.assert_frame_equal(fe, ie)
    pdt.assert_frame_equal(fn, inn)

    # idempotence: re-ingesting the same pages changes nothing
    r3 = ingest_increment(rd.from_arrow(pages_table(list(range(120)))),
                          inc_dir, alias_table=alias_table())
    ie3, inn3 = _graph_key(r3)
    pdt.assert_frame_equal(ie, ie3)
    pdt.assert_frame_equal(inn, inn3)


@pytest.mark.usefixtures("ray_session")
def test_increment_supersede_recrawl(tmp_path):
    from datetime import datetime

    import pandas.testing as pdt
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        build_kg,
        ingest_increment_supersede,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        PAGES_SCHEMA,
        alias_table,
        pages_table,
    )

    url = "https://x.example/recrawled"
    old = {"url": url, "warc_ts": datetime(2020, 1, 1),
           "html": b"<p>Alice Johnson founded Oldcorp Inc. in 2010.</p>",
           "text": "", "lang": "en"}
    new = {"url": url, "warc_ts": datetime(2022, 6, 1),
           "html": b"<p>Alice Johnson founded Newcorp Inc. in 2012.</p>",
           "text": "", "lang": "en"}

    base = pa.concat_tables([
        pages_table(list(range(60))),
        pa.Table.from_pylist([old], schema=PAGES_SCHEMA),
    ])
    inc = pa.concat_tables([
        pages_table(list(range(60, 70))),
        pa.Table.from_pylist([new], schema=PAGES_SCHEMA),
    ])
    union_latest = pa.concat_tables([
        pages_table(list(range(70))),
        pa.Table.from_pylist([new], schema=PAGES_SCHEMA),
    ])

    inc_dir = str(tmp_path / "inc")
    build_kg(rd.from_arrow(base), inc_dir, alias_table=alias_table())
    r2 = ingest_increment_supersede(rd.from_arrow(inc), inc_dir,
                                    alias_table=alias_table())
    fresh = build_kg(rd.from_arrow(union_latest),
                     str(tmp_path / "fresh"), alias_table=alias_table())

    ie, inn = _graph_key(r2)
    fe, fn = _graph_key(fresh)
    pdt.assert_frame_equal(ie, fe)
    pdt.assert_frame_equal(inn, fn)

    # the superseded fact is gone, the new one present
    names = set(inn["name"])
    assert not any("Oldcorp" in n for n in names)
    assert any("Newcorp" in n for n in names)


@pytest.mark.usefixtures("ray_session")
def test_diff_graphs_classifies_increment(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.graph import diff_graphs
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    old = build_kg(rd.from_arrow(pages_table(list(range(60)))),
                   str(tmp_path / "old"), alias_table=alias_table())
    new = build_kg(rd.from_arrow(pages_table(list(range(80)))),
                   str(tmp_path / "new"), alias_table=alias_table())
    d = diff_graphs(rd.read_parquet(old["edges"]),
                    rd.read_parquet(new["edges"]))
    added = d["added"].count()
    removed = d["removed"].count()
    unchanged = d["unchanged"].count()
    assert added > 0
    assert unchanged > 0
    assert unchanged + added == new["edge_rows"]
    # growing the corpus only ADDS triples (hub facts persist); removed
    # triples would indicate nondeterminism
    assert removed == 0

    # exact set check against pandas
    def keys(res):
        import pyarrow.dataset as pads

        t = pads.dataset(res["edges"], partitioning="hive").to_table()
        return {(s, p.lower(), o) for s, p, o in zip(
            t["subj_id"].to_pylist(), t["pred"].to_pylist(),
            t["obj_id"].to_pylist())}

    ko, kn = keys(old), keys(new)
    # materialize ONCE: each .to_pandas() re-executes the lazy join with a
    # nondeterministic output row order, so per-column executions scramble
    # the (s, p, o) tuples
    da = d["added"].to_pandas()
    got_added = {(s, p.lower(), o) for s, p, o in zip(
        da["subj_id"], da["pred"], da["obj_id"])}
    assert got_added == kn - ko


class TestPurgeCrashSafety:
    """The partition purge swap protocol: a complete copy of every part's
    data exists on disk at all times, and _recover_purge_swaps makes any
    kill window recoverable (ADVICE r2: the old rmtree-then-rewrite purge
    could silently lose a partition)."""

    def _make_part(self, out_dir, table="chunk_ents", part=0, n_files=3):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        pdir = os.path.join(out_dir, table, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        for i in range(n_files):
            t = pa.table({
                "url": [f"https://x/{i}/{j}" for j in range(4)],
                "payload": [f"row-{i}-{j}" for j in range(4)],
            })
            pq.write_table(t, os.path.join(pdir, f"f{i}.parquet"))
        return pdir

    def _rows(self, pdir):
        import pyarrow.dataset as pads

        return sorted(pads.dataset(pdir, format="parquet").to_table()
                      ["url"].to_pylist())

    @pytest.mark.usefixtures("ray_session")
    def test_purge_streams_files_and_filters(self, tmp_path):
        import ray

        from temporal_knowledge_graphs_ray.pipelines.kg import (
            _purge_urls_from_table,
        )

        out = str(tmp_path)
        pdir = self._make_part(out)
        victims = ["https://x/0/0", "https://x/2/3"]
        before = set(self._rows(pdir))
        _purge_urls_from_table(out, "chunk_ents", ray.put(victims), {0})
        after = set(self._rows(pdir))
        assert after == before - set(victims)

    def test_recovery_finishes_interrupted_swap(self, tmp_path):
        import os
        import shutil

        from temporal_knowledge_graphs_ray.pipelines.kg import (
            _recover_purge_swaps,
        )

        out = str(tmp_path)
        pdir = self._make_part(out, n_files=1)
        # simulate a kill between the two renames: the purged copy sits in
        # .purge_new, the live dir is gone
        new_dir = os.path.join(out, "chunk_ents", ".purge_new", "part=0")
        os.makedirs(os.path.dirname(new_dir), exist_ok=True)
        shutil.move(pdir, new_dir)
        assert not os.path.isdir(pdir)
        _recover_purge_swaps(out, "chunk_ents")
        assert os.path.isdir(pdir)
        assert len(self._rows(pdir)) == 4

    def test_recovery_discards_leftovers_when_live_present(self, tmp_path):
        import os
        import shutil

        from temporal_knowledge_graphs_ray.pipelines.kg import (
            _recover_purge_swaps,
        )

        out = str(tmp_path)
        pdir = self._make_part(out, n_files=2)
        # a kill BEFORE the swap leaves a parked copy while the live dir
        # is still authoritative — recovery must drop the parked one
        new_dir = os.path.join(out, "chunk_ents", ".purge_new", "part=0")
        os.makedirs(new_dir, exist_ok=True)
        shutil.copytree(pdir, new_dir, dirs_exist_ok=True)
        before = self._rows(pdir)
        _recover_purge_swaps(out, "chunk_ents")
        assert self._rows(pdir) == before
        assert not os.path.isdir(os.path.join(out, "chunk_ents",
                                              ".purge_new"))


@pytest.mark.usefixtures("ray_session")
def test_supersede_recovers_from_kill_between_table_purges(tmp_path):
    """A kill AFTER the chunk_ents purge but BEFORE the mentions purge used
    to be unrecoverable: the superseded urls were already gone from
    chunk_ents, so the next run's supersede-set join returned empty and the
    stale mentions/edges_raw rows persisted forever. The journal written
    before any purge makes the whole multi-table operation re-applicable."""
    from datetime import datetime

    import pandas.testing as pdt
    import pyarrow as pa
    import ray
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.functions.hashing import url_parts_vec
    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _purge_urls_from_table,
        _supersede_journal_path,
        _write_part_manifests,
        build_kg,
        ingest_increment_supersede,
        read_layout,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        PAGES_SCHEMA,
        alias_table,
        pages_table,
    )

    url = "https://x.example/recrawled"
    old = {"url": url, "warc_ts": datetime(2020, 1, 1),
           "html": b"<p>Alice Johnson founded Oldcorp Inc. in 2010.</p>",
           "text": "", "lang": "en"}
    new = {"url": url, "warc_ts": datetime(2022, 6, 1),
           "html": b"<p>Alice Johnson founded Newcorp Inc. in 2012.</p>",
           "text": "", "lang": "en"}

    base = pa.concat_tables([
        pages_table(list(range(50))),
        pa.Table.from_pylist([old], schema=PAGES_SCHEMA),
    ])
    inc = pa.concat_tables([
        pages_table(list(range(50, 60))),
        pa.Table.from_pylist([new], schema=PAGES_SCHEMA),
    ])
    union_latest = pa.concat_tables([
        pages_table(list(range(60))),
        pa.Table.from_pylist([new], schema=PAGES_SCHEMA),
    ])

    inc_dir = str(tmp_path / "inc")
    build_kg(rd.from_arrow(base), inc_dir, alias_table=alias_table())

    # --- simulate the crash window: journal written, chunk_ents purged,
    # then the process dies before the mentions purge ---
    import json
    import os

    journal = _supersede_journal_path(inc_dir)
    os.makedirs(os.path.dirname(journal), exist_ok=True)
    with open(journal, "w") as f:
        json.dump({"urls": [url]}, f)
    nparts = read_layout(inc_dir)
    parts = set(url_parts_vec([url], nparts).tolist())
    _purge_urls_from_table(inc_dir, "chunk_ents", ray.put([url]), parts)
    _write_part_manifests(inc_dir, "chunk_ents")
    # (killed here: mentions still hold the OLD crawl's rows)

    # --- the next supersede run must recover via the journal ---
    r2 = ingest_increment_supersede(rd.from_arrow(inc), inc_dir,
                                    alias_table=alias_table())
    fresh = build_kg(rd.from_arrow(union_latest), str(tmp_path / "fresh"),
                     alias_table=alias_table())

    ie, inn = _graph_key(r2)
    fe, fn = _graph_key(fresh)
    pdt.assert_frame_equal(ie, fe)
    pdt.assert_frame_equal(inn, fn)
    names = set(inn["name"])
    assert not any("Oldcorp" in n for n in names)
    assert any("Newcorp" in n for n in names)
    assert not os.path.exists(journal)


@pytest.mark.usefixtures("ray_session")
def test_killed_increment_recovers_from_journal(tmp_path):
    """A kill mid-increment can land a url's rows in SOME checkpoint
    tables only (chunk_ents is appended on a background thread,
    mentions/edges_raw synchronously). The increment journal written
    before the appends must make the retry whole: the journaled urls are
    purged and re-ingested, and the final graph is bit-identical to a
    fresh union build. Covers BOTH half-landed orders."""
    import shutil as _sh

    import pandas.testing as pdt
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _increment_journal_path,
        _write_url_journal,
        build_kg,
        ingest_increment,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    fresh = build_kg(rd.from_arrow(pages_table(list(range(60)))),
                     str(tmp_path / "fresh"), alias_table=alias_table())
    fe, fn = _graph_key(fresh)

    def half_landed(tables_with_rows):
        """Store with pages 0..29 complete and pages 30..59 landed ONLY
        in ``tables_with_rows`` (+ the increment journal)."""
        out = str(tmp_path / ("kg_" + "_".join(tables_with_rows)))
        build_kg(rd.from_arrow(pages_table(list(range(30)))), out,
                 alias_table=alias_table())
        # a scratch full build of the increment provides realistic rows
        scratch = str(tmp_path / ("scratch_" + "_".join(tables_with_rows)))
        build_kg(rd.from_arrow(pages_table(list(range(30, 60)))), scratch,
                 alias_table=alias_table())
        import os as _os
        for table in tables_with_rows:
            sdir = _os.path.join(scratch, table)
            for entry in _os.listdir(sdir):
                if not entry.startswith("part="):
                    continue
                dst = _os.path.join(out, table, entry)
                _os.makedirs(dst, exist_ok=True)
                for i, name in enumerate(sorted(_os.listdir(
                        _os.path.join(sdir, entry)))):
                    _sh.copy(_os.path.join(sdir, entry, name),
                             _os.path.join(dst, f"halfland-{i}.parquet"))
        urls = pages_table(list(range(30, 60)))["url"].to_pylist()
        _write_url_journal(_increment_journal_path(out), urls)
        _sh.rmtree(scratch)
        return out

    for landed in (["chunk_ents"], ["mentions", "edges_raw"]):
        out = half_landed(landed)
        res = ingest_increment(
            rd.from_arrow(pages_table(list(range(30, 60)))), out,
            alias_table=alias_table())
        ie, inn = _graph_key(res)
        pdt.assert_frame_equal(fe, ie)
        pdt.assert_frame_equal(fn, inn)


@pytest.mark.usefixtures("ray_session")
def test_killed_purge_manifests_survive_plain_increment(tmp_path):
    """A killed supersede purge deletes part manifests that only the
    journal re-apply restores. Entering via PLAIN ingest_increment (not
    the supersede entry) must re-apply the journal before the orphan
    cleanup, or the cleanup would rmtree complete-but-manifest-less
    partitions (permanent data loss)."""
    import json
    import os as _os

    import pandas.testing as pdt
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _supersede_journal_path,
        build_kg,
        ingest_increment,
        ingest_increment_supersede,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    # expected end state: proper supersede of nothing + increment 60..79
    want_dir = str(tmp_path / "want")
    build_kg(rd.from_arrow(pages_table(list(range(60)))), want_dir,
             alias_table=alias_table())
    ingest_increment(rd.from_arrow(pages_table(list(range(60, 80)))),
                     want_dir, alias_table=alias_table())
    we, wn = _graph_key({
        "edges": _os.path.join(want_dir, "edges"),
        "nodes": _os.path.join(want_dir, "nodes")})

    # damaged store: same base, a pending (empty-effect) supersede journal
    # whose kill window also removed two part manifests
    out = str(tmp_path / "damaged")
    build_kg(rd.from_arrow(pages_table(list(range(60)))), out,
             alias_table=alias_table())
    urls = pages_table([0, 1])["url"].to_pylist()
    # recovery will purge the journaled urls' rows (purged rows stay
    # purged — that is the supersede semantics), so the increment below
    # re-submits those two pages to restore them; the end state is then
    # comparable to the clean store
    with open(_supersede_journal_path(out), "w") as f:
        json.dump({"urls": urls}, f)
    # the kill window: purge deleted these manifests before rewriting
    for part in (0, 1, 2):
        for table in ("chunk_ents", "mentions"):
            mp = _os.path.join(out, "_manifests",
                               f"{table}-part-{part}.json")
            if _os.path.exists(mp):
                _os.remove(mp)

    # plain increment: re-ingests the journaled urls (purged by recovery)
    # plus the new pages; must end bit-identical to the clean store
    ingest_increment(
        rd.from_arrow(pages_table([0, 1] + list(range(60, 80)))), out,
        alias_table=alias_table())
    ge, gn = _graph_key({"edges": _os.path.join(out, "edges"),
                         "nodes": _os.path.join(out, "nodes")})
    pdt.assert_frame_equal(we, ge)
    pdt.assert_frame_equal(wn, gn)
