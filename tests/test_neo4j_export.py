"""Neo4j bulk-import bridge: the exported CSVs must parse back (with
the emitted headers) to exactly the store's node/edge rows, with
neo4j-admin conventions (ID spaces, :TYPE sanitization, ';' arrays,
ISO datetimes, quoted cells)."""

from __future__ import annotations

import datetime as dt
import glob
import io
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from temporal_knowledge_graphs_ray.pipelines.neo4j_export import (
    export_neo4j_csv,
    rel_type_of,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _store(tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(f"{store}/nodes")
    os.makedirs(f"{store}/edges")
    pq.write_table(pa.table({
        "entity_id": pa.array(["e1", "e2", "e3"], pa.string()),
        "name": pa.array(['Acme, "Inc"', "Bob", "C;D"], pa.string()),
        "type": pa.array(["ORGANIZATION", "PERSON", "OTHER"],
                         pa.string()),
        "first_seen": pa.array([TS] * 3, pa.timestamp("us")),
        "last_seen": pa.array([TS] * 3, pa.timestamp("us")),
        "mention_count": pa.array([5, 1, None], pa.int64()),
        "aliases": pa.array([["ACME", "Acme;Corp"], [], None],
                            pa.list_(pa.string())),
    }), f"{store}/nodes/part0.parquet")
    pq.write_table(pa.table({
        "subj": pa.array(["Acme", "Bob"], pa.string()),
        "subj_id": pa.array(["e1", "e2"], pa.string()),
        "pred": pa.array(["works for", None], pa.string()),
        "obj": pa.array(["Bob", "C;D"], pa.string()),
        "obj_id": pa.array(["e2", "e3"], pa.string()),
        "valid_from": pa.array([TS, None], pa.timestamp("us")),
        "valid_to": pa.array([None, None], pa.timestamp("us")),
        "description": pa.array(["rel, desc\nline two", None],
                                pa.large_string()),
        "confidence": pa.array([0.9, None], pa.float32()),
        "source_chunks": pa.array([["c1", "c2"], None],
                                  pa.list_(pa.string())),
    }), f"{store}/edges/part0.parquet")
    return store


def _read_with_header(out_dir, name):
    header = open(f"{out_dir}/{name}_header.csv").read().strip()
    sub = "entities" if name == "entities" else "relationships"
    rows = "".join(open(p).read()
                   for p in sorted(glob.glob(f"{out_dir}/{sub}/part-*.csv")))
    return pd.read_csv(io.StringIO(header + "\n" + rows),
                       keep_default_na=False)


@pytest.mark.usefixtures("ray_session")
def test_empty_store_still_emits_runnable_layout(tmp_path):
    """A valid-but-empty graph must still produce the entities/ and
    relationships/ dirs with at least one part file each, so the
    emitted import.sh's unconditional glob references resolve
    (ADVICE r4: neo4j_export.py)."""
    store = str(tmp_path / "store")
    os.makedirs(f"{store}/nodes")
    os.makedirs(f"{store}/edges")
    empty_nodes = pa.table({
        "entity_id": pa.array([], pa.string()),
        "name": pa.array([], pa.string()),
        "type": pa.array([], pa.string()),
        "first_seen": pa.array([], pa.timestamp("us")),
        "last_seen": pa.array([], pa.timestamp("us")),
        "mention_count": pa.array([], pa.int64()),
        "aliases": pa.array([], pa.list_(pa.string()))})
    empty_edges = pa.table({
        "subj": pa.array([], pa.string()),
        "subj_id": pa.array([], pa.string()),
        "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string()),
        "obj_id": pa.array([], pa.string()),
        "valid_from": pa.array([], pa.timestamp("us")),
        "valid_to": pa.array([], pa.timestamp("us")),
        "description": pa.array([], pa.large_string()),
        "confidence": pa.array([], pa.float32()),
        "source_chunks": pa.array([], pa.list_(pa.string()))})
    pq.write_table(empty_nodes, f"{store}/nodes/part0.parquet")
    pq.write_table(empty_edges, f"{store}/edges/part0.parquet")
    out = str(tmp_path / "csv")
    rep = export_neo4j_csv(store, out)
    assert rep["entities"] == 0 and rep["relationships"] == 0
    assert glob.glob(f"{out}/entities/part-*.csv")
    assert glob.glob(f"{out}/relationships/part-*.csv")
    assert os.path.exists(f"{out}/import.sh")


def test_rel_type_sanitization():
    assert rel_type_of("works for") == "WORKS_FOR"
    assert rel_type_of("né à/chez") == "N_CHEZ"
    assert rel_type_of(None) == "RELATED_TO"
    assert rel_type_of("  ") == "RELATED_TO"


@pytest.mark.usefixtures("ray_session")
def test_export_round_trips(tmp_path):
    store = _store(tmp_path)
    out = str(tmp_path / "csv")
    rep = export_neo4j_csv(store, out)
    assert rep["entities"] == 3 and rep["relationships"] == 2

    ents = (_read_with_header(out, "entities")
            .sort_values("id:ID(Entity)", ignore_index=True))
    assert list(ents["id:ID(Entity)"]) == ["e1", "e2", "e3"]
    assert ents.loc[0, "name"] == 'Acme, "Inc"'
    # ';' inside an array VALUE is replaced by ',' (documented edge);
    # array elements join with ';'
    assert ents.loc[0, "aliases:string[]"] == "ACME;Acme,Corp"
    assert ents.loc[0, "first_seen:datetime"] == "2024-03-01T12:00:00"
    assert (ents[":LABEL"] == "Entity").all()
    assert str(ents.loc[2, "mention_count:long"]) == "0"  # null -> 0

    rels = (_read_with_header(out, "relationships")
            .sort_values(":START_ID(Entity)", ignore_index=True))
    assert list(rels[":TYPE"]) == ["WORKS_FOR", "RELATED_TO"]
    # newline survives inside the quoted cell (import.sh passes
    # --multiline-fields=true so neo4j-admin accepts it)
    assert rels.loc[0, "description"] == "rel, desc\nline two"
    assert rels.loc[0, "source_chunks:string[]"] == "c1;c2"
    assert rels.loc[1, "valid_from:datetime"] == ""

    # import.sh mentions both header files
    sh = open(f"{out}/import.sh").read()
    assert "entities_header.csv" in sh and "neo4j-admin" in sh
    assert "--multiline-fields=true" in sh

    # deterministic re-run: same files, same contents (capture BEFORE
    # the rerun so a stale-part regression would actually fail)
    before = _read_with_header(out, "entities")
    parts_before = sorted(os.path.basename(p) for p in
                          glob.glob(f"{out}/entities/part-*.csv"))
    rep2 = export_neo4j_csv(store, out)
    assert rep2 == rep
    parts_after = sorted(os.path.basename(p) for p in
                         glob.glob(f"{out}/entities/part-*.csv"))
    assert parts_before == parts_after
    assert before.equals(_read_with_header(out, "entities"))


@pytest.mark.usefixtures("ray_session")
def test_real_store_exports(tmp_path):
    """A store built by the REAL kg pipeline exports: every node/edge
    row lands in the CSVs and edge types are all legal."""
    import re

    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_from_documents,
    )

    store = str(tmp_path / "kg")
    build_kg(pages_from_documents("/root/testdata/sf0.001"), store,
             alias_table=alias_table())
    out = str(tmp_path / "csv")
    rep = export_neo4j_csv(store, out)
    assert rep["entities"] == rd.read_parquet(f"{store}/nodes").count()
    assert rep["relationships"] == \
        rd.read_parquet(f"{store}/edges").count()
    rels = _read_with_header(out, "relationships")
    legal = re.compile(r"^[A-Z0-9_]+$")
    assert rels[":TYPE"].map(lambda t: bool(legal.match(t))).all()
    ents = _read_with_header(out, "entities")
    assert ents["id:ID(Entity)"].is_unique


def test_csv_cell_round_trip_property():
    """Adversarial cell values (quotes, commas, newlines, unicode)
    must survive the render -> csv.reader round trip byte-exact —
    the quoting contract the whole exporter rests on. (csv.reader,
    not pandas: the C parser's CR handling inside quoted fields is
    position-dependent and makes a flaky oracle.)"""
    import csv

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from temporal_knowledge_graphs_ray.pipelines.neo4j_export import (
        _csv_cell,
    )

    alphabet = st.sampled_from(list(
        'abcXYZ012 ,;"\'\n\r\t—é€'))

    @given(st.lists(st.text(alphabet=alphabet, max_size=40),
                    min_size=1, max_size=5))
    @settings(max_examples=500, deadline=None)
    def run(cells):
        line = ",".join(_csv_cell(c) for c in cells)
        rows = list(csv.reader(io.StringIO(line, newline="")))
        # a trailing bare newline in the LAST cell ends the record;
        # unquoted-empty trailing cells still count
        got = rows[0] if rows else [""]
        got += [""] * (len(cells) - len(got))
        assert got == cells

    run()
