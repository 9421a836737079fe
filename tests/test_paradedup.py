"""Paragraph-level exact dedup (stages/paradedup.py) — CCNet-style
first-occurrence keep + document reassembly, vs an exact DuckDB
oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from temporal_knowledge_graphs_ray.stages.paradedup import (
    dedup_paragraphs,
    paragraph_dedup_sql,
    split_paragraphs,
)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _oracle(rows, **kw):
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con.execute(paragraph_dedup_sql("docs", **kw)).fetch_df()


def _run(ds, **kw):
    out = dedup_paragraphs(ds, **kw).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


@pytest.mark.usefixtures("ray_session")
def test_explode_positions_and_roundtrip():
    ds = _docs([(1, "a\nb\nc"), (2, ""), (3, "x")])
    p = split_paragraphs(ds).to_pandas().sort_values(
        ["doc_id", "para_idx"], ignore_index=True)
    assert p.values.tolist() == [
        [1, 0, "a"], [1, 1, "b"], [1, 2, "c"], [2, 0, ""], [3, 0, "x"]]


@pytest.mark.usefixtures("ray_session")
def test_first_occurrence_keep_and_reassembly():
    rows = [
        (1, "intro\nSHARED BOILERPLATE\nbody one"),
        (2, "SHARED BOILERPLATE\nbody two"),
        (3, "SHARED BOILERPLATE"),  # loses everything -> doc drops
    ]
    got = _run(_docs(rows))
    want = _oracle(rows)
    assert got.values.tolist() == want.values.tolist()
    # the duplicate paragraph survived only in doc 1 (smallest key)
    assert got.loc[got.doc_id == 1, "text"].item() == \
        "intro\nSHARED BOILERPLATE\nbody one"
    assert got.loc[got.doc_id == 2, "text"].item() == "body two"
    assert 3 not in set(got.doc_id)


@pytest.mark.usefixtures("ray_session")
def test_null_text_docs_drop():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a\nb", None, "c"], pa.string()),
    }))
    got = _run(ds)
    assert got.values.tolist() == [[1, "a\nb"], [3, "c"]]


@pytest.mark.usefixtures("ray_session")
def test_min_chars_exemption_keeps_short_paragraphs():
    rows = [(1, "a\n\nkeep\n\na"), (2, "a\nother")]
    # min_chars=2: "a" and "" are exempt everywhere; only >=2-char
    # paragraphs dedup
    got = _run(_docs(rows), min_chars=2)
    want = _oracle(rows, min_chars=2)
    assert got.values.tolist() == want.values.tolist()
    assert got.loc[got.doc_id == 1, "text"].item() == "a\n\nkeep\n\na"
    assert got.loc[got.doc_id == 2, "text"].item() == "a\nother"


@pytest.mark.usefixtures("ray_session")
def test_duckdb_parity_on_testdata_and_layout_invariance():
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    rows = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    # the synthetic corpus has no newlines: paragraph = ' the '-separated
    # segment (delimiter choice is a fixture knob, semantics identical)
    kw = dict(sep=" the ", min_chars=1)
    want = _oracle(rows, **kw)
    a = _run(rd.from_arrow(tbl), **kw)
    b = _run(rd.from_arrow(tbl).repartition(7), **kw)
    assert a.values.tolist() == want.values.tolist()
    assert b.values.tolist() == want.values.tolist()
    # non-vacuous: the tiny vocabulary repeats segments across docs
    full = pd.DataFrame(rows, columns=["doc_id", "text"])
    assert a["text"].str.len().sum() < full["text"].str.len().sum()


@pytest.mark.usefixtures("ray_session")
def test_all_null_batch_drops_not_crashes():
    # regression: a batch whose text values are ALL null used to crash
    # split_paragraphs (np.repeat shape mismatch on empty counts);
    # null-text docs must simply drop, per the adjacent comment.
    ds = _docs([(1, None), (2, None)])
    exploded = split_paragraphs(ds)
    assert exploded.schema().names == ["doc_id", "para_idx", "para"]
    assert exploded.count() == 0
    out = dedup_paragraphs(ds).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_mixed_null_batch_keeps_valid_docs():
    ds = _docs([(1, None), (2, "a\nb"), (3, None), (4, "a\nc")])
    out = _run(ds)
    assert list(out["doc_id"]) == [2, 4]
    assert list(out["text"]) == ["a\nb", "c"]
