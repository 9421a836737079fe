"""Q6 scale backend: inverted-index fulltext equals a word-level scan."""

from __future__ import annotations

import re

import pytest


def _word_scan(df, terms, k):
    """Driver-side word-tokenized reference scan."""
    tok = re.compile(r"[a-z0-9]+")
    want = {t.lower() for t in terms}
    rows = []
    for cid, text in zip(df["chunk_id"], df["text"]):
        n = len(want & set(tok.findall(text.lower())))
        if n:
            rows.append((cid, n))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.mark.usefixtures("ray_session")
def test_index_matches_word_scan_and_saveload(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.stages.fulltext import FulltextIndex

    res = build_kg(rd.from_arrow(pages_table(list(range(60)))),
                   str(tmp_path / "kg"), alias_table=alias_table())
    chunks = rd.read_parquet(res["chunk_ents"],
                             columns=["chunk_id", "text"])
    df = chunks.to_pandas()

    idx = FulltextIndex(chunks)
    for terms in (["acquired", "revenue", "founded"],
                  ["berlin", "reported"],
                  ["nonexistentterm"]):
        got = [(r.chunk_id, r.n_terms)
               for r in idx.search(terms, k=15).itertuples()]
        assert got == _word_scan(df, terms, 15), terms

    idx.save(str(tmp_path / "ft_index"))
    loaded = FulltextIndex.load(str(tmp_path / "ft_index"))
    a = idx.search(["acquired", "revenue"], k=10)
    b = loaded.search(["acquired", "revenue"], k=10)
    assert a.values.tolist() == b.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_save_load_roundtrip_persists_bucket_count(tmp_path):
    """load() must recover the num_buckets the index was HASHED with —
    pruning with a different modulus silently drops matches."""
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.fulltext import FulltextIndex

    chunks = pa.table({
        "chunk_id": pa.array([f"c{i}" for i in range(20)], pa.string()),
        "text": [f"alpha beta gamma{i} delta" for i in range(20)],
    })
    idx = FulltextIndex(rd.from_arrow(chunks), num_buckets=128)
    p = str(tmp_path / "ft")
    idx.save(p)
    loaded = FulltextIndex.load(p)  # no num_buckets passed
    assert loaded.num_buckets == 128
    hits = loaded.search(["alpha", "delta"], k=5)
    assert len(hits) == 5 and set(hits["n_terms"]) == {2}


@pytest.mark.usefixtures("ray_session")
def test_null_text_rows_are_skipped():
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.fulltext import FulltextIndex

    chunks = pa.table({
        "chunk_id": pa.array(["a", "b", "c"], pa.string()),
        "text": pa.array(["find me here", None, ""], pa.large_string()),
    })
    idx = FulltextIndex(rd.from_arrow(chunks))
    hits = idx.search(["find"], k=5)
    assert list(hits["chunk_id"]) == ["a"]
