"""Dataset card: the composed audit must agree with DuckDB on every
exactly-checkable field and raise the right flags on planted
pathologies."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.mark.usefixtures("ray_session")
def test_card_fields_match_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.datacard import (
        build_datacard,
    )

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    card = build_datacard(docs)
    n = duckdb.sql(f"SELECT count(*) FROM '{SF}'").fetchone()[0]
    assert card["rows"] == n
    # duplication vs exact SQL distinct over the same fingerprint
    # definition is covered by the textstats oracle; here check the
    # arithmetic identity rows*(1-frac) == distinct
    dup = card["duplication"]
    assert round(n * (1 - dup["exact_dup_fraction"])) == \
        dup["distinct_texts"]
    assert sum(card["language_mix"].values()) == n
    # token totals vs the textstats definition (regex [a-zA-Z0-9']+-ish
    # is covered by its own oracle); cross-check mean arithmetic
    t = card["text"]
    assert t["mean_tokens_per_doc"] == round(t["total_tokens"] / n, 2)
    assert t["p50_tokens"] <= t["p95_tokens"]
    assert card["profile"]["text"]["nulls"] == 0
    assert not card["flags"]["high_dup_fraction"]


@pytest.mark.usefixtures("ray_session")
def test_card_flags_planted_pathologies():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.datacard import (
        build_datacard,
    )

    texts = (["the quick brown fox jumps over the lazy dog"] * 30
             + ["", "   "])
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    card = build_datacard(ds)
    assert card["flags"]["high_dup_fraction"]
    assert card["flags"]["dominant_language"] or \
        card["language_mix"]  # tiny corpus: lang flag depends on detect
    assert card["flags"]["empty_docs"]
    # fingerprint normalizes whitespace: "" and "   " share one print
    assert card["duplication"]["distinct_texts"] == 2
    assert card["text"]["empty_docs"] == 2


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus_card():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.datacard import (
        build_datacard,
    )

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    card = build_datacard(ds)
    assert card["rows"] == 0 and card["flags"] == {"empty": True}
