"""PII redaction: pipeline output must equal DuckDB's chained
regexp_replace / regexp_extract_all oracle EXACTLY (same regex subset,
same application order)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

PLANTED = [
    "Contact john.doe+spam@example.co.uk or call (555) 123-4567 today.",
    "Card 4111 1111 1111 1111 expires soon; backup 4111-1111-1111-1111.",
    "SSN 123-45-6789 leaked from host 192.168.1.254 (10.0.0.1 internal).",
    "Intl +1-800-555-0199 and bare 800.555.0199 both match; 12345 not.",
    "No pii here, just text with numbers 123 and 45.67 and a dot.",
    "edge@x.io",
    "",
    "digits 4555-123-4567 embed a phone-shaped tail",
    "ip-ish 999.999.999.999 and version 1.2.3 (three octets, no match)",
    "mixed: a@b.cc then 111-22-3333 then 4000 1234 5678 9010 then 1.1.1.1",
]


def _docs_df():
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    planted = pd.DataFrame({
        "doc_id": [100000 + i for i in range(len(PLANTED))],
        "text": PLANTED,
    })
    return pd.concat([docs, planted], ignore_index=True)


@pytest.mark.usefixtures("ray_session")
def test_pii_redaction_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.functions.pii import (
        PII_TYPES, pii_count_sql, pii_redact_sql,
    )
    from temporal_knowledge_graphs_ray.stages.pii import pii_stage

    df = _docs_df()
    got = (pii_stage(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id", ignore_index=True))

    con = duckdb.connect()
    con.register("docs", df)
    count_cols = ", ".join(
        f"{pii_count_sql('text', n)} AS pii_{n}" for n in PII_TYPES)
    want = con.execute(
        f"SELECT doc_id, {count_cols}, "
        f"{pii_redact_sql('text')} AS text_redacted "
        f"FROM docs ORDER BY doc_id"
    ).df()

    assert list(got["doc_id"]) == list(want["doc_id"])
    for n in PII_TYPES:
        assert list(got[f"pii_{n}"]) == list(want[f"pii_{n}"]), n
    assert list(got["text_redacted"]) == list(want["text_redacted"])
    # the planted rows actually exercised every pattern
    planted = got[got["doc_id"] >= 100000]
    for n in PII_TYPES:
        assert planted[f"pii_{n}"].sum() > 0, f"no planted match for {n}"


@pytest.mark.usefixtures("ray_session")
def test_pii_redaction_counts_and_null_text():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.pii import pii_stage

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a@b.cc and c@d.ee", None, "clean"],
    })
    got = (pii_stage(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert got.loc[0, "pii_email"] == 2
    assert got.loc[0, "pii_redactions"] == 2
    assert got.loc[0, "text_redacted"] == "<EMAIL> and <EMAIL>"
    assert got.loc[1, "text_redacted"] == ""  # null -> treated as empty
    assert got.loc[2, "text_redacted"] == "clean"
    assert int(got["pii_redactions"].sum()) == 2
