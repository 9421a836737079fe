"""Text normalization: byte-exact parity with the DuckDB expression
chain nfc_normalize -> regexp_replace(control) -> regexp_replace(ws)
-> trim, on planted unicode/control/whitespace edge cases and the
documents table; NULL propagates."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from temporal_knowledge_graphs_ray.stages.textnorm import (
    CONTROL_RE,
    WS_RE,
    normalize_text_kernel,
)

EDGES = [
    "éclair et café",          # NFD vs NFC composed forms
    "a\x00b\x01c\x7fd",                   # C0 controls + DEL
    "  lots\t\tof\n\n whitespace \r\n ",  # collapse + trim
    "Å vs Å",                   # angstrom sign -> A-ring (NFC)
    "",                                   # empty survives
    None,                                 # NULL propagates
    "already clean",
    "tab\x0bvertical\x0cfeed",            # \v \f are WHITESPACE here
]


def _oracle(path: str) -> list:
    return [r[0] for r in duckdb.sql(f"""
        SELECT CASE WHEN text IS NULL THEN NULL ELSE
          trim(regexp_replace(regexp_replace(nfc_normalize(text),
               '{CONTROL_RE}', '', 'g'), '{WS_RE}', ' ', 'g'), ' ')
        END
        FROM read_parquet('{path}') ORDER BY i
    """).fetchall()]


def test_kernel_matches_duckdb_on_edges(tmp_path):
    p = str(tmp_path / "edges.parquet")
    pq.write_table(pa.table({"i": list(range(len(EDGES))),
                             "text": EDGES}), p)
    got = normalize_text_kernel(pa.array(EDGES)).to_pylist()
    assert got == _oracle(p)
    # spot semantics: NFC composed, controls gone, ws collapsed
    assert got[0] == "éclair et café"
    assert got[1] == "abcd"
    assert got[2] == "lots of whitespace"
    assert got[3] == "Å vs Å"
    assert got[5] is None


@pytest.mark.usefixtures("ray_session")
def test_stage_over_documents_matches_duckdb():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.textnorm import (
        normalize_text_stage,
    )

    sf = "/root/testdata/sf0.001/documents.parquet"
    out = normalize_text_stage(
        rd.read_parquet(sf, columns=["doc_id", "text"]),
        out_col="norm").to_pandas().sort_values("doc_id",
                                                ignore_index=True)
    want = duckdb.sql(f"""
        SELECT trim(regexp_replace(regexp_replace(nfc_normalize(text),
               '{CONTROL_RE}', '', 'g'), '{WS_RE}', ' ', 'g'), ' ') AS n
        FROM read_parquet('{sf}') ORDER BY doc_id
    """).df()["n"].tolist()
    assert out["norm"].tolist() == want
    assert "text" in out.columns  # out_col appends, original kept


@pytest.mark.usefixtures("ray_session")
def test_in_place_replacement():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.textnorm import (
        normalize_text_stage,
    )

    ds = rd.from_items([{"text": "  a\tb  "}])
    out = normalize_text_stage(ds).to_pandas()
    assert list(out.columns) == ["text"]
    assert out["text"][0] == "a b"
