"""Tests: ECT-QA JSONL source (S6/S7/S8) + temporal filter compile (M11)."""

from __future__ import annotations

import json
from datetime import datetime

import pandas as pd
import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.functions.temporal_filter import (
    TemporalFilter,
    TemporalQueryType,
)
from temporal_knowledge_graphs_ray.sources.ectqa import (
    ectqa_stats,
    parse_quarter_date,
    parse_record,
    read_ectqa,
)

RECORDS = [
    {"company_name": "Crocs, Inc.", "stock_code": "CROX",
     "sector": "consumer_discretionary", "year": "2020", "quarter": "q1",
     "URL": "https://example.com/crox", "raw_content": "raw text",
     "cleaned_content": "clean text one. And two.", "token_count": 6},
    {"company_name": "Skechers", "stock_code": "SKX",
     "sector": "consumer_discretionary", "year": "2021", "quarter": "q4",
     "URL": "https://example.com/skx", "raw_content": "raw",
     "cleaned_content": "skx transcript.", "token_count": 2},
    {"company_name": "Other Corp", "stock_code": "OTH",
     "sector": "tech", "year": "2020", "quarter": "q2",
     "cleaned_content": "other words here.", "token_count": 3},
    # empty-content record -> must be skipped (ectqa_loader.py:163-164)
    {"company_name": "Empty Co", "stock_code": "EMP", "sector": "tech",
     "year": "2022", "quarter": "q1", "cleaned_content": ""},
]


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ectqa") / "records.jsonl"
    lines = [json.dumps(r) for r in RECORDS]
    lines.insert(2, "{this is not json")  # malformed line -> skipped
    lines.insert(3, "")  # blank line -> skipped
    p.write_text("\n".join(lines))
    return str(p)


class TestEctqa:
    def test_parse_record_title_and_date(self):
        doc = parse_record(RECORDS[0])
        assert doc["title"] == "Crocs, Inc. (CROX) - Q1 2020 Earnings Call"
        assert doc["created_at"] == datetime(2020, 3, 31)
        assert doc["text"] == "clean text one. And two."

    def test_raw_content_variant(self):
        doc = parse_record(RECORDS[0], use_cleaned_content=False)
        assert doc["text"] == "raw text"

    def test_quarter_dates(self):
        assert parse_quarter_date("2021", "q2") == datetime(2021, 6, 30)
        assert parse_quarter_date("2021", "Q4") == datetime(2021, 12, 31)
        assert parse_quarter_date("bad", "q1") == datetime(1970, 1, 1)

    def test_read_skips_malformed_and_empty(self, ray_session, jsonl_path):
        rows = read_ectqa(jsonl_path).take_all()
        assert len(rows) == 3  # 4 valid records minus the empty-content one
        assert {r["stock_code"] for r in rows} == {"CROX", "SKX", "OTH"}

    def test_filters_and_limit(self, ray_session, jsonl_path):
        rows = read_ectqa(jsonl_path,
                          filter_sector="consumer_discretionary").take_all()
        assert {r["stock_code"] for r in rows} == {"CROX", "SKX"}
        rows = read_ectqa(jsonl_path, filter_stock_code="skx").take_all()
        assert [r["stock_code"] for r in rows] == ["SKX"]
        rows = read_ectqa(jsonl_path, filter_year="2020",
                          filter_quarter="q2").take_all()
        assert [r["stock_code"] for r in rows] == ["OTH"]
        assert len(read_ectqa(jsonl_path, limit=2).take_all()) == 2

    def test_stats(self, ray_session, jsonl_path):
        stats = ectqa_stats(read_ectqa(jsonl_path))
        assert stats["total_documents"] == 3
        assert stats["by_sector"]["consumer_discretionary"] == 2
        assert stats["distinct_companies"] == 3
        assert stats["total_tokens"] == 11


def _versions_table() -> pa.Table:
    return pa.Table.from_pandas(pd.DataFrame({
        "chunk_id": ["a", "b", "c", "d", "e"],
        "fiscal_year": [2020, 2020, 2021, 2021, 2022],
        "fiscal_quarter": ["Q1", "Q3", "Q2", "Q4", "Q1"],
        "is_current": [True, False, True, True, False],
    }), preserve_index=False)


class TestTemporalFilter:
    def test_latest(self):
        t = _versions_table()
        out = t.filter(TemporalFilter.latest().to_arrow_expression())
        assert out["chunk_id"].to_pylist() == ["a", "c", "d"]

    def test_point_in_time(self):
        t = _versions_table()
        f = TemporalFilter.point_in_time(2021, "Q2")
        assert t.filter(f.to_arrow_expression())["chunk_id"].to_pylist() == ["c"]

    def test_point_in_time_include_superseded(self):
        t = _versions_table()
        f = TemporalFilter.point_in_time(2020)
        f.include_superseded = True
        assert t.filter(f.to_arrow_expression())["chunk_id"].to_pylist() == ["a", "b"]

    def test_time_range_multi_year_ignores_quarters(self):
        # the reference applies quarter bounds only when start==end year
        # (temporal.py:179-183) — replicated
        t = _versions_table()
        f = TemporalFilter.time_range(2020, 2021, "Q2", "Q3")
        f.include_superseded = True
        assert t.filter(f.to_arrow_expression())["chunk_id"].to_pylist() == \
            ["a", "b", "c", "d"]

    def test_time_range_single_year_quarters(self):
        t = _versions_table()
        f = TemporalFilter.time_range(2021, 2021, "Q3", "Q4")
        assert t.filter(f.to_arrow_expression())["chunk_id"].to_pylist() == ["d"]

    def test_history_no_filter(self):
        assert TemporalFilter.history().to_arrow_expression() is None

    def test_datetime_conversion(self):
        f = TemporalFilter(query_type=TemporalQueryType.POINT_IN_TIME,
                           timestamp=datetime(2021, 5, 14))
        t = _versions_table()
        assert t.filter(f.to_arrow_expression())["chunk_id"].to_pylist() == ["c"]

    def test_apply_on_dataset(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_versions_table())
        out = TemporalFilter.latest().apply(ds).to_pandas()
        assert sorted(out["chunk_id"]) == ["a", "c", "d"]
