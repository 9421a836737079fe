"""Tests for the M13/M14 query-parsing fallbacks."""

from __future__ import annotations

from datetime import datetime

from temporal_knowledge_graphs_ray.functions.query_parsing import (
    TemporalContext,
    extract_query_entities,
    parse_temporal_query,
)
from temporal_knowledge_graphs_ray.functions.temporal_filter import (
    TemporalQueryType,
)


class TestTemporalParse:
    def test_no_temporal_reference(self):
        ctx = parse_temporal_query("Tell me about Acme")
        assert ctx.has_temporal_reference is False
        assert ctx.temporal_filter is None

    def test_latest(self):
        ctx = parse_temporal_query("What is the latest revenue?")
        assert ctx.temporal_filter.query_type == TemporalQueryType.LATEST

    def test_history(self):
        ctx = parse_temporal_query("How did margins change over time?")
        assert ctx.temporal_filter.query_type == TemporalQueryType.HISTORY

    def test_single_year_point(self):
        ctx = parse_temporal_query("Revenue during 2021?")
        f = ctx.temporal_filter
        assert f.query_type == TemporalQueryType.POINT_IN_TIME
        assert f.timestamp == datetime(2021, 12, 31, 23, 59, 59)

    def test_two_years_range(self):
        ctx = parse_temporal_query("Sales from 2019 to 2022")
        f = ctx.temporal_filter
        assert f.query_type == TemporalQueryType.TIME_RANGE
        assert f.start_time == datetime(2019, 1, 1)
        assert f.end_time == datetime(2022, 12, 31, 23, 59, 59)

    def test_latest_wins_over_years(self):
        ctx = parse_temporal_query("current state in 2020")
        assert ctx.temporal_filter.query_type == TemporalQueryType.LATEST

    def test_keywords_collected(self):
        ctx = parse_temporal_query("between 2019 and 2020, during the year")
        assert "between" in ctx.temporal_keywords
        assert isinstance(ctx, TemporalContext)


class TestQueryEntities:
    def test_extracts_and_filters_question_words(self):
        out = extract_query_entities(
            "What did Acme Inc and Open AI announce to Bob Smith?")
        assert "What" not in out
        assert "Acme Inc" in out or "Acme" in out
        assert "Bob Smith" in out

    def test_dedup_preserves_order(self):
        out = extract_query_entities("Acme met Acme and Berlin")
        assert out == ["Acme", "Berlin"]
