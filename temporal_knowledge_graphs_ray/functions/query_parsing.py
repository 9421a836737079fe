"""Query-side fallback parsers (M13/M14).

The reference parses user queries with an LLM and falls back to keyword /
regex heuristics when the LLM is unavailable. The fallbacks are pure
functions and are replicated here exactly:

- ``parse_temporal_query`` — keyword + year-pattern temporal parsing
  (/root/reference/src/temporal_kg_rag/retrieval/temporal_retrieval.py:149-219):
  keyword categories latest/point/range/history (first match per category),
  'latest/current/now' wins, then 'history/evolution/over time', then year
  patterns (1 year -> point-in-time at year end; 2+ -> min..max range).
- ``extract_query_entities`` — capitalized-sequence regex minus question
  words, order-preserving dedup (graph_search.py:432-448).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

from .temporal_filter import TemporalFilter, TemporalQueryType

_KEYWORDS = {  # temporal_retrieval.py:162-167
    "latest": ["latest", "current", "now", "recent", "today"],
    "point_in_time": ["in", "at", "during", "on"],
    "time_range": ["between", "from", "to", "since", "until", "before",
                   "after"],
    "history": ["history", "evolution", "changed", "over time", "timeline"],
}

_FULL_YEAR_RE = re.compile(r"\b((?:19|20)\d{2})\b")
_CAPSEQ_RE = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b")
_QUESTION_WORDS = {"What", "When", "Where", "Who", "How", "Why", "Which"}


@dataclass
class TemporalContext:
    """Parsed temporal context (reference models/temporal.py:340-363)."""

    has_temporal_reference: bool = False
    temporal_filter: TemporalFilter | None = None
    temporal_keywords: list[str] = field(default_factory=list)


def parse_temporal_query(query: str) -> TemporalContext:
    query_lower = query.lower()
    found: list[str] = []
    has_temporal = False
    for _category, words in _KEYWORDS.items():
        for word in words:
            if word in query_lower:
                found.append(word)
                has_temporal = True
                break
    if not has_temporal:
        return TemporalContext(has_temporal_reference=False)

    years = _FULL_YEAR_RE.findall(query)
    tfilter: TemporalFilter | None = None

    if ("latest" in query_lower or "current" in query_lower
            or "now" in query_lower):
        tfilter = TemporalFilter.latest()
    elif ("history" in query_lower or "evolution" in query_lower
          or "over time" in query_lower):
        tfilter = TemporalFilter.history()
    elif years:
        if len(years) == 1:
            year = int(years[0])
            tfilter = TemporalFilter(
                query_type=TemporalQueryType.POINT_IN_TIME,
                timestamp=datetime(year, 12, 31, 23, 59, 59),
            )
        else:
            start_year = int(min(years))
            end_year = int(max(years))
            tfilter = TemporalFilter(
                query_type=TemporalQueryType.TIME_RANGE,
                start_time=datetime(start_year, 1, 1),
                end_time=datetime(end_year, 12, 31, 23, 59, 59),
            )
    return TemporalContext(True, tfilter, found)


_TEMPORAL_LLM_PROMPT = """Analyze this query and extract temporal information.

Query: {query}

Return a JSON object with the following structure:
{{
    "has_temporal_reference": true/false,
    "temporal_type": "latest" | "point_in_time" | "time_range" | "history" | null,
    "dates": [
        {{"date": "YYYY-MM-DD", "type": "start" | "end" | "point"}}
    ],
    "temporal_phrase": "extracted phrase or null"
}}

Return only valid JSON, no additional text."""

_JSON_OBJ_RE = re.compile(r"\{.*\}", re.DOTALL)


def parse_temporal_with_llm(query: str, client) -> TemporalContext | None:
    """LLM leg of M13 (temporal_retrieval.py:62-147): prompt the model
    for the structured temporal JSON, extract the first {...} blob, map
    temporal_type + dates onto the TemporalFilter factories exactly as
    the reference does. Returns None when no JSON object is found
    (caller falls back); client/JSON errors propagate to the caller's
    try (same failure boundary as the reference's
    parse_temporal_context, :47-60)."""
    import json

    content = client(_TEMPORAL_LLM_PROMPT.format(query=query))
    m = _JSON_OBJ_RE.search(content)
    if not m:
        return None
    data = json.loads(m.group())
    if not data.get("has_temporal_reference", False):
        return TemporalContext(has_temporal_reference=False)
    tfilter: TemporalFilter | None = None
    ttype = data.get("temporal_type")
    dates = data.get("dates", [])
    if ttype == "latest":
        tfilter = TemporalFilter.latest()
    elif ttype == "history":
        tfilter = TemporalFilter.history()
    elif ttype == "point_in_time" and dates:
        tfilter = TemporalFilter(
            query_type=TemporalQueryType.POINT_IN_TIME,
            timestamp=datetime.fromisoformat(dates[0]["date"]),
        )
    elif ttype == "time_range" and len(dates) >= 2:
        # POSITIONAL by design: the reference maps dates[0]->start and
        # dates[1]->end and never reads each date's "type" field, even
        # though its own prompt asks the model to emit one
        # (temporal_retrieval.py:136-137 vs the :82 prompt schema).
        # Replicated verbatim — parity over prompt-order robustness.
        tfilter = TemporalFilter(
            query_type=TemporalQueryType.TIME_RANGE,
            start_time=datetime.fromisoformat(dates[0]["date"]),
            end_time=datetime.fromisoformat(dates[1]["date"]),
        )
    return TemporalContext(True, tfilter,
                           [data.get("temporal_phrase", "") or ""])


def parse_temporal_query_llm_first(query: str,
                                   client=None) -> TemporalContext:
    """The reference's dispatcher (temporal_retrieval.py:37-60): try the
    LLM parse, fall back to the keyword parser on any failure. With no
    client injected, the env-configured endpoint (TKG_LLM_API_BASE) is
    used when set; unset, this IS the keyword parser."""
    if client is None:
        from .llm_client import client_factory_from_env

        factory = client_factory_from_env()
        client = factory() if factory is not None else None
    if client is not None:
        try:
            result = parse_temporal_with_llm(query, client)
            if result is not None:
                return result
        except Exception:  # noqa: BLE001 - reference falls back on any
            pass
    return parse_temporal_query(query)


def extract_query_entities(query: str) -> list[str]:
    """Capitalized sequences minus question words; order-preserving dedup
    (graph_search.py:432-448)."""
    entities = _CAPSEQ_RE.findall(query)
    entities = [e for e in entities if e not in _QUESTION_WORDS]
    seen: set[str] = set()
    out: list[str] = []
    for e in entities:
        if e not in seen:
            seen.add(e)
            out.append(e)
    return out
