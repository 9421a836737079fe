"""Context formatting kernels (M15).

Pure functions replicating the reference's retrieval-to-prompt assembly:

- ``format_context`` — numbered ``[Source i: "title" (date)]`` blocks with
  the chunk text and an optional ``Key entities:`` line (first five entity
  names per result), blank-line separated
  (/root/reference/src/temporal_kg_rag/rag/prompts.py:142-184).
- ``format_entity_relationships`` — sorted distinct entity names across all
  results, or the no-entities sentinel (prompts.py:187-221).
- ``format_temporal_context`` — human-readable temporal-filter description
  (prompts.py:223-247).
- ``build_context`` — assembly + char-budget truncation with the
  ``[Context truncated...]`` marker + metadata dict
  (rag/context_builder.py:26-106).

Everything is deterministic string building — the batch pipeline
(pipelines/rag.py) and the sequential oracle share these kernels the same
way both share ``surface_key``/``embed_text``; orchestration, retrieval and
joins are independent between the two.
"""

from __future__ import annotations

from datetime import datetime

from .temporal_filter import TemporalFilter, TemporalQueryType

TRUNCATION_MARKER = "\n[Context truncated...]"
DEFAULT_MAX_CONTEXT_LENGTH = 4000
KEY_ENTITY_LIMIT = 5


def format_date(created_at) -> str:
    """``datetime -> %Y-%m-%d``; anything else is stringified and cut to 10
    chars (prompts.py:160-166)."""
    if created_at is None:
        return ""
    if isinstance(created_at, datetime):
        return created_at.strftime("%Y-%m-%d")
    return str(created_at)[:10]


def format_context(results: list[dict], include_metadata: bool = True) -> str:
    """Render retrieval results (dicts with ``document_title``, ``text``,
    ``created_at`` and optional ``entities`` name list) into the numbered
    source-block context string (prompts.py:142-184)."""
    parts: list[str] = []
    for i, result in enumerate(results, 1):
        title = result.get("document_title") or "Unknown Source"
        date_str = format_date(result.get("created_at"))
        parts.append(f'[Source {i}: "{title}" ({date_str})]')
        parts.append(result.get("text", ""))
        if include_metadata:
            names = [str(e) for e in (result.get("entities") or [])[:KEY_ENTITY_LIMIT]
                     if e]
            if names:
                parts.append("Key entities: " + ", ".join(names))
        parts.append("")
    return "\n".join(parts)


def format_entity_relationships(results: list[dict]) -> str:
    """Sorted distinct entity names across results (prompts.py:187-221)."""
    entities: set[str] = set()
    for result in results:
        for e in result.get("entities") or []:
            if e is None:
                continue
            s = str(e).strip()
            if s:
                entities.add(s)
    if not entities:
        return "No entity relationships found."
    return "Entities mentioned: " + ", ".join(sorted(entities))


def format_temporal_context(tfilter: TemporalFilter | None) -> str:
    """Human-readable temporal-filter line (prompts.py:223-247)."""
    if tfilter is None:
        return "Current information (no temporal filter applied)"
    qt = tfilter.query_type
    if qt == TemporalQueryType.POINT_IN_TIME:
        ts = tfilter.timestamp
        return f"Information as of: {ts if ts is not None else 'unknown'}"
    if qt == TemporalQueryType.TIME_RANGE:
        start = tfilter.start_time if tfilter.start_time is not None else "unknown"
        end = tfilter.end_time if tfilter.end_time is not None else "unknown"
        return f"Information from {start} to {end}"
    if qt == TemporalQueryType.LATEST:
        return "Most recent/current information"
    return f"Temporal filter: {qt.value}"


def build_context(
    query: str,
    results: list[dict],
    temporal_context=None,
    include_metadata: bool = True,
    max_context_length: int = DEFAULT_MAX_CONTEXT_LENGTH,
) -> dict:
    """Assemble the full context dict: formatted context (char-budget
    truncated), entity relationships, temporal line, metadata
    (context_builder.py:26-106). ``sources`` = ordered distinct titles."""
    formatted = format_context(results, include_metadata=include_metadata)
    truncated = len(formatted) > max_context_length
    if truncated:
        formatted = formatted[:max_context_length] + TRUNCATION_MARKER

    seen: set[str] = set()
    sources: list[str] = []
    for r in results:
        title = r.get("document_title") or "Unknown Source"
        if title not in seen:
            seen.add(title)
            sources.append(title)

    return {
        "query": query,
        "formatted_context": formatted,
        "entity_relationships": format_entity_relationships(results),
        "temporal_context": (
            format_temporal_context(temporal_context.temporal_filter)
            if temporal_context is not None
            and getattr(temporal_context, "has_temporal_reference", False)
            else None),
        "metadata": {
            "num_results": len(results),
            "context_length": len(formatted),
            "truncated": truncated,
            "sources": sources,
        },
    }
