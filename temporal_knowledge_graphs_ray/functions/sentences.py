"""Sentence splitting.

Canonical spec = the reference's regex fallback splitter
(/root/reference/src/temporal_kg_rag/ingestion/chunker.py:180-193). The
NLTK punkt path (chunker.py:104-105) is intentionally NOT replicated:
SURVEY.md §7.5 picks the regex fallback as the deterministic canonical
behavior to avoid cross-environment nondeterminism.
"""

from __future__ import annotations

import re

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Split on whitespace that follows ., ! or ?; strip; drop empties."""
    return [s.strip() for s in _SENT_RE.split(text) if s.strip()]
