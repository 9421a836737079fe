"""Deterministic tokenizer.

The reference counts tokens with tiktoken ``cl100k_base``
(/root/reference/src/temporal_kg_rag/ingestion/chunker.py:50, :300-310).
tiktoken is not available in this environment, so the canonical tokenizer
spec for this engine is a BPE-ish regex: maximal alphanumeric runs, plus
every individual non-alphanumeric non-space character.

The same pattern is expressible in DuckDB's RE2
(``regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')``) so token
counting has an exact SQL oracle. The alternatives are disjoint, so
leftmost-first (Python re) and leftmost-longest (RE2 POSIX) agree.
"""

from __future__ import annotations

import re

TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Split text into tokens (alnum runs + single punctuation chars)."""
    return _TOKEN_RE.findall(text)


def token_spans(text: str) -> list[tuple[int, int]]:
    """Character (start, end) span of every token.

    Used by the chunker to "decode" a token window back to text as the exact
    source substring ``text[spans[i][0]:spans[j-1][1]]`` — the stand-in for
    tiktoken's encode/decode round-trip in the reference's fixed-window
    splitting (chunker.py:206-217, :252-260).
    """
    return [m.span() for m in _TOKEN_RE.finditer(text)]


def count_tokens(text: str) -> int:
    """Token count (reference chunker.py:300-310 semantics, our tokenizer)."""
    return len(_TOKEN_RE.findall(text))


def estimate_chunks(total_tokens: int, chunk_size: int, chunk_overlap: int) -> int:
    """Ceil-div chunk estimate (reference chunker.py:312-331)."""
    effective = chunk_size - chunk_overlap
    if effective <= 0:
        raise ValueError("Overlap must be less than chunk size")
    return max(1, (total_tokens + effective - 1) // effective)
