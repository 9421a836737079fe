"""PII detection/redaction kernels (scale addition — no reference
equivalent; standard web-corpus scrubbing a training-data pipeline needs
before publishing a corpus).

Every pattern is written in the common subset of Python ``re`` and RE2 so
the redaction has an exact DuckDB ``regexp_replace(..., 'g')`` oracle:

- no lookaround / backreferences (RE2 lacks them),
- ``re.ASCII`` compilation so ``\\d`` / ``\\b`` are ASCII like RE2's,
- replacements applied in the fixed ``PII_PATTERNS`` order (order matters:
  a credit-card number contains phone-shaped substrings, so wider patterns
  run first) — the SQL oracle nests regexp_replace in the same order.

Match COUNTS use non-overlapping leftmost matches, the shared semantics of
``re.findall`` and DuckDB ``regexp_extract_all``.
"""

from __future__ import annotations

import re

# (name, pattern, replacement-token) — order is part of the contract.
# Patterns deliberately favour precision (separators required for phones)
# over recall: at web scale a few-percent false-positive rate destroys
# orders of magnitude more clean text than the missed tail of exotic
# formats is worth.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # 16 digits in 4 groups (credit-card shaped) — before phone: the last
    # 10-11 digits of a card would otherwise phone-match.
    ("card",
     r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
     "<CARD>"),
    # SSN (3-2-4 with dashes) before phone: both start \d{3}- and a phone
    # match starting inside an SSN would split it.
    ("ssn",
     r"\b\d{3}-\d{2}-\d{4}\b",
     "<SSN>"),
    # US-shaped phone, separators required: optional +1 country code,
    # optional parens on the area code.
    ("phone",
     r"(\+1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
     "<PHONE>"),
    ("ipv4",
     r"\b(\d{1,3}\.){3}\d{1,3}\b",
     "<IP>"),
]

_COMPILED = [(name, re.compile(pat, re.ASCII), tok)
             for name, pat, tok in PII_PATTERNS]

PII_TYPES = [name for name, _, _ in PII_PATTERNS]


def count_pii(text: str) -> dict[str, int]:
    """Non-overlapping match count per PII type, counted on the ORIGINAL
    text per type (counts are independent diagnostics; redaction order
    only matters for the rewritten text)."""
    return {name: len(rx.findall(text)) for name, rx, _ in _COMPILED}


def redact_pii(text: str) -> tuple[str, dict[str, int]]:
    """Redact in ``PII_PATTERNS`` order; counts = substitutions actually
    made on the progressively-redacted text (sums to the number of
    inserted tokens, unlike :func:`count_pii` which can double-count a
    span matched by two types)."""
    counts: dict[str, int] = {}
    for name, rx, tok in _COMPILED:
        text, n = rx.subn(tok, text)
        counts[name] = n
    return text, counts


def pii_redact_sql(col: str) -> str:
    """DuckDB expression equivalent to the redacted text (the oracle):
    regexp_replace chained innermost-first in ``PII_PATTERNS`` order."""
    expr = col
    for _, pat, tok in PII_PATTERNS:
        lit = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', '{tok}', 'g')"
    return expr


def pii_count_sql(col: str, name: str) -> str:
    """DuckDB expression for :func:`count_pii`'s per-type count."""
    pat = dict((n, p) for n, p, _ in PII_PATTERNS)[name]
    lit = pat.replace("'", "''")
    return f"length(regexp_extract_all({col}, '{lit}'))"
