"""Text-analysis kernels: language ID, quality signals, fingerprinting.

Scale additions for training-data pipelines (no reference equivalent; the
reference's only text stats are token counts, chunker.py:300-310). Every
kernel is designed to have an EXACT DuckDB SQL oracle:

- counts are integers from regexp matches (identical under Python re and
  DuckDB RE2 for the patterns used),
- ratios are a single IEEE-754 division of those integers (bit-identical
  across engines),
- fingerprints are MD5 of a canonical normalization (DuckDB ``md5``).
"""

from __future__ import annotations

import re

from .hashing import md5_hex

# language -> stopword alternation; patterns are RE2-compatible
STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|it|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b",
    "fr": r"\b(le|la|les|et|est|des|un|une|que|pour)\b",
    "es": r"\b(el|los|las|y|es|en|un|una|que|por)\b",
}
LANG_ORDER = ["en", "de", "fr", "es"]  # first-max-wins tie break

_STOP_RES = {lang: re.compile(pat) for lang, pat in STOPWORDS.items()}
_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9\s]")


def stopword_counts(text: str) -> dict[str, int]:
    lowered = text.lower()
    return {lang: len(r.findall(lowered)) for lang, r in _STOP_RES.items()}


def detect_language(text: str) -> str:
    """Stopword-count argmax; ties resolved by LANG_ORDER; all-zero -> 'unknown'."""
    counts = stopword_counts(text)
    best = max(counts.values())
    if best == 0:
        return "unknown"
    for lang in LANG_ORDER:
        if counts[lang] == best:
            return lang
    raise AssertionError("unreachable")


def quality_signals(text: str) -> dict:
    """Quality-scoring signals for filter pipelines.

    All ratios are single divisions of integers -> bit-identical to the SQL
    oracle. ``n_words``/``n_punct`` use the engine tokenizer classes.
    """
    n_chars = len(text)
    n_words = len(_WORD_RE.findall(text))
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop_en = len(_STOP_RES["en"].findall(text.lower()))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stop_en": n_stop_en,
        "punct_ratio": (n_punct / n_chars) if n_chars > 0 else 0.0,
        "stop_ratio": (n_stop_en / n_words) if n_words > 0 else 0.0,
    }


def normalize_for_fingerprint(text: str) -> str:
    """Canonical form: lower-case, all whitespace runs -> single space, trimmed.

    SQL oracle: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``.
    """
    return re.sub(r"\s+", " ", text.lower()).strip()


def fingerprint(text: str) -> str:
    """MD5 content fingerprint of the canonical form (exact-dedup key)."""
    return md5_hex(normalize_for_fingerprint(text))
