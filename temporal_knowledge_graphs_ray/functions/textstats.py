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


_NGRAM_WORD_RE = re.compile(r"[a-z0-9]+")
_LINE_STRIP = " \t\r"
_PARA_STRIP = " \t\r\n"


def _dup_stats(items: list[str]) -> tuple[int, float, float]:
    """(count, duplicate fraction, duplicate char fraction).

    Duplicate fraction = occurrences beyond the first of each distinct
    value, over total occurrences (1 - distinct/total). Char fraction
    weights the same by value length.
    """
    if not items:
        return 0, 0.0, 0.0
    from collections import Counter

    c = Counter(items)
    total = len(items)
    dup = total - len(c)
    chars_total = sum(len(s) * k for s, k in c.items())
    chars_dup = sum(len(s) * (k - 1) for s, k in c.items() if k > 1)
    return (total, dup / total,
            (chars_dup / chars_total) if chars_total else 0.0)


def repetition_signals(text: str) -> dict:
    """Gopher-style (Rae et al. 2021 §A1.1) repetition filters: duplicate
    line / paragraph fractions (count- and character-weighted) and the
    character fraction of the most frequent word n-gram for n=2..4.

    Definitions pinned for the SQL oracle (tests/test_repetition.py):

    - lines: split on \\n, strip spaces/tabs/CRs, drop empties;
      paragraphs: split on \\n\\n, strip whitespace incl. newlines.
    - duplicate fraction: 1 - distinct/total; char-weighted variant
      counts occurrences beyond the first, weighted by value length.
    - top-n-gram char fraction: max over distinct space-joined word
      n-grams of count * len(gram), over len(" ".join(words)); words are
      ``[a-z0-9]+`` tokens of the lower-cased text. The max-product form
      avoids a most-frequent-gram tiebreak rule.

    All ratios are single divisions of integers — bit-identical to the
    DuckDB oracle.
    """
    text = text or ""
    lines = [ln.strip(_LINE_STRIP) for ln in text.split("\n")]
    n_lines, dup_line_frac, dup_line_char_frac = _dup_stats(
        [ln for ln in lines if ln])
    paras = [p.strip(_PARA_STRIP) for p in text.split("\n\n")]
    n_paras, dup_para_frac, dup_para_char_frac = _dup_stats(
        [p for p in paras if p])

    out = {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "n_paras": n_paras,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
    }
    words = _NGRAM_WORD_RE.findall(text.lower())
    denom = len(" ".join(words))
    from collections import Counter

    for n in (2, 3, 4):
        key = f"top_{n}gram_char_frac"
        if len(words) < n or denom == 0:
            out[key] = 0.0
            continue
        c = Counter(" ".join(words[i:i + n])
                    for i in range(len(words) - n + 1))
        out[key] = max(cnt * len(g) for g, cnt in c.items()) / denom
    return out
