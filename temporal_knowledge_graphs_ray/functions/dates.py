"""Date / fiscal-period kernels.

- ``parse_date`` replicates the reference's multi-format parser
  (/root/reference/src/temporal_kg_rag/ingestion/relation_extractor.py:376-392).
- fiscal helpers replicate the quarter -> end-of-quarter mapping
  (/root/reference/src/temporal_kg_rag/ingestion/pipeline.py:234-264 and
  ectqa_loader.py:202-242): Q1->3/31, Q2->6/30, Q3->9/30, Q4->12/31.
- ``month_to_quarter`` replicates models/temporal.py:97-121.
"""

from __future__ import annotations

from datetime import datetime

_FORMATS = ["%Y-%m-%d", "%Y-%m", "%Y", "%d/%m/%Y", "%m/%d/%Y"]
_NULLISH = {"null", "none", "", "unknown"}

_QUARTER_END = {  # quarter -> (month, day)
    "Q1": (3, 31),
    "Q2": (6, 30),
    "Q3": (9, 30),
    "Q4": (12, 31),
}


import re as _re

# fast paths for the two formats that dominate extraction output; must
# accept EXACTLY what strptime accepts for them (strptime allows 1-2
# digit month/day, rejects out-of-range values via datetime())
_ISO_RE = _re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$")
_YEAR_RE = _re.compile(r"^\d{4}$")


def parse_date(date_str: str | None) -> datetime | None:
    if not date_str or str(date_str).lower() in _NULLISH:
        return None
    s = str(date_str)
    m = _ISO_RE.match(s)
    if m:  # %Y-%m-%d without the ~17 us strptime machinery
        try:
            return datetime(int(m.group(1)), int(m.group(2)),
                            int(m.group(3)))
        except ValueError:
            return None  # strptime would also fail every later format
    if _YEAR_RE.match(s):  # %Y
        try:
            return datetime(int(s), 1, 1)
        except ValueError:  # year 0000 — strptime also yields None
            return None
    for fmt in _FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def normalize_quarter(quarter: str | int | None) -> str | None:
    """'q3' / '3' / 3 -> 'Q3' (reference ectqa_loader.py:202-214 semantics)."""
    if quarter is None:
        return None
    q = str(quarter).strip().upper()
    if not q:
        return None
    if not q.startswith("Q"):
        q = "Q" + q
    return q if q in _QUARTER_END else None


def fiscal_period_end(year: int, quarter: str) -> datetime | None:
    q = normalize_quarter(quarter)
    if q is None:
        return None
    month, day = _QUARTER_END[q]
    return datetime(int(year), month, day)


def month_to_quarter(month: int) -> str:
    """Calendar month -> fiscal quarter (reference temporal.py:97-121)."""
    return f"Q{(month - 1) // 3 + 1}"
