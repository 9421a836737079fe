"""ECT-QA JSONL source (S6/S7/S8).

Reference semantics (/root/reference/src/temporal_kg_rag/ingestion/
ectqa_loader.py:41-305) rebuilt as a Ray Data pipeline:

- streaming JSONL read with malformed-line skipping (ectqa_loader.py:88-93),
- per-record filters sector / year / quarter / stock_code (case-insensitive
  for stock_code, :96-105), limit (:81-82),
- record -> document projection: title template
  ``"{company} ({code}) - {Q} {year} Earnings Call"``, metadata projection,
  quarter -> end-of-quarter date (:142-242) — with the reference's
  ``datetime.now()`` fallbacks replaced by a fixed epoch (determinism rule),
- dataset stats: counts by sector/year/quarter, distinct companies, token
  sum (:244-305) as grouped aggregates.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyarrow as pa

_FALLBACK_DATE = datetime(1970, 1, 1)  # replaces datetime.now() fallbacks

DOCS_SCHEMA = pa.schema([
    ("title", pa.string()),
    ("source", pa.string()),
    ("content_type", pa.string()),
    ("company_name", pa.string()),
    ("stock_code", pa.string()),
    ("sector", pa.string()),
    ("year", pa.string()),
    ("quarter", pa.string()),
    ("token_count", pa.int64()),
    ("created_at", pa.timestamp("us")),
    ("text", pa.large_string()),
])


def parse_quarter_date(year: str, quarter: str) -> datetime:
    """End-of-quarter date (ectqa_loader.py:202-242 semantics)."""
    try:
        year_int = int(year)
    except (ValueError, TypeError):
        return _FALLBACK_DATE
    quarter_months = {"q1": 3, "q2": 6, "q3": 9, "q4": 12}
    month = quarter_months.get((quarter or "").lower(), 1)
    if month in (1, 3, 5, 7, 8, 10, 12):
        day = 31
    elif month in (4, 6, 9, 11):
        day = 30
    else:
        day = 28
    try:
        return datetime(year_int, month, day)
    except ValueError:
        return _FALLBACK_DATE


def parse_record(record: dict, use_cleaned_content: bool = True) -> dict:
    """One JSONL record -> document row (ectqa_loader.py:142-200)."""
    text = record.get("cleaned_content" if use_cleaned_content
                      else "raw_content", "")
    if not text:
        raise ValueError("No content found in record")
    company_name = record.get("company_name", "Unknown Company")
    stock_code = record.get("stock_code", "")
    year = record.get("year", "")
    quarter = (record.get("quarter", "") or "").upper()
    return {
        "title": f"{company_name} ({stock_code}) - {quarter} {year} "
                 f"Earnings Call",
        "source": record.get("URL",
                             f"ectqa://{stock_code}/{year}/{quarter}"),
        "content_type": "earnings_call_transcript",
        "company_name": company_name,
        "stock_code": stock_code,
        "sector": record.get("sector", ""),
        "year": year,
        "quarter": quarter,
        "token_count": int(record.get("token_count", len(text.split()))),
        "created_at": parse_quarter_date(year, quarter),
        "text": text,
    }


def read_ectqa(
    path: str,
    use_cleaned_content: bool = True,
    limit: int | None = None,
    filter_sector: str | None = None,
    filter_year: str | None = None,
    filter_quarter: str | None = None,
    filter_stock_code: str | None = None,
):
    """JSONL file(s) -> documents Dataset with pushed-down record filters.

    Malformed lines and empty-content records are skipped (counted rows
    simply drop out, like the reference's warn-and-continue).
    """
    import ray.data as rd

    def parse_lines(batch: dict) -> pa.Table:
        rows = []
        for line in batch["text"]:
            line = line.strip()
            if not line:
                continue
            try:
                record = json.loads(line)
            except json.JSONDecodeError:
                continue  # malformed-line skip (ectqa_loader.py:88-93)
            if filter_sector and record.get("sector") != filter_sector:
                continue
            if filter_year and record.get("year") != filter_year:
                continue
            if filter_quarter and record.get("quarter") != filter_quarter:
                continue
            if filter_stock_code:
                code = (record.get("stock_code") or "").upper()
                if code != filter_stock_code.upper():
                    continue
            try:
                rows.append(parse_record(record, use_cleaned_content))
            except (ValueError, TypeError):
                continue
        if not rows:
            return DOCS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    ds = rd.read_text(path).map_batches(
        parse_lines, batch_format="numpy", batch_size=512,
    )
    if limit is not None:
        ds = ds.limit(limit)
    return ds


def ectqa_stats(docs_ds) -> dict:
    """Dataset stats (ectqa_loader.py:244-305): grouped counts + sums."""
    from ray.data.aggregate import Count

    by_sector = (docs_ds.groupby("sector")
                 .aggregate(Count(alias_name="n")).to_pandas())
    by_year = (docs_ds.groupby("year")
               .aggregate(Count(alias_name="n")).to_pandas())
    by_quarter = (docs_ds.groupby("quarter")
                  .aggregate(Count(alias_name="n")).to_pandas())
    companies = docs_ds.unique("company_name")
    token_sum = docs_ds.select_columns(["token_count"]).sum("token_count")
    return {
        "total_documents": docs_ds.count(),
        "by_sector": dict(zip(by_sector["sector"], by_sector["n"])),
        "by_year": dict(zip(by_year["year"], by_year["n"])),
        "by_quarter": dict(zip(by_quarter["quarter"], by_quarter["n"])),
        "distinct_companies": len(companies),
        "total_tokens": int(token_sum),
    }
