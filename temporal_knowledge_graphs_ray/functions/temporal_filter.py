"""Temporal filter model + compile-to-Arrow (M11/M12).

The reference's ``TemporalFilter`` compiles itself to a Cypher WHERE clause
(/root/reference/src/temporal_kg_rag/models/temporal.py:138-216) with four
query types (temporal.py:23-29). Here the same filter object compiles to a
``pyarrow.dataset`` boolean expression usable by ``Dataset.filter`` and by
``read_parquet(filter=...)`` for row-group pushdown.

Replicated semantics, including the reference's single-year-range quirk:
quarter bounds apply ONLY when start_year == end_year (temporal.py:179-183).
Datetime fallbacks convert through the fiscal calendar (temporal.py:97-136).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from enum import Enum

import pyarrow.dataset as pads

from .dates import month_to_quarter


class TemporalQueryType(str, Enum):  # reference temporal.py:23-29
    POINT_IN_TIME = "point_in_time"
    TIME_RANGE = "time_range"
    LATEST = "latest"
    HISTORY = "history"


@dataclass
class TemporalFilter:
    query_type: TemporalQueryType = TemporalQueryType.LATEST
    fiscal_year: int | None = None
    fiscal_quarter: str | None = None
    start_year: int | None = None
    start_quarter: str | None = None
    end_year: int | None = None
    end_quarter: str | None = None
    # legacy datetime fields (converted through the fiscal calendar)
    timestamp: datetime | None = None
    start_time: datetime | None = None
    end_time: datetime | None = None
    include_superseded: bool = False

    # -- fiscal conversions (reference temporal.py:97-136) --
    def _effective_fiscal_period(self) -> tuple[int | None, str | None]:
        if self.fiscal_year is not None:
            return self.fiscal_year, self.fiscal_quarter
        if self.timestamp is not None:
            return self.timestamp.year, month_to_quarter(self.timestamp.month)
        return None, None

    def _effective_range(self):
        sy, sq, ey, eq = (self.start_year, self.start_quarter,
                          self.end_year, self.end_quarter)
        if sy is None and self.start_time:
            sy = self.start_time.year
            sq = month_to_quarter(self.start_time.month)
        if ey is None and self.end_time:
            ey = self.end_time.year
            eq = month_to_quarter(self.end_time.month)
        return sy, sq, ey, eq

    def to_arrow_expression(self):
        """Compile to a pyarrow.dataset expression (None -> no filter)."""
        f = pads.field
        clauses = []
        qt = self.query_type

        if qt == TemporalQueryType.LATEST and not self.include_superseded:
            clauses.append(f("is_current") == True)  # noqa: E712

        elif qt == TemporalQueryType.POINT_IN_TIME:
            year, quarter = self._effective_fiscal_period()
            if year:
                clauses.append(f("fiscal_year") == year)
            if quarter:
                clauses.append(f("fiscal_quarter") == quarter)
            if not self.include_superseded:
                clauses.append(f("is_current") == True)  # noqa: E712

        elif qt == TemporalQueryType.TIME_RANGE:
            sy, sq, ey, eq = self._effective_range()
            if sy is not None:
                clauses.append(f("fiscal_year") >= sy)
            if ey is not None:
                clauses.append(f("fiscal_year") <= ey)
            # quarter bounds only for single-year ranges (temporal.py:179-183)
            if sy is not None and ey is not None and sy == ey:
                if sq:
                    clauses.append(f("fiscal_quarter") >= sq)
                if eq:
                    clauses.append(f("fiscal_quarter") <= eq)
            if not self.include_superseded:
                clauses.append(f("is_current") == True)  # noqa: E712

        elif qt == TemporalQueryType.HISTORY:
            pass  # all versions

        if not clauses:
            return None
        expr = clauses[0]
        for c in clauses[1:]:
            expr = expr & c
        return expr

    def apply(self, ds):
        """Apply to a Ray Dataset (vectorized batch filter)."""
        expr = self.to_arrow_expression()
        if expr is None:
            return ds
        return ds.map_batches(
            lambda t: t.filter(expr), batch_format="pyarrow",
        )

    # convenience constructors (reference temporal.py:218-270 pattern)
    @classmethod
    def latest(cls) -> "TemporalFilter":
        return cls(query_type=TemporalQueryType.LATEST)

    @classmethod
    def point_in_time(cls, year: int, quarter: str | None = None) -> "TemporalFilter":
        return cls(query_type=TemporalQueryType.POINT_IN_TIME,
                   fiscal_year=year, fiscal_quarter=quarter)

    @classmethod
    def time_range(cls, start_year: int, end_year: int,
                   start_quarter: str | None = None,
                   end_quarter: str | None = None) -> "TemporalFilter":
        return cls(query_type=TemporalQueryType.TIME_RANGE,
                   start_year=start_year, end_year=end_year,
                   start_quarter=start_quarter, end_quarter=end_quarter)

    @classmethod
    def history(cls) -> "TemporalFilter":
        return cls(query_type=TemporalQueryType.HISTORY)
