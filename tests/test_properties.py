"""Property-based tests (hypothesis) for kernel invariants.

These pin the algebraic properties the distributed design RELIES on:
- merge_duplicate_relations is associative/commutative/idempotent (partial
  merges + global merge == one big merge),
- the provenance cap is safe under re-merging (smallest-N of capped
  partials == smallest-N of the whole),
- chunker output respects size bounds and indices,
- rounding matches DuckDB ROUND,
- HTML extraction is total and line-normalization is idempotent.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from temporal_knowledge_graphs_ray.functions.chunking import chunk_text
from temporal_knowledge_graphs_ray.functions.html_text import (
    extract_text_from_html,
    normalize_text_lines,
)
from temporal_knowledge_graphs_ray.functions.relations import (
    merge_duplicate_relations,
)
from temporal_knowledge_graphs_ray.functions.rounding import round_half_away

T0 = datetime(2020, 1, 1)


def _rel_rows(draw_keys, descs, chunks):
    rows = []
    for i, (k, d, c) in enumerate(zip(draw_keys, descs, chunks)):
        rows.append({
            "source": f"s{k}", "target": f"t{k}", "relationship": "rel",
            "timestamp": None, "valid_from": T0 + timedelta(days=i % 7),
            "description": d, "confidence": 0.85, "source_chunks": [c],
        })
    return rows


rel_rows_strategy = st.builds(
    _rel_rows,
    st.lists(st.integers(0, 3), min_size=1, max_size=20),
    st.lists(st.text(alphabet="abcd", max_size=6), min_size=20, max_size=20),
    st.lists(st.text(alphabet="xyz", min_size=1, max_size=4),
             min_size=20, max_size=20),
)


def _norm(merged):
    return sorted(
        (m["source"], m["target"], m["valid_from"], m["description"],
         tuple(m["source_chunks"]))
        for m in merged
    )


class TestMergeAlgebra:
    @given(rows=rel_rows_strategy, split=st.integers(0, 20))
    @settings(max_examples=60, deadline=None)
    def test_partial_then_global_equals_one_shot(self, rows, split):
        split = min(split, len(rows))
        partial = (merge_duplicate_relations(rows[:split])
                   + merge_duplicate_relations(rows[split:]))
        assert _norm(merge_duplicate_relations(partial)) == \
            _norm(merge_duplicate_relations(rows))

    @given(rows=rel_rows_strategy)
    @settings(max_examples=30, deadline=None)
    def test_order_insensitive(self, rows):
        assert _norm(merge_duplicate_relations(rows)) == \
            _norm(merge_duplicate_relations(list(reversed(rows))))

    @given(rows=rel_rows_strategy, split=st.integers(0, 20),
           cap=st.integers(1, 4))
    @settings(max_examples=60, deadline=None)
    def test_cap_safe_under_remerge(self, rows, split, cap):
        split = min(split, len(rows))
        partial = (merge_duplicate_relations(rows[:split],
                                             max_source_chunks=cap)
                   + merge_duplicate_relations(rows[split:],
                                               max_source_chunks=cap))
        two_level = merge_duplicate_relations(partial, max_source_chunks=cap)
        one_shot = merge_duplicate_relations(rows, max_source_chunks=cap)
        assert _norm(two_level) == _norm(one_shot)


class TestChunkerProps:
    @given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=30),
                    max_size=20),
           st.integers(5, 40), st.integers(0, 4))
    @settings(max_examples=60, deadline=None)
    def test_bounds_and_indices(self, sentences, size, overlap):
        text = ". ".join(s.strip() or "x" for s in sentences)
        rows = chunk_text(text, chunk_size=size, chunk_overlap=overlap)
        # the reference's overlap carry-in means a chunk can reach
        # chunk_size + chunk_overlap (chunker.py:158-160: current starts at
        # overlap_tokens + sentence_tokens and is only flushed on the NEXT
        # overflow) — replicated semantics, so the bound includes overlap
        assert all(r.token_count <= size + overlap for r in rows)
        assert [r.chunk_index for r in rows] == list(range(len(rows)))
        assert all(r.text.strip() for r in rows)

    @given(st.text(max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_total_no_crash(self, text):
        chunk_text(text, chunk_size=10, chunk_overlap=2)


class TestRounding:
    @given(st.floats(min_value=-1e6, max_value=1e6,
                     allow_nan=False, allow_infinity=False),
           st.integers(0, 6))
    @settings(max_examples=100, deadline=None)
    def test_matches_duckdb_round(self, x, n):
        ours = round_half_away(x, n)
        theirs = duckdb.sql(f"SELECT ROUND({x!r}::DOUBLE, {n})").fetchone()[0]
        assert ours == theirs or abs(ours - theirs) < 1e-12


class TestHtmlTotal:
    @given(st.text(max_size=300))
    @settings(max_examples=80, deadline=None)
    def test_extract_total(self, s):
        out = extract_text_from_html(s)
        assert isinstance(out, str)
        # normalization is idempotent
        assert normalize_text_lines(out) == out

    @given(st.binary(max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_bytes_total(self, b):
        assert isinstance(extract_text_from_html(b), str)
