"""Paragraph-level exact dedup (CCNet-style; scale addition — the
reference dedups whole entities/relations, not corpus text. Wenzek et
al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data" dedups CommonCrawl at the PARAGRAPH grain: every
repeated paragraph — boilerplate, navigation, license blurbs — is
dropped from all but its first occurrence, then documents are
reassembled from their surviving paragraphs).

Semantics: split each document on ``sep``; a paragraph SURVIVES iff it
is the globally-first occurrence of its exact text, "first" = smallest
``(doc_id, para_idx)`` (deterministic, layout-independent; CCNet's
hash-set order is arrival order, which a distributed engine must not
depend on). Paragraphs shorter than ``min_chars`` are exempt (always
kept — dropping every "" would mangle formatting). Documents whose
every paragraph is dropped disappear. The whole operation is a pure
function of the rows with an exact DuckDB oracle
(``row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx)``).

Dataflow (two bucketed shuffles, both on uniform hashes — no skew):
1. explode: one vectorized Arrow pass (``split_pattern`` →
   ``list_flatten`` + parent indices; no Python loop over rows);
2. ``groupby(para-hash bucket).map_groups``: keep the min-key row per
   exact paragraph text (group state = the bucket's distinct
   paragraphs, bounded by bucket count sizing);
3. ``groupby(doc-hash bucket).map_groups``: reassemble each doc's
   survivors in ``para_idx`` order with ``sep``.

Scale notes (100 TB): shuffle volume is the corpus text once per
shuffle — the unavoidable cost of a global first-occurrence rule. To
halve it, run step 2 over ``(hash, doc_id, para_idx)`` triples only
(24 bytes/paragraph) and semi-join survivors back; this variant keeps
the text inline because the verify-free reassembly then needs a second
full scan anyway, and the triple variant is exactly what
``stages/incdedup.py`` does for the doc grain (reuse it with the
exploded table for cross-snapshot paragraph dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_vec

_IDX_COL = "para_idx"
_PARA_COL = "para"
_BUCKET_COL = "_pd_bucket"


def split_paragraphs(ds, text_col: str = "text", id_col: str = "doc_id",
                     sep: str = "\n"):
    """Explode documents into ``(id_col, para_idx, para)`` rows — one
    vectorized Arrow pass, paragraphs ordered by ``para_idx``."""

    def explode(t: pa.Table) -> pa.Table:
        # null-text docs produce no paragraphs and therefore drop —
        # exactly the SQL oracle's unnest(string_split(NULL)) semantics
        t = t.filter(pc.is_valid(t[text_col]))
        if t.num_rows == 0:
            # all-null (or empty) batch: np.repeat below would choke on
            # the shape-(1,) cumsum seed vs zero counts — return the
            # empty exploded table directly.
            return pa.table({
                id_col: t[id_col],
                _IDX_COL: pa.array([], pa.int64()),
                _PARA_COL: pa.array([], pa.string()),
            })
        lists = pc.split_pattern(t[text_col], pattern=sep)
        lists = pa.chunked_array([lists]).combine_chunks() \
            if isinstance(lists, pa.Array) else lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        # position within each list: global arange minus each list's start
        starts = np.repeat(np.concatenate(([0], counts.cumsum()[:-1])),
                           counts)
        idx = np.arange(len(flat), dtype=np.int64) - starts
        return pa.table({
            id_col: t[id_col].take(parents),
            _IDX_COL: pa.array(idx, pa.int64()),
            _PARA_COL: flat,
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def dedup_paragraphs(ds, text_col: str = "text", id_col: str = "doc_id",
                     sep: str = "\n", min_chars: int = 1,
                     num_buckets: int = 64):
    """Drop every non-first occurrence of each exact paragraph across
    the corpus and reassemble documents (CCNet paragraph dedup).
    Returns ``(id_col, text_col)`` rows; fully-deduped docs drop."""
    paras = split_paragraphs(ds, text_col, id_col, sep)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash64_vec(t[_PARA_COL].to_pylist(), seed=1) % num_buckets
        return t.append_column(_BUCKET_COL,
                               pa.array(b.astype(np.int64)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        exempt = g[_PARA_COL].str.len() < min_chars
        dup = g[~exempt].sort_values([_PARA_COL, id_col, _IDX_COL],
                                     kind="mergesort")
        kept = dup.drop_duplicates(_PARA_COL, keep="first")
        out = pd.concat([g[exempt], kept], ignore_index=True)
        return out.drop(columns=[_BUCKET_COL])

    survivors = (paras.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby(_BUCKET_COL).map_groups(
                     keep_first, batch_format="pandas"))

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = hash64_vec(t[id_col].cast(pa.string()).to_pylist(),
                       seed=2) % num_buckets
        return t.append_column(_BUCKET_COL,
                               pa.array(b.astype(np.int64)))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, _IDX_COL], kind="mergesort")
        agg = g.groupby(id_col, sort=True)[_PARA_COL].agg(sep.join)
        return pd.DataFrame({id_col: agg.index, text_col: agg.values})

    return (survivors.map_batches(add_doc_bucket, batch_format="pyarrow")
            .groupby(_BUCKET_COL).map_groups(
                reassemble, batch_format="pandas"))


def paragraph_dedup_sql(table: str, text_col: str = "text",
                        id_col: str = "doc_id", sep: str = "\n",
                        min_chars: int = 1) -> str:
    """Exact DuckDB oracle for :func:`dedup_paragraphs` (same rows,
    any order)."""
    sep_sql = sep.replace("'", "''")
    return f"""
        WITH p AS (
            SELECT {id_col},
                   u.para,
                   u.i - 1 AS para_idx
            FROM {table},
                 LATERAL (SELECT unnest(string_split({text_col},
                                                     '{sep_sql}')) AS para,
                          generate_subscripts(string_split({text_col},
                                              '{sep_sql}'), 1) AS i) u
        ), w AS (
            SELECT *,
                   CASE WHEN length(para) < {min_chars} THEN 1
                        ELSE row_number() OVER (
                            PARTITION BY para
                            ORDER BY {id_col}, para_idx) END AS rn
            FROM p
        )
        SELECT {id_col},
               string_agg(para, '{sep_sql}' ORDER BY para_idx)
                   AS {text_col}
        FROM w WHERE rn = 1
        GROUP BY {id_col}
        ORDER BY {id_col}
    """
