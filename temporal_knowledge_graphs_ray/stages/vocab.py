"""Distributed vocabulary building: exact global term counts and a
deterministic top-K vocab with assigned token ids (scale addition —
the tokenizer-training / vocab-pruning step of an LLM data pipeline;
the reference has no vocabulary surface, its nearest analogue is the
token ESTIMATE in chunking/token_counter.py).

Tokenization is the house ``[a-z0-9]+`` over lowercased text — the
same extraction DuckDB's ``regexp_extract_all`` computes, so counts
have an exact SQL oracle (unnest → GROUP BY → ORDER BY n DESC, term).

Dataflow (the canonical heavy-aggregation shape):
1. one ``map_batches`` pass emits per-BATCH partial counts — a Counter
   over the batch collapses each block to its DISTINCT terms before
   anything moves, so shuffle volume is bounded by
   distinct-terms × blocks (Zipf makes this tiny next to token count);
2. partials hash-bucket by term and one bucketed
   ``groupby(bucket).map_groups`` sums them (vectorized);
3. the house per-block partial top-k bounds the final
   (count desc, term asc) selection to k × blocks rows.

``min_count`` prunes the long tail BEFORE the top-k sort. Token ids
are ranks in the final order — a pure function of the corpus, so
re-runs and layouts assign identical ids (SQL: row_number() - 1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def term_counts(docs, text_col: str = "text", num_buckets: int = 64):
    """Exact global (term, n) counts as a Dataset — map-side combined,
    one bucketed groupby."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t[text_col].to_pylist():
            c.update(_TOKEN_RE.findall((text or "").lower()))
        terms = list(c.keys())
        if not terms:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        buckets = (pd.util.hash_array(np.asarray(terms, dtype=object),
                                      categorize=False)
                   % num_buckets).astype("int32")
        return pa.table({"term": pa.array(terms, pa.string()),
                         "n": pa.array(list(c.values()), pa.int64()),
                         "bucket": pa.array(buckets)})

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=True)["n"].sum().reset_index()
        return out[["term", "n"]]

    return (docs.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sum_bucket, batch_format="pandas"))


def build_vocab(docs, text_col: str = "text", max_size: int = 50_000,
                min_count: int = 1,
                num_buckets: int = 64) -> pd.DataFrame:
    """Top-``max_size`` vocab by exact count: columns
    (token_id, term, n) ordered n desc / term asc, token_id = rank-1
    from 0. Oracle: unnest+GROUP BY+QUALIFY row_number in DuckDB."""
    from .topk import topk_rows

    counts = term_counts(docs, text_col=text_col,
                         num_buckets=num_buckets)
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {min_count}")
    top = topk_rows(counts, ["n", "term"], [True, False],
                    max_size).to_pandas()
    if top.empty:  # empty/stopword-only corpus: typed empty frame
        return pd.DataFrame({"token_id": pd.Series([], dtype="int64"),
                             "term": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    top = top.sort_values(["n", "term"], ascending=[False, True],
                          ignore_index=True)
    top.insert(0, "token_id", range(len(top)))
    return top[["token_id", "term", "n"]]
