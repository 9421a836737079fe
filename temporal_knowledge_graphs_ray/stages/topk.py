"""Distributed top-k without a full sort shuffle.

``Dataset.sort().limit(k)`` moves EVERY row through an all-to-all range
shuffle just to keep k of them.  Any row in the global top-k is
necessarily in its own block's top-k, so a per-block partial top-k
(vectorized ``pc.sort_indices`` + ``take``) first shrinks the sorted
data to at most k x num_blocks candidate rows — at 100 TB that turns the
wide sort into a trivial one while returning bit-identical results
(every sort site here already carries a deterministic tiebreak column).

Assumes sort-key columns are non-null (all in-repo callers satisfy
this); null ordering between Arrow block sort and Ray's range sort is
not reconciled.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def topk_rows(ds, keys: list[str], descending: list[bool], k: int):
    """Global top-k rows by ``keys``: partial per-block top-k, then the
    standard sort+limit over the surviving candidates."""
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(keys, descending)]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx[:k])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort(keys, descending=descending).limit(k))


def group_topk_rows(ds, group_col: str, keys: list[str],
                    descending: list[bool], n: int):
    """Per-GROUP top-n by ``keys`` (e.g. the n highest-quality docs per
    domain — the quota-cap shape of stages/sampling.stratified_sample
    generalized to arbitrary rank columns). Any group's global top-n
    row is in its block's per-group top-n, so the per-block partial
    bounds the one grouped shuffle at n × groups × blocks rows.
    Include a unique tiebreak column in ``keys`` for determinism
    (every in-repo caller does)."""
    import pandas as pd

    ascending = [not d for d in descending]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = (df.sort_values(keys, ascending=ascending, kind="mergesort")
              .groupby(group_col, sort=False, dropna=False).head(n))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(keys, ascending=ascending,
                              kind="mergesort").head(n))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(final, batch_format="pandas"))
