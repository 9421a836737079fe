"""Distributed quantiles (scale additions; no reference counterpart).

Two paths, matching the two shapes a 100 TB column can have:

- ``exact_quantiles``: EXACT discrete quantiles (DuckDB ``quantile_disc``
  semantics — the value at rank ``max(ceil(q*n), 1)``) for columns of
  BOUNDED cardinality (quantities, scores, ratings, bucketed sizes).
  One map-side ``group_by(col).count`` per batch collapses each block to
  its distinct values, a tiny global groupby-sum merges them, and the
  rank walk happens on the distinct-value table — data volume after the
  first pass is O(distinct values), never O(rows), so a 100 TB column
  with a few thousand distinct values costs one streaming pass + a
  small shuffle.  Tested for exact equality against DuckDB
  ``quantile_disc`` (tests/test_quantiles.py).

- ``ApproxQuantile``: quantiles of UNBOUNDED/continuous columns via a
  deterministic bottom-k ROW sample (hash the row's unique key, keep the
  k rows with smallest hashes, carry the value).  Same KMV machinery as
  ``BottomKSample`` (stages/sketches.py) but sampling ROWS (uniform over
  the table) rather than distinct values, so the sample quantile
  estimates the population quantile with the usual order-statistic
  error O(sqrt(q(1-q)/k)).  Merge = union + re-trim: associative and
  commutative, so the estimate is IDENTICAL at any parallelism, under
  retries, and across runs — unlike t-digest, whose centroids are
  merge-order-dependent.  Error bound and parallelism invariance are
  property-tested.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from ray.data.aggregate import AggregateFnV2

from ..functions.hashing import hash64_vec


def _disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc rank (1-based): max(ceil(q*n), 1)."""
    return max(int(math.ceil(q * n)), 1)


def exact_quantiles(ds, col: str, qs: list[float],
                    by: str | None = None):
    """Exact discrete quantiles of ``col``, optionally grouped by ``by``.

    Returns a pandas DataFrame with columns ``(by?, q, value)``, ordered
    by (by, q).  Scale contract: the post-combine table is one row per
    distinct (by, col) value — the caller asserts bounded cardinality by
    choosing this path (use ``ApproxQuantile`` otherwise).
    """
    import pandas as pd
    import pyarrow.compute as pc

    keys = ([by] if by else []) + [col]

    def partial_counts(t: pa.Table) -> pa.Table:
        t = t.select(keys)
        # DuckDB quantile_disc ignores NULL values (while GROUP BY keeps
        # NULL groups — handled at the walk below with dropna=False)
        t = t.filter(pc.is_valid(t[col]))
        return t.group_by(keys).aggregate([([], "count_all")])

    # large batches: the partial is a single-column-ish Arrow group_by —
    # cheap per row, so fewer/bigger tasks beat scheduling overhead
    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       batch_size=65536)
        .groupby(keys).sum("count_all")
    )
    # one row per distinct value — small by contract; sorted walk on the
    # driver (the only driver-resident state is the distinct-value table)
    df = counts.to_pandas().rename(columns={"sum(count_all)": "cnt"})
    if df.empty:  # empty/all-null input: the aggregate yields no columns
        empty = {"q": pd.Series([], dtype="float64"),
                 "value": pd.Series([], dtype="object")}
        if by:
            empty = {by: pd.Series([], dtype="object"), **empty}
        return pd.DataFrame(empty)
    df = df.sort_values(keys, ignore_index=True)

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g[col].to_numpy()
        rows = []
        for q in qs:
            rank = _disc_rank(q, n)
            rows.append((q, vals[int(np.searchsorted(cum, rank))]))
        return pd.DataFrame(rows, columns=["q", "value"])

    if by:
        # dropna=False: DuckDB GROUP BY keeps the NULL group (only the
        # quantile VALUES ignore nulls)
        out = (df.groupby(by, sort=True, dropna=False)
               .apply(walk, include_groups=False)
               .reset_index(level=0).reset_index(drop=True))
        return out[[by, "q", "value"]]
    return walk(df)


class ApproxQuantile(AggregateFnV2):
    """Approximate quantiles via a deterministic bottom-k row sample.

    ``key`` must be a row-unique column (doc_id, url, a composite id):
    the k rows with the smallest ``hash64_vec(key)`` (vectorized SipHash,
    functions/hashing.py) form a uniform simple random sample of the
    table, independent of blocking.  State is a sorted list of
    (hash, value) pairs, capped at k.  Null AND NaN values are excluded
    (NaN explicitly: pandas blocks deliver float nulls as NaN, which
    would otherwise sort last and corrupt high quantiles — and NaN != NaN
    defeats the combine()-side tuple dedup).

    Usage::

        ds.aggregate(ApproxQuantile(on="score", key="doc_id",
                                    qs=[0.5, 0.9], k=4096))
        # -> {"approx_quantile(score)": {0.5: ..., 0.9: ...}}
    """

    def __init__(self, on: str, key: str, qs: list[float],
                 k: int = 4096, seed: int = 0,
                 alias_name: str | None = None):
        self._key = key
        self._on_col = on
        self._qs = list(qs)
        self._k = k
        self._seed = seed
        # on=None on purpose: the aggregate reads TWO columns (value +
        # row key), and Ray prunes blocks down to get_target_column()
        # when it is set; None disables pruning (nulls handled below)
        super().__init__(alias_name or f"approx_quantile({on})",
                         zero_factory=list, on=None, ignore_nulls=False)

    def aggregate_block(self, block):
        col = self._on_col
        if isinstance(block, pa.Table):
            vals = block[col].to_pylist()
            keys = block[self._key].to_pylist()
        else:
            vals = block[col].tolist()
            keys = block[self._key].tolist()
        hs = hash64_vec(keys, self._seed)
        pairs = sorted(
            (int(h), v) for h, v in zip(hs, vals)
            if v is not None and v == v)  # v == v filters NaN
        return pairs[:self._k]

    def combine(self, a, b):
        merged = sorted({tuple(p) for p in a} | {tuple(p) for p in b})
        return merged[:self._k]

    def finalize(self, state):
        vals = np.sort(np.asarray([v for _, v in state]))
        n = len(vals)
        if n == 0:
            return {q: None for q in self._qs}
        return {q: vals[_disc_rank(q, n) - 1].item() for q in self._qs}
