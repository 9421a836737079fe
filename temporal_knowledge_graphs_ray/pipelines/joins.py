"""Temporal joins Ray Data lacks natively: AS-OF and RANGE joins.

Both are the SURVEY's "custom operator" pattern (a) — a composition of
map_batches + bucketed groupby().map_groups with a documented
partitioning assumption:

- the join key set is hash-bucketed (uniform, no skew by construction);
  ALL rows of one key land in one bucket, so per-bucket pandas kernels
  (`pd.merge_asof`, interval filters) see complete key groups;
- within a bucket the kernel sorts by timestamp — correct because
  as-of/range semantics are per-key and keys never span buckets;
- salting applies if one key dominates (hot-key caveat documented, not
  needed for hash-keyed buckets).

Checked against DuckDB's native ASOF JOIN / BETWEEN join in
tests/test_temporal_joins.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _role_union(left_ds, right_ds, key: str, num_buckets: int):
    """Two datasets -> one bucketed dataset with a __role marker and the
    superset schema (missing columns null-filled)."""
    def _pa_type(t) -> pa.DataType:
        # pandas-backed datasets report python/numpy types in
        # schema().types (object for strings); normalize to Arrow
        if isinstance(t, pa.DataType):
            return t
        if t in (object, str):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    fields: list[tuple[str, pa.DataType]] = []
    seen = set()
    for names, types in ((l_schema.names, l_schema.types),
                         (r_schema.names, r_schema.types)):
        for n, t in zip(names, types):
            if n not in seen:
                seen.add(n)
                fields.append((n, _pa_type(t)))

    key_type = dict(fields)[key]

    def conv(role: int):
        def fn(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for n, typ in fields:
                if n in t.column_names:
                    arrays.append(t[n].cast(typ).combine_chunks())
                else:
                    arrays.append(pa.nulls(len(t), typ))
                names.append(n)
            arrays.append(pa.array([role] * len(t), pa.int8()))
            names.append("__role")
            # hash the key AFTER the unifying cast: the raw column's
            # repr differs across dtypes (str(1) != str(1.0)), so equal
            # keys on int64/float64 sides would land in different
            # buckets and silently never join
            key_vals = t[key].cast(key_type).to_pylist() if len(t) else []
            h = pd.util.hash_array(
                np.asarray([str(v) for v in key_vals], dtype=object),
                categorize=False) % num_buckets
            arrays.append(pa.array(h.astype("int32")))
            names.append("__bucket")
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    return (left_ds.map_batches(conv(0), batch_format="pyarrow")
            .union(right_ds.map_batches(conv(1), batch_format="pyarrow")))


def asof_join(left_ds, right_ds, *, on: str, by: str,
              direction: str = "backward", suffix: str = "_right",
              num_buckets: int = 64):
    """For every left row, attach the latest right row with the same
    ``by`` key whose ``on`` timestamp is <= the left row's (backward; or
    the earliest >= for forward) — the classic point-in-time join.

    Returns a Dataset with the left columns plus the right payload
    columns (suffixed on collision, ``on`` suffixed always).
    """
    l_cols = list(left_ds.schema().names)
    r_cols = list(right_ds.schema().names)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = (g[g["__role"] == 0][l_cols]
                .sort_values([on, by], kind="mergesort",
                             ignore_index=True))
        right = (g[g["__role"] == 1][r_cols]
                 .sort_values([on, by], kind="mergesort",
                              ignore_index=True))
        # NOTE: no early return on empty sides — a bare pd.DataFrame()
        # has zero columns, which breaks Ray's block-schema unification
        # when a bucket holds only right-side rows. Empty slices of `g`
        # keep the full typed column set, so the merge below yields a
        # typed empty frame with the exact output schema.
        # merge_asof drops the right side's `on` column — carry the
        # matched timestamp explicitly (point-in-time audits need it)
        right = right.assign(**{on + suffix: right[on]})
        out = pd.merge_asof(left, right, on=on, by=by,
                            direction=direction,
                            suffixes=("", suffix))
        return out

    return (
        _role_union(left_ds, right_ds, by, num_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def range_join(left_ds, right_ds, *, on: str, by: str,
               start: str, end: str, suffix: str = "_right",
               num_buckets: int = 64):
    """Interval containment join: left rows pair with every right row of
    the same ``by`` key whose [start, end] interval contains the left
    ``on`` timestamp (start inclusive, end inclusive). 1 -> N output."""
    l_cols = list(left_ds.schema().names)
    r_cols = list(right_ds.schema().names)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__role"] == 0][l_cols]
        right = g[g["__role"] == 1][r_cols]
        # empty sides flow through the merge: slices of `g` are fully
        # typed, so the output keeps the complete column set (a bare
        # pd.DataFrame() would break block-schema unification)
        m = left.merge(right, on=by, suffixes=("", suffix))
        on_col = on if on in m.columns else on + suffix
        # start/end are RIGHT columns: when the left side carries a
        # same-named column, the merge suffixes the right copy — reading
        # m[start] would then filter on the LEFT column silently
        s_col = start + suffix if start in left.columns else start
        e_col = end + suffix if end in left.columns else end
        keep = (m[s_col] <= m[on_col]) & (m[on_col] <= m[e_col])
        return m[keep]

    return (
        _role_union(left_ds, right_ds, by, num_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
