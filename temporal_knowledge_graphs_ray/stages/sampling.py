"""Deterministic corpus sampling (scale additions — data-mixing
primitives for training-data curation; the reference has no sampling
surface, its nearest analogue is the eval split in
scripts/evaluate_tkg.py).

Both operators key the decision on ``md5(seed|key)`` — the ONE stable
hash both this engine and DuckDB compute byte-identically — so every
sample has an exact SQL oracle (``md5(concat(...))`` + string compare /
``row_number() OVER (... ORDER BY md5, key)``), and membership is a pure
function of the row: re-runs, retries and different block layouts make
the same choices, rows can be re-attributed to their sample without
storing state, and disjoint seeds give independent samples.

Scale notes: ``sample_fraction`` is a pure streaming filter (no
shuffle). ``stratified_sample`` quota-caps per group with the house
partial-top-k shape — each block keeps at most n rows PER GROUP before
the single grouped shuffle, so shuffle volume is bounded by
n x groups x blocks regardless of corpus size (the md5 ranking makes
any block's survivors a superset-safe candidate set: a global
per-group top-n row is necessarily in its block's per-group top-n).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_hex


def _md5_rank(keys, seed: int) -> list[str]:
    out = []
    for k in keys:
        if k is None:
            # a NULL key would hash as the literal string 'None' here
            # while the SQL oracle's md5(concat(...)) yields NULL and
            # excludes the row — refuse rather than silently diverge
            # from the advertised exact-membership contract
            raise ValueError("sampling key column contains NULL")
        out.append(md5_hex(f"{seed}|{k}"))
    return out


def fraction_threshold_hex(frac: float) -> str:
    """32-hex-digit threshold such that md5 < threshold keeps ~``frac``
    of uniformly-hashed keys. Lexicographic compare of equal-length hex
    strings equals numeric compare, so DuckDB's
    ``md5(x) < '<threshold>'`` is the exact oracle."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if frac == 1.0:
        # int(16**32) formats to 33 hex digits, which breaks the
        # equal-length lexicographic compare; 'g' > any hex digit, so
        # every md5 sorts below it (in SQL too)
        return "g" * 32
    return format(int(frac * 16**32), "032x")


def sample_fraction(ds, frac: float, key_col: str, seed: int = 0):
    """Keep ~``frac`` of rows: md5(seed|key) < threshold. Streaming
    filter, no shuffle; exact-membership SQL oracle (see module doc)."""
    thresh = fraction_threshold_hex(frac)

    def keep(t: pa.Table) -> pa.Table:
        h = _md5_rank(t[key_col].to_pylist(), seed)
        mask = pa.array([x < thresh for x in h], pa.bool_())
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, n_per_group: int, key_col: str,
                      seed: int = 0):
    """Exact per-group quota: the ``n_per_group`` rows with the smallest
    (md5(seed|key), key) rank in each group — data-mixing quotas
    (per-language / per-domain caps) as one bounded grouped shuffle.

    Oracle: ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY
    md5(concat(seed, '|', key)), key) <= n``.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_rank"] = _md5_rank(t[key_col].to_pylist(), seed)
        df = (df.sort_values(["_rank", key_col], kind="mergesort")
              .groupby(group_col, sort=False, dropna=False)
              .head(n_per_group))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["_rank", key_col], kind="mergesort")
                .head(n_per_group).drop(columns=["_rank"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(final, batch_format="pandas"))
