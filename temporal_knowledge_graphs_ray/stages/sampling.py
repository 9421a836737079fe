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


def _md5_uniform(keys, seed: int) -> np.ndarray:
    """Deterministic uniform(0,1) draw per key: the first 13 hex digits
    of md5(seed|key) as a base-16 fraction, plus half an ulp of the
    13-digit grid so u is never exactly 0. The DuckDB oracle expression
    sums digit-by-digit left-to-right; every partial sum there is an
    exact dyadic n/16^i with n < 2^52, so the whole sum is EXACTLY
    n_13/16^13 with no rounding anywhere — computed here as one int
    parse times the exact power-of-two 16^-13 (bit-identical to the
    oracle's sum, one float op per key instead of 13).
    """
    hexes = _md5_rank(keys, seed)
    ints = np.fromiter((int(h[:13], 16) for h in hexes),
                       dtype=np.float64, count=len(hexes))
    return (ints + 0.5) * 16.0 ** -13


def weighted_sample_uniform_sql(key_expr: str, seed: int) -> str:
    """The DuckDB expression computing exactly ``_md5_uniform`` for a
    key column expression (used by the oracle SQL and the tests)."""
    return (
        f"list_sum(list_transform(range(1, 14), i -> "
        f"(strpos('0123456789abcdef', md5({seed} || '|' || {key_expr})[i]) - 1)"
        f" * power(16.0, -i))) + 0.5 * power(16.0, -13)"
    )


def weighted_sample(ds, k: int, weight_col: str, key_col: str,
                    seed: int = 0):
    """Weighted sampling WITHOUT replacement: the k rows with the
    largest ``u^(1/w)`` rank, u = md5-uniform per key (Efraimidis &
    Spirakis 2006, algorithm A) — each row's inclusion probability is
    proportional to its weight among the remaining rows, and the whole
    draw is a pure function of (seed, key, weight): retries, re-runs
    and block layouts agree, and the draw has an exact SQL oracle.

    Ranking uses the monotone-equivalent ``ln(u)/w`` (descending; ln u
    is negative so dividing by a larger weight moves the rank toward 0
    = better), avoiding ``pow`` whose libm rounding differs across
    implementations more often than ``ln``'s. Ties (possible only for
    duplicate keys) break by key.

    Scale: rank is a streaming column; selection is the house partial
    top-k (per-block top-k, then sort+limit over k x blocks survivors)
    — no global sort of the corpus. Oracle:
    ``ORDER BY ln(u)/weight DESC, key LIMIT k`` with u per
    ``weighted_sample_uniform_sql``.
    """
    from .topk import topk_rows

    def rank(t: pa.Table) -> pa.Table:
        w = np.asarray(t[weight_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        if len(w) and (not np.all(np.isfinite(w)) or (w <= 0).any()):
            raise ValueError("weighted_sample requires finite weights > 0")
        u = _md5_uniform(t[key_col].to_pylist(), seed)
        return t.append_column("_wrank", pa.array(np.log(u) / w,
                                                  pa.float64()))

    ranked = ds.map_batches(rank, batch_format="pyarrow")
    top = topk_rows(ranked, ["_wrank", key_col], [True, False], k)
    return top.drop_columns(["_wrank"])


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
