"""Budget-bounded best-first selection WITHOUT a global sort (scale
addition — the "fill a 10B-token budget with the highest-quality
docs" step of a training pipeline; the reference has no budget
surface, its nearest analogue is top-k retrieval truncation).

Semantics (exact, deterministic): rows ordered by
(score desc|asc, id asc); keep every row whose RUNNING weight total,
itself included, is <= budget. SQL oracle:

    QUALIFY SUM(weight) OVER (ORDER BY score DESC, id
                              ROWS UNBOUNDED PRECEDING) <= budget

The naive dataflow is sort-everything + prefix-scan — a full
all-to-all range shuffle of the corpus just to find one cutoff.
Instead this searches for the cutoff value directly:

1. one streaming pass: per-batch (min, max) of score → global range
   (a tiny driver reduce);
2. one streaming pass: per-batch histogram of weight sums over
   ``num_bins`` equal score bins → the driver merges bins×blocks
   partial rows and walks the cumulative from the best side to find
   the CROSSING BIN (all better bins fit the budget, adding the
   crossing bin overflows);
3. the [lo, hi) score range narrows to the crossing bin and step 2
   repeats until the candidate rows inside the range fit
   ``refine_cap``, then ONE bounded ``take_all`` sorts the crossing
   slice exactly (score, id) and finds the per-row cutoff pair;
4. one streaming filter keeps rows strictly better than the range
   plus the in-range rows up to the cutoff pair.

Every pass is map-only; the only driver state is num_bins partial
sums and the final <= refine_cap crossing slice. Ties are exact: rows
with EQUAL score land in one bin and the cutoff pair (score, id)
resolves them row-by-row. Degenerate spike (one score value carrying
everything) stops narrowing — detected and sent straight to the exact
slice, which is then bounded by refine_cap or raises with guidance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _minmax(ds, col: str):
    def partial(t: pa.Table) -> pa.Table:
        v = t[col]
        return pa.table({"lo": [pc.min(v).as_py()],
                         "hi": [pc.max(v).as_py()]})

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = agg.dropna()
    if agg.empty:
        return None, None
    return float(agg["lo"].min()), float(agg["hi"].max())


def take_until_budget(ds, score_col: str, weight_col: str, budget: float,
                      id_col: str, descending: bool = True,
                      num_bins: int = 4096, refine_cap: int = 2_000_000):
    """Dataset of the selected rows (see module doc for the exact
    contract). ``descending=True`` = larger score is better.

    NULL/NaN scores are never selected (they compare false in every
    pass) — DuckDB's default ORDER BY puts NULLs last, so the oracle
    only diverges when the budget outlives every non-null row; filter
    nulls out first if they must participate."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    lo, hi = _minmax(ds, score_col)
    if lo is None:
        return ds.limit(0)

    sign = -1.0 if descending else 1.0

    # work in "ascending badness" space: key = sign * score
    klo, khi = (sign * hi, sign * lo) if descending else (lo, hi)

    def hist_pass(a: float, b: float):
        """Weight-sum histogram of rows with key in [a, b] over
        num_bins bins, plus row counts. Returns (w_sums, n_rows)."""
        span = (b - a) or 1.0

        def partial(t: pa.Table) -> pa.Table:
            k = sign * t[score_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            w = t[weight_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            m = (k >= a) & (k <= b)
            if not m.any():
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            idx = np.minimum(((k[m] - a) / span * num_bins)
                             .astype(np.int64), num_bins - 1)
            ww = np.bincount(idx, weights=w[m], minlength=num_bins)
            nn = np.bincount(idx, minlength=num_bins)
            nz = np.nonzero(nn)[0]
            return pa.table({"bin": pa.array(nz, pa.int64()),
                             "w": pa.array(ww[nz], pa.float64()),
                             "n": pa.array(nn[nz], pa.int64())})

        from ray.data.aggregate import Sum

        # combine bin partials with a (tiny, map-side-combined) Ray
        # aggregate so the driver receives <= num_bins rows — raw
        # partials are bins x blocks rows, which at corpus block
        # counts is itself a dataset
        parts = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("bin")
                 .aggregate(Sum("w", alias_name="w"),
                            Sum("n", alias_name="n"))
                 .to_pandas())
        w_sums = np.zeros(num_bins)
        n_rows = np.zeros(num_bins, dtype=np.int64)
        if len(parts):
            idx_ = parts["bin"].to_numpy(np.int64)
            w_sums[idx_] = parts["w"].to_numpy()
            n_rows[idx_] = parts["n"].to_numpy()
        return w_sums, n_rows

    # narrow [a, b] to the crossing bin until candidates fit refine_cap
    a, b = klo, khi
    spent_before = 0.0  # exact weight of rows strictly better than [a, b]
    while True:
        w_sums, n_rows = hist_pass(a, b)
        cum = spent_before + np.cumsum(w_sums)
        over = np.nonzero(cum > budget)[0]
        if len(over) == 0:
            # histogram says everything in range fits — VERIFY with the
            # exact filter comparison (k <= b) before the blanket keep:
            # float bin boundaries can leak a boundary row out of the
            # histogram, and the keep-all path has no later exact pass
            # to catch it. On the (1-ulp) mismatch, fall through to the
            # exact-slice machinery over the current range.
            def upto(t: pa.Table) -> pa.Table:
                k = sign * t[score_col].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                w = t[weight_col].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                return pa.table({"w": [float(w[k <= b].sum())]})

            exact = float(ds.map_batches(upto, batch_format="pyarrow")
                          .to_pandas()["w"].sum())
            if exact <= budget:
                return _filter_selected(ds, score_col, id_col, sign, b,
                                        None, None)
            break  # budget exhausts inside [a, b]: exact slice below
        cross = int(over[0])
        spent_before = float(cum[cross] - w_sums[cross])
        n_cross = int(n_rows[cross])
        span = (b - a) or 1.0
        na = a + cross * span / num_bins
        nb = a + (cross + 1) * span / num_bins if cross < num_bins - 1 \
            else b
        if n_cross <= refine_cap:
            a, b = na, nb
            break
        if nb - na <= 0 or (na == a and nb == b):
            raise ValueError(
                f"score spike: {n_cross} rows share one score bin that "
                f"cannot narrow further; raise refine_cap above "
                f"{n_cross} to sort the slice exactly")
        a, b = na, nb

    # recompute spent_before EXACTLY with the comparison the final
    # filter uses (k < a): the float bin boundaries can disagree with
    # that comparison by one ulp, and a row miscounted between
    # "strictly better" and "in slice" would silently shift the
    # cutoff. (Weight sums are float64: exact for the integer-valued
    # weights — token counts — this operator is for.)
    def below(t: pa.Table) -> pa.Table:
        k = sign * t[score_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"w": [float(w[k < a].sum())]})

    spent_before = float(
        ds.map_batches(below, batch_format="pyarrow")
        .to_pandas()["w"].sum())

    # exact pass over the crossing slice (bounded by refine_cap)
    def in_range(t: pa.Table) -> pa.Table:
        k = pc.multiply(pc.cast(t[score_col], pa.float64()),
                        pa.scalar(sign))
        m = pc.and_(pc.greater_equal(k, pa.scalar(a)),
                    pc.less_equal(k, pa.scalar(b)))
        cols = list(dict.fromkeys([score_col, weight_col, id_col]))
        return t.filter(m).select(cols)

    slice_ds = ds.map_batches(in_range,
                              batch_format="pyarrow").materialize()
    n_slice = slice_ds.count()
    if n_slice > refine_cap:
        raise ValueError(
            f"crossing slice holds {n_slice} rows > refine_cap "
            f"{refine_cap}; raise refine_cap (driver sorts this slice "
            f"exactly) or num_bins")
    slice_df = slice_ds.to_pandas()
    if slice_df.empty:
        return _filter_selected(ds, score_col, id_col, sign, a, None, b)
    slice_df["_k"] = sign * slice_df[score_col].astype(float)
    # drop rows strictly better than the slice start (handled by the
    # strict filter) — only keys in [a, b] remain by construction
    slice_df = slice_df.sort_values(["_k", id_col],
                                    kind="mergesort",
                                    ignore_index=True)
    run = spent_before + slice_df[weight_col].astype(float).cumsum()
    kept = slice_df[run <= budget]
    if kept.empty:
        cutoff = None
    else:
        last = kept.iloc[-1]
        cutoff = (float(last["_k"]), last[id_col])
    return _filter_selected(ds, score_col, id_col, sign, a, cutoff, b)


def _filter_selected(ds, score_col: str, id_col: str, sign: float,
                     range_lo: float, cutoff, range_hi=None):
    """Keep rows with key < range_lo (strictly better than the crossing
    slice), plus in-slice rows at-or-before the (key, id) cutoff pair."""

    def fil(t: pa.Table) -> pa.Table:
        k = np.asarray(pc.multiply(pc.cast(t[score_col], pa.float64()),
                                   pa.scalar(sign)))
        if range_hi is None:   # whole range fits: keep key <= range_lo
            keep = k <= range_lo
        else:
            keep = k < range_lo
            if cutoff is not None:
                ck, cid = cutoff
                ids = t[id_col].to_numpy(zero_copy_only=False)
                in_slice = (k >= range_lo) & (k <= range_hi)
                better = k < ck
                at = (k == ck) & (ids <= cid)
                keep = keep | (in_slice & (better | at))
        return t.filter(pa.array(keep))

    return ds.map_batches(fil, batch_format="pyarrow")
