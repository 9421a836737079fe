"""Distributed sketches as native Ray Data aggregates (scale additions).

At 100 TB, exact DISTINCT/heavy-hitter queries are all-to-all shuffles of
every key; sketches reduce them to fixed-size mergeable state that flows
through Ray's standard map-combine/reduce aggregation machinery:

- ``HllDistinct``: HyperLogLog distinct count (Flajolet et al. 2007,
  the standard 2^p-register construction with the small-range linear
  counting correction). Register arrays merge by elementwise max —
  associative and commutative, so Ray's per-block partial aggregation +
  combine tree gives exact sketch semantics at any parallelism.
- ``CountMinTopK``: Count-Min sketch (Cormode & Muthukrishnan 2005) with
  a bounded candidate heap for heavy hitters. Depth x width counter
  matrix merges by elementwise sum; candidate sets union with re-estimate.

Both use the repo's process-stable hash kernels (no salted ``hash``), so
results are deterministic across workers, retries and parallelism —
property-tested against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import AggregateFnV2

from ..functions.hashing import fast_hash64, stable_hash64


def _col_hashes(block, column: str) -> np.ndarray:
    """Column values -> stable uint64 hashes (vectorized over the block)."""
    if isinstance(block, pa.Table):
        vals = block[column].to_pylist()
    else:  # pandas
        vals = block[column].tolist()
    return np.fromiter((fast_hash64(str(v)) for v in vals),
                       dtype=np.uint64, count=len(vals))


def hll_update(regs: np.ndarray, h: np.ndarray, p: int) -> None:
    """Update HLL registers in place from 63-bit ``fast_hash64`` values.

    fast_hash64 yields 63-bit values (top bit always 0), so the register
    index must come from the top of the 63 USABLE bits — ``h >> (64-p)``
    would leave bit p-1 always 0 and touch only half the registers,
    saturating the estimate at ~m*ln2. Shared by HllDistinct and the
    column profiler (stages/profile.py) so the subtle bit math lives in
    exactly one place.
    """
    if not len(h):
        return
    idx = (h >> np.uint64(63 - p)).astype(np.int64)
    rest = h << np.uint64(p + 1)  # remaining 63-p bits at top
    # rank = leading zeros of the remaining 63-p bits, + 1
    lz = np.full(len(h), 63 - p, dtype=np.int64)
    nonzero = rest != 0
    if nonzero.any():
        # float64 log2 is exact for leading-zero counts of u64
        bits = np.floor(np.log2(rest[nonzero].astype(np.float64)))
        lz[nonzero] = 63 - bits.astype(np.int64)
    rank = np.minimum(lz + 1, 63 - p + 1).astype(np.int8)
    np.maximum.at(regs, idx, rank)


def hll_estimate(regs: np.ndarray) -> int:
    """HLL estimate with the small-range linear-counting correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return int(round(est))


class HllDistinct(AggregateFnV2):
    """Approximate COUNT(DISTINCT col) via HyperLogLog.

    State: int8 register array of size 2^p (p=12 -> 4 KiB, ~1.6% rel.
    error). Usage::

        ds.aggregate(HllDistinct(on="user_id"))
        ds.groupby("event_type").aggregate(HllDistinct(on="user_id"))
    """

    def __init__(self, on: str, p: int = 12,
                 alias_name: str | None = None):
        self._p = p
        self._m = 1 << p
        super().__init__(alias_name or f"hll_distinct({on})",
                         zero_factory=lambda m=self._m: np.zeros(
                             m, dtype=np.int8),
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block):
        h = _col_hashes(block, self.get_target_column())
        regs = np.zeros(self._m, dtype=np.int8)
        hll_update(regs, h, self._p)
        return regs

    def combine(self, a, b):
        return np.maximum(a, b)

    def finalize(self, regs) -> int:
        return hll_estimate(regs)


class BottomKSample(AggregateFnV2):
    """Deterministic uniform sample of DISTINCT values via bottom-k
    hashing (a.k.a. KMV): keep the k values with the smallest stable
    hashes. Merge = union + re-trim — associative, so the sample is
    IDENTICAL at any parallelism, under retries, and across runs (unlike
    reservoir sampling, which needs RNG state). The k-th smallest hash
    also yields a distinct-count estimate (KMV estimator: (k-1) / h_k
    normalized to the hash range).

    Usage: ``ds.aggregate(BottomKSample(on="doc_id", k=100))`` ->
    {"sample": [...k values...], "distinct_estimate": int}.
    """

    def __init__(self, on: str, k: int = 64, seed: int = 0,
                 alias_name: str | None = None):
        self._k = k
        self._seed = seed
        super().__init__(alias_name or f"bottomk({on})",
                         zero_factory=list,  # [(hash, value)] sorted
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block):
        col = self.get_target_column()
        if isinstance(block, pa.Table):
            vals = block[col].to_pylist()
        else:
            vals = block[col].tolist()
        pairs = {(fast_hash64(str(v), self._seed), v) for v in vals}
        return sorted(pairs)[:self._k]

    def combine(self, a, b):
        # accumulators may round-trip through block serialization, which
        # turns tuples into lists — normalize before the set union
        merged = {tuple(p) for p in a} | {tuple(p) for p in b}
        return sorted(merged)[:self._k]

    def finalize(self, state):
        state = [tuple(p) for p in state]
        sample = [v for _, v in state]
        est = len(sample)
        if len(state) == self._k and state:
            # KMV: k-th smallest of n uniform hashes ~ k/(n+1) of range
            h_k = state[-1][0] / float(2 ** 63)
            if h_k > 0:
                est = int(round((self._k - 1) / h_k))
        return {"sample": sample, "distinct_estimate": est}


def train_val_split(ds, val_frac: float, key_col: str, seed: int = 0):
    """Deterministic hash split: (train_ds, val_ds). Rows route by
    ``fast_hash64(key) % 10_000`` so the assignment is stable across
    runs, retries and cluster sizes, and all rows sharing a key land on
    the same side (no leakage between splits for grouped data)."""
    import pyarrow.compute as pc

    cut = int(round(val_frac * 10_000))

    def side(want_val: bool):
        def fn(t: pa.Table) -> pa.Table:
            buckets = pa.array(
                [fast_hash64(str(v), seed) % 10_000
                 for v in t[key_col].to_pylist()], pa.int64())
            mask = pc.less(buckets, pa.scalar(cut))
            if not want_val:
                mask = pc.invert(mask)
            return t.filter(mask)

        return fn

    return (ds.map_batches(side(False), batch_format="pyarrow"),
            ds.map_batches(side(True), batch_format="pyarrow"))


class CountMinTopK(AggregateFnV2):
    """Heavy hitters via a Count-Min sketch + candidate heap.

    State: (depth x width int64 counters, {candidate: estimate}). The
    counter matrix merges by elementwise sum (exact CM semantics); the
    candidate dict unions and re-estimates against the merged counters,
    keeping the ``max_candidates`` largest. Finalize returns the top-k
    [(value, estimated_count), ...] sorted by (-count, value).

    CM guarantees estimate >= true count, with overestimate bounded by
    eps * N at confidence 1 - delta for width=ceil(e/eps), depth=
    ceil(ln(1/delta)).
    """

    def __init__(self, on: str, k: int = 10, width: int = 2048,
                 depth: int = 4, max_candidates: int = 256,
                 alias_name: str | None = None):
        self._k = k
        self._w = width
        self._d = depth
        self._cap = max_candidates
        # one odd multiplier per depth row, derived from the row index so
        # ANY depth works (a fixed 6-constant table silently truncated
        # depth > 6 and then crashed in aggregate_block)
        self._mults = np.array(
            [stable_hash64(f"cm-row-{d}") | 1 for d in range(depth)],
            dtype=np.uint64)
        super().__init__(alias_name or f"cm_topk({on})",
                         zero_factory=lambda d=depth, w=width: (
                             np.zeros((d, w), dtype=np.int64), {}),
                         on=on, ignore_nulls=True)

    def _rows(self, h: np.ndarray) -> np.ndarray:
        # one independent row index per depth: mix with per-row odd
        # multipliers (see __init__)
        return ((h[None, :] * self._mults[:, None]) >> np.uint64(40)).astype(
            np.int64) % self._w

    def _estimate(self, counters: np.ndarray, value: str) -> int:
        h = np.array([fast_hash64(value)], dtype=np.uint64)
        rows = self._rows(h)[:, 0]
        return int(counters[np.arange(self._d), rows].min())

    def aggregate_block(self, block):
        col = self.get_target_column()
        if isinstance(block, pa.Table):
            vals = [str(v) for v in block[col].to_pylist()]
        else:
            vals = [str(v) for v in block[col].tolist()]
        counters = np.zeros((self._d, self._w), dtype=np.int64)
        if vals:
            h = np.fromiter((fast_hash64(v) for v in vals),
                            dtype=np.uint64, count=len(vals))
            rows = self._rows(h)
            for d in range(self._d):
                np.add.at(counters[d], rows[d], 1)
        cands: dict[str, int] = {}
        for v in set(vals):
            cands[v] = self._estimate(counters, v)
        if len(cands) > self._cap:
            cands = dict(sorted(cands.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:self._cap])
        return counters, cands

    def combine(self, a, b):
        counters = a[0] + b[0]
        cands = {}
        for v in set(a[1]) | set(b[1]):
            cands[v] = self._estimate(counters, v)
        if len(cands) > self._cap:
            cands = dict(sorted(cands.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:self._cap])
        return counters, cands

    def finalize(self, state):
        counters, cands = state
        ranked = sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))
        return [[v, int(c)] for v, c in ranked[:self._k]]
