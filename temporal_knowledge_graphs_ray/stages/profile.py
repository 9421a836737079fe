"""Dataset profiling and expectation validation (scale additions — the
data-quality surface of a production ingest pipeline; the reference's
nearest analogues are the ad-hoc dataset stats in
scripts/analyze_ectsum.py and the run-stats counters, neither of which
profiles arbitrary columns).

``profile_columns`` computes, in ONE streaming pass over the corpus, a
per-column profile: row/null counts, min/max, numeric moments
(mean/std), string length stats, an APPROXIMATE distinct count
(HyperLogLog — the same 63-bit-aware register math as
stages/sketches.HllDistinct) and the EXACT top-k most frequent values
(per-block value counts with a bounded candidate set, merged by sum —
exact whenever a column's distinct count stays under the candidate cap,
flagged ``topk_exact=False`` otherwise instead of silently degrading).
State flows through Ray's native ``AggregateFnV2`` map-combine tree, so
the pass is parallelism-invariant for every exact field and
merge-correct for the sketches — the corpus is never shuffled and the
driver sees one bounded accumulator.

``validate_expectations`` turns a rule dict into one vectorized filter
pass returning per-rule violation counts plus up to ``sample`` example
rows per rule (not_null / unique / min / max / regex / in_set /
str_len). Uniqueness is the one rule that genuinely needs a shuffle; it
runs as the house fingerprint→groupby count (exact), everything else
streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import AggregateFnV2

from ..functions.hashing import fast_hash64

from .sketches import hll_estimate, hll_update

_HLL_P = 12
_HLL_M = 1 << _HLL_P

_NAN = float("nan")


def _canon_key(v):
    """Canonical dict key: every float NaN maps to ONE module-level NaN
    object. NaN hashes by identity on CPython 3.10+, so NaN keys arriving
    from different pickled partials would otherwise never merge —
    inflating the exact 'distinct' and duplicating nan in topk (the same
    hazard quantiles.ApproxQuantile documents)."""
    return _NAN if isinstance(v, float) and v != v else v


def _col_state() -> dict:
    return {
        "n": 0, "nulls": 0,
        "min": None, "max": None,
        "num_sum": 0.0, "num_sumsq": 0.0, "is_numeric": None,
        "len_sum": 0,
        "hll": np.zeros(_HLL_M, dtype=np.int8),
        "counts": {},           # value -> exact count (bounded)
        "counts_overflow": False,
    }


def _merge_minmax(state: dict, lo, hi) -> None:
    if lo is None:
        return
    state["min"] = lo if state["min"] is None else min(state["min"], lo)
    state["max"] = hi if state["max"] is None else max(state["max"], hi)


class ProfileAggregate(AggregateFnV2):
    """One-pass multi-column profile accumulator. Usage::

        prof = ds.aggregate(ProfileAggregate(columns=[...]))["profile"]

    Accumulator state travels between map and combine as pickled bytes:
    the raw dict holds numpy registers and value-keyed count dicts that
    Arrow cannot represent natively, and letting Ray's block layer
    discover that per partial (its pickle fallback) logs a warning per
    block and re-infers the schema each time.
    """

    def __init__(self, columns: list[str], topk: int = 5,
                 max_candidates: int = 4096,
                 alias_name: str = "profile"):
        import pickle

        self._cols = list(columns)
        self._topk = topk
        self._cap = max_candidates
        empty = pickle.dumps({c: _col_state() for c in self._cols})
        super().__init__(alias_name,
                         zero_factory=lambda z=empty: z,
                         on=None, ignore_nulls=False)

    def _trim(self, st: dict) -> None:
        if len(st["counts"]) > self._cap:
            st["counts_overflow"] = True
            st["counts"] = dict(sorted(
                st["counts"].items(),
                key=lambda kv: (-kv[1], str(kv[0])))[:self._cap])

    def aggregate_block(self, block) -> bytes:
        import pickle

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        out = {c: _col_state() for c in self._cols}
        for c in self._cols:
            st = out[c]
            col = block[c]
            st["n"] = len(col)
            st["nulls"] = col.null_count
            valid = col.drop_null().combine_chunks()
            if not len(valid):
                continue
            numeric = pa.types.is_integer(col.type) or pa.types.is_floating(
                col.type)
            st["is_numeric"] = numeric
            try:
                mm = pc.min_max(valid)
                _merge_minmax(st, mm["min"].as_py(), mm["max"].as_py())
            except pa.ArrowNotImplementedError:
                pass  # unorderable type (e.g. nested): no min/max
            if numeric:
                vals = valid.to_numpy(zero_copy_only=False).astype(
                    np.float64)
                st["num_sum"] = float(vals.sum())
                st["num_sumsq"] = float((vals * vals).sum())
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                st["len_sum"] = int(
                    pc.sum(pc.utf8_length(valid)).as_py() or 0)
            # distinct sketch + exact bounded top-k candidates
            try:
                vc = valid.value_counts()
                pairs = [(v.as_py(), n.as_py())
                         for v, n in zip(vc.field("values"),
                                         vc.field("counts"))]
            except pa.ArrowNotImplementedError:
                pairs = []
            if pairs:
                h = np.fromiter(
                    (fast_hash64(str(v)) for v, _ in pairs),
                    dtype=np.uint64, count=len(pairs))
                hll_update(st["hll"], h, _HLL_P)
                st["counts"] = {_canon_key(v): n for v, n in pairs}
                self._trim(st)
        return pickle.dumps(out)

    def combine(self, a_ser: bytes, b_ser: bytes) -> bytes:
        import pickle

        a, b = pickle.loads(a_ser), pickle.loads(b_ser)
        out = {}
        for c in self._cols:
            sa, sb = a[c], b[c]
            st = _col_state()
            st["n"] = sa["n"] + sb["n"]
            st["nulls"] = sa["nulls"] + sb["nulls"]
            _merge_minmax(st, sa["min"], sa["max"])
            _merge_minmax(st, sb["min"], sb["max"])
            st["num_sum"] = sa["num_sum"] + sb["num_sum"]
            st["num_sumsq"] = sa["num_sumsq"] + sb["num_sumsq"]
            st["is_numeric"] = (sa["is_numeric"]
                                if sa["is_numeric"] is not None
                                else sb["is_numeric"])
            st["len_sum"] = sa["len_sum"] + sb["len_sum"]
            st["hll"] = np.maximum(sa["hll"], sb["hll"])
            # re-canonicalize BOTH sides: pickle round-trips create
            # fresh NaN objects that would never collide as dict keys
            counts: dict = {}
            for side in (sa["counts"], sb["counts"]):
                for v, n in side.items():
                    k = _canon_key(v)
                    counts[k] = counts.get(k, 0) + n
            st["counts"] = counts
            st["counts_overflow"] = (sa["counts_overflow"]
                                     or sb["counts_overflow"])
            self._trim(st)
            out[c] = st
        return pickle.dumps(out)

    def finalize(self, acc_ser: bytes) -> dict:
        import pickle

        acc = pickle.loads(acc_ser)
        prof = {}
        for c in self._cols:
            st = acc[c]
            n_valid = st["n"] - st["nulls"]
            entry = {
                "n": int(st["n"]),
                "nulls": int(st["nulls"]),
                "min": st["min"],
                "max": st["max"],
                "approx_distinct": hll_estimate(st["hll"]),
                "topk_exact": not st["counts_overflow"],
            }
            if not st["counts_overflow"]:
                # candidate set never overflowed -> counts are the FULL
                # exact histogram: report the exact distinct too
                entry["distinct"] = len(st["counts"])
            if st["is_numeric"] and n_valid:
                mean = st["num_sum"] / n_valid
                var = max(st["num_sumsq"] / n_valid - mean * mean, 0.0)
                entry["mean"] = mean
                entry["std"] = float(np.sqrt(var))
            if st["len_sum"] and n_valid:
                entry["avg_len"] = st["len_sum"] / n_valid
            entry["topk"] = [
                [v, int(n)] for v, n in sorted(
                    st["counts"].items(),
                    key=lambda kv: (-kv[1], str(kv[0])))[:self._topk]]
            prof[c] = entry
        return prof


def profile_columns(ds, columns: list[str] | None = None, topk: int = 5,
                    max_candidates: int = 4096) -> dict:
    """Profile ``columns`` (default: all non-nested columns) in one
    streaming aggregate pass. Returns {column: profile dict}."""
    if columns is None:
        schema = ds.schema()
        columns = []
        for n, t in zip(schema.names, schema.types):
            # pandas-block datasets report numpy dtypes here; only
            # Arrow types can be screened for nested/binary (the
            # aggregate handles surprise types defensively anyway)
            if isinstance(t, pa.DataType) and (
                    pa.types.is_nested(t) or pa.types.is_binary(t)
                    or pa.types.is_large_binary(t)):
                continue
            columns.append(n)
    res = ds.select_columns(columns).aggregate(
        ProfileAggregate(columns=columns, topk=topk,
                         max_candidates=max_candidates))
    return res["profile"]


def skew_report(ds, key: str, topk: int = 10,
                exact: bool = False) -> dict:
    """Pre-shuffle skew diagnostic for a prospective groupby/join key:
    would this key hot-spot a task? Returns row count, (approx or exact)
    distinct keys, the top-k heavy hitters, mean group size, and the
    hot-key skew factor (max observed group / mean group) — the number
    that says "salt this key" when it is large.

    Default mode is ONE streaming sketch pass (HLL distinct + Count-Min
    heavy hitters merged through the aggregate tree — no shuffle at all,
    the right probe before pointing a 100 TB groupby at a key).
    ``exact=True`` instead runs the grouped count (the very shuffle being
    diagnosed, so only for corpora that can afford it) and adds exact
    p50/p99/max group sizes.

    Type note: sketch-mode ``topk`` keys come back as STRINGS (Count-Min
    hashes the str form); exact mode returns the column's native values.
    Compare the two modes on the stringified key if you need to join
    their outputs.
    """
    import pandas as pd

    from .sketches import CountMinTopK, HllDistinct

    if exact:
        from ray.data.aggregate import Count, Max, Sum

        from .quantiles import exact_quantiles
        from .topk import topk_rows

        def partial(t: pa.Table) -> pa.Table:
            g = t.select([key]).group_by(key).aggregate([([], "count_all")])
            return g.rename_columns([key, "cnt"])

        # ONE grouped-count shuffle, materialized once; everything after
        # is aggregates/top-k over the (key, cnt) table — the driver only
        # ever sees scalars + topk rows, never the full distinct-key set
        counts = (ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=65536)
                  .groupby(key).sum("cnt")
                  .rename_columns({"sum(cnt)": "cnt"})
                  .materialize())
        agg = counts.aggregate(Sum(on="cnt", alias_name="n"),
                               Count(alias_name="d"),
                               Max(on="cnt", alias_name="mx"))
        n, d, mx = int(agg["n"] or 0), int(agg["d"]), int(agg["mx"] or 0)
        hh = topk_rows(counts, ["cnt", key], [True, False],
                       topk).to_pandas()
        # group-size quantiles: duckdb quantile_disc semantics over cnt
        # (post-combine volume = distinct cnt VALUES, far below keys);
        # renamed first — exact_quantiles uses "cnt" as its own internal
        # count column
        qs = exact_quantiles(
            counts.rename_columns({"cnt": "group_n"}), "group_n",
            [0.5, 0.99])
        qmap = dict(zip(qs["q"], qs["value"]))
        return {
            "rows": n,
            "distinct": d,
            "exact": True,
            "topk": [[v, int(c)] for v, c in zip(hh[key], hh["cnt"])]
            if d else [],
            "mean_group": (n / d) if d else 0.0,
            "p50_group": int(qmap.get(0.5, 0)),
            "p99_group": int(qmap.get(0.99, 0)),
            "max_group": mx,
            "skew_factor": (mx * d / n) if n else 0.0,
        }

    from ray.data.aggregate import Count

    res = ds.aggregate(
        HllDistinct(on=key, alias_name="d"),
        CountMinTopK(on=key, k=topk, alias_name="t"),
        # Count(on=None) counts ROWS (block num_rows), riding the same
        # single aggregate pass as the sketches
        Count(alias_name="n"),
    )
    n, d = int(res["n"]), max(1, int(res["d"]))
    top = [[v, int(c)] for v, c in res["t"]]
    mx = top[0][1] if top else 0
    return {
        "rows": n,
        "distinct": d,
        "exact": False,  # distinct is HLL, hitters are CM overestimates
        "topk": top,
        "mean_group": n / d,
        "max_group": mx,
        "skew_factor": (mx * d / n) if n else 0.0,
    }


def validate_expectations(ds, rules: dict, id_col: str,
                          sample: int = 5) -> dict:
    """Check per-column expectations; returns
    {rule_key: {"violations": int, "examples": [ids...]}} plus
    ``row_count``. Rules per column: ``not_null``, ``unique``, ``min``,
    ``max``, ``regex`` (full match), ``in_set``, ``max_len``.

    Every rule except ``unique`` is one vectorized streaming pass (all
    rules evaluate in the SAME pass); ``unique`` adds the one exact
    groupby a duplicate check needs (uniform key hash, no skew).
    """
    import ray.data as rd  # noqa: F401  (documents the Dataset dep)

    checks = []  # (key, fn: pa.Table -> bool mask of VIOLATIONS)
    for col, spec in rules.items():
        for rule, arg in spec.items():
            key = f"{col}.{rule}"
            if rule == "not_null":
                checks.append((key, lambda t, c=col: pc.is_null(t[c])))
            elif rule == "min":
                checks.append((key, lambda t, c=col, a=arg: pc.fill_null(
                    pc.less(t[c], pa.scalar(a)), False)))
            elif rule == "max":
                checks.append((key, lambda t, c=col, a=arg: pc.fill_null(
                    pc.greater(t[c], pa.scalar(a)), False)))
            elif rule == "regex":
                checks.append((key, lambda t, c=col, a=arg: pc.fill_null(
                    pc.invert(pc.match_substring_regex(
                        t[c], f"^(?:{a})$")), False)))
            elif rule == "in_set":
                # is_in maps null -> false (not null), so mask validity
                # explicitly: nulls are not in_set violations (not_null
                # is its own rule)
                checks.append((key, lambda t, c=col, a=arg: pc.and_(
                    pc.invert(pc.is_in(
                        t[c], value_set=pa.array(sorted(a)))),
                    pc.is_valid(t[c]))))
            elif rule == "max_len":
                checks.append((key, lambda t, c=col, a=arg: pc.fill_null(
                    pc.greater(pc.utf8_length(t[c]),
                               pa.scalar(a, pa.int64())), False)))
            elif rule == "unique":
                pass  # handled below (needs a shuffle)
            else:
                raise ValueError(f"unknown expectation rule {rule!r}")

    def scan(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys, viols, ids = [], [], []
        for key, fn in checks:
            mask = fn(t)
            cnt = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
            ex = (t.filter(mask)[id_col].slice(0, sample).to_pylist()
                  if cnt else [])
            keys.append(key)
            viols.append(cnt)
            ids.append([str(x) for x in ex])
        keys.append("__rows__")
        viols.append(n)
        ids.append([])
        return pa.table({
            "rule": pa.array(keys, pa.string()),
            "violations": pa.array(viols, pa.int64()),
            "examples": pa.array(ids, pa.list_(pa.string())),
        })

    partials = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    report: dict = {"row_count": 0}
    if len(partials):
        g = partials.groupby("rule")
        for rule, grp in g:
            if rule == "__rows__":
                report["row_count"] = int(grp["violations"].sum())
                continue
            ex: list[str] = []
            for lst in grp["examples"]:
                for x in lst:
                    if len(ex) < sample:
                        ex.append(x)
            report[rule] = {"violations": int(grp["violations"].sum()),
                            "examples": ex}
    else:
        for key, _ in checks:
            report[key] = {"violations": 0, "examples": []}

    # unique rules: exact duplicate detection via one grouped count
    uniq_cols = [c for c, spec in rules.items() if spec.get("unique")]
    for col in uniq_cols:
        from .topk import topk_rows

        def count_dups(t: pa.Table, c=col) -> pa.Table:
            g = t.group_by(c).aggregate([(c, "count")])
            return g.rename_columns([c, "cnt"])

        # materialized once: count + example top-k both read the (small,
        # key+count-only) duplicate table without re-running the shuffle
        dup = (ds.select_columns([col])
               .map_batches(count_dups, batch_format="pyarrow")
               .groupby(col).sum("cnt")
               .rename_columns({"sum(cnt)": "cnt"})
               .filter(expr="cnt > 1")
               .materialize())
        dup_pdf = topk_rows(dup, ["cnt", col], [True, False],
                            max(sample, 1)).to_pandas()
        n_dup_keys = dup.count()
        # Ray's to_pandas drops the schema on an empty result
        examples = ([str(x) for x in dup_pdf[col].tolist()]
                    if col in dup_pdf.columns else [])
        report[f"{col}.unique"] = {
            "violations": int(n_dup_keys),
            "examples": examples,
        }
    return report
