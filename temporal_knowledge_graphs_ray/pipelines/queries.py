"""Query-side batch operators over the driver's Parquet tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / pandas
DataFrame whose columns match the DuckDB oracle SQL registered in
``__ray_entry__.oracle_sql`` (same names, same rounding) — the driver's
correctness gate runs them side by side.

Operator parity map (SURVEY.md §2): grouped aggregates G4/G5/G8, top-k T1,
RRF fusion T4, set ops T5, co-occurrence G6, latest/version V1-V3, as-of
V4, range V5, period compare V7, decay V9, fiscal derivation M5, JSON
record parsing S6/S7/M9, windows (streaming-adjacent §2.8), plus the
training-data additions (dedup, similarity, text stats, multimodal).

Float determinism: money sums round to 2 (inputs have 2 decimals, so the
true sum is a 2-decimal number and engine-order error ~1e-9 cannot cross a
rounding boundary); derived ratios round to 4-6.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import round_half_away


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- relational

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with map-side combine (G4)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("rev", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("rev", alias_name="sum_revenue"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["sum_qty"] = round_half_away(out["sum_qty"], 2)
    out["sum_base_price"] = round_half_away(out["sum_base_price"], 2)
    out["sum_revenue"] = round_half_away(out["sum_revenue"], 2)
    out["avg_qty"] = round_half_away(out["sum_qty"] / out["count_order"], 4)
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


def q_topk_orders(sf_dir: str, k: int = 10):
    """Global top-k (T1): per-block partial top-k shrinks the sort input
    to k x blocks candidates, then sort + limit (deterministic tiebreak).
    """
    from ..stages.topk import topk_rows

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return topk_rows(ds, ["o_totalprice", "o_orderkey"],
                     [True, False], k)


def q_revenue_by_brand(sf_dir: str):
    """Broadcast join (J-pattern): part is the small side, put once."""
    import ray
    from ray.data.aggregate import Sum

    part_tbl = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_ref = ray.put(dict(zip(part_tbl["p_partkey"], part_tbl["p_brand"])))

    class BrandLookup:
        def __init__(self):
            self.brands = ray.get(brand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["l_partkey"].to_pylist()
            rev = pc.multiply(batch["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), batch["l_discount"]))
            return pa.Table.from_arrays(
                [pa.array([self.brands.get(k, "NA") for k in keys],
                          pa.string()),
                 rev],
                names=["p_brand", "rev"],
            )

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(BrandLookup, batch_format="pyarrow", batch_size=65536,
                     concurrency=(1, 4))
        .groupby("p_brand")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = round_half_away(out["revenue"], 2)
    return out.sort_values("p_brand", ignore_index=True)


# ------------------------------------------------------------------ temporal

def _bucketed_by_key(ds, key_col: str, fn, num_buckets: int = 64):
    """groupby(hash(key) % B).map_groups(fn): per-key semantics with a
    BOUNDED number of group invocations — fn gets one bucket (a pandas
    frame containing every row of each key it owns) and runs vectorized
    pandas per-key logic inside. The standard fix for the numerous-tiny-
    groups shuffle (a per-key map_groups schedules one call per key)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(t[key_col].cast(pa.int64()),
                            pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("bucket", bucket)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
    )


def q_latest_event_per_user(sf_dir: str):
    """Keep-latest per key (V1/V3 supersession semantics)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = g.groupby("user_id", sort=True).tail(1)
        return out[["user_id", "event_id", "ts"]]

    return _bucketed_by_key(ds, "user_id", latest)


def q_version_history(sf_dir: str):
    """Version-walk ordering within key (V2): version numbers + is_current."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        grp = g.groupby("user_id", sort=False)
        g["version"] = grp.cumcount() + 1
        g["is_current"] = g["version"] == grp["version"].transform("max")
        return g[["user_id", "event_id", "ts", "version", "is_current"]]

    return _bucketed_by_key(ds, "user_id", versions)


def q_asof_counts(sf_dir: str, asof: str = "2024-01-15"):
    """As-of snapshot (V4): interval predicate pushed into the scan."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    cutoff = pa.scalar(np.datetime64(asof + "T00:00:00", "us"))
    return (
        ds.map_batches(
            lambda t: t.filter(pc.less_equal(t["ts"], cutoff)),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def q_events_in_range(sf_dir: str, t1: str = "2024-01-10",
                      t2: str = "2024-01-20"):
    """Modified-in-range (V5)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    lo = pa.scalar(np.datetime64(t1 + "T00:00:00", "us"))
    hi = pa.scalar(np.datetime64(t2 + "T00:00:00", "us"))
    out = (
        ds.map_batches(
            lambda t: t.filter(pc.and_(pc.greater_equal(t["ts"], lo),
                                       pc.less(t["ts"], hi))),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = round_half_away(out["sum_value"], 2)
    return out.sort_values("event_type", ignore_index=True)


def q_period_compare(sf_dir: str, ts_a: str = "2024-01-10",
                     ts_b: str = "2024-01-20"):
    """Period comparison (V7): corpus size at two as-of timestamps."""
    ds = _read(sf_dir, "events", ["ts"]).materialize()
    a = pa.scalar(np.datetime64(ts_a + "T00:00:00", "us"))
    b = pa.scalar(np.datetime64(ts_b + "T00:00:00", "us"))

    def counts(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "n_a": [pc.sum(pc.less_equal(t["ts"], a)).as_py() or 0],
            "n_b": [pc.sum(pc.less_equal(t["ts"], b)).as_py() or 0],
        })

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"n_a": [int(parts["n_a"].sum())],
                         "n_b": [int(parts["n_b"].sum())]})


def q_temporal_decay(sf_dir: str, ref_date: str = "2024-02-01",
                     decay: float = 0.99):
    """Temporal decay scoring (V9): score = value * decay^age_days."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    ref_us = np.datetime64(ref_date + "T00:00:00", "us").astype("int64")

    def score(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy()
        age_days = ((ref_us - ts_us) // 86_400_000_000).astype("int64")
        val = t["value"].to_numpy()
        return pa.Table.from_arrays(
            [t["event_type"], pa.array(val * np.power(decay, age_days))],
            names=["event_type", "scored"],
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("scored", alias_name="decayed_value"))
        .to_pandas()
    )
    out["decayed_value"] = round_half_away(out["decayed_value"], 2)
    return out.sort_values("event_type", ignore_index=True)


def q_fiscal_derive(sf_dir: str):
    """Fiscal-period derivation (M5): year, quarter, end-of-quarter date."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def fiscal(t: pa.Table) -> pa.Table:
        dates = t["o_orderdate"]
        year = pc.year(dates)
        month = pc.month(dates).to_numpy()
        quarter = (month - 1) // 3 + 1
        end_month = quarter * 3
        end_day = np.where(np.isin(end_month, (6, 9)), 30, 31)
        yv = year.to_numpy()
        period_end = np.array(
            [np.datetime64(f"{y}-{m:02d}-{d:02d}", "us")
             for y, m, d in zip(yv, end_month, end_day)],
            dtype="datetime64[us]",
        )
        return pa.Table.from_arrays(
            [
                t["o_orderkey"],
                year.cast(pa.int64()),
                pa.array([f"Q{q}" for q in quarter], pa.string()),
                pa.array(period_end, pa.timestamp("us")),
            ],
            names=["o_orderkey", "fiscal_year", "fiscal_quarter",
                   "fiscal_period_end"],
        )

    return ds.map_batches(fiscal, batch_format="pyarrow", batch_size=65536)


# ------------------------------------------------------ windows / sessions

def q_tumbling_window(sf_dir: str, window_s: int = 3600):
    """Tumbling window counts (streaming-adjacent, §2.8)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])
    w_us = window_s * 1_000_000

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["ts"].cast(pa.int64()), pa.scalar(w_us, pa.int64()))
        return pa.Table.from_arrays([b, t["value"]],
                                    names=["window_id", "value"])

    out = (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("window_id")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = round_half_away(out["sum_value"], 2)
    return out.sort_values("window_id", ignore_index=True)


def q_hopping_window(sf_dir: str, window_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) window counts: each event lands in
    window_s/hop_s overlapping windows — a 1->N Arrow fan-out per batch
    followed by the same groupby-aggregate as the tumbling case (§2.8;
    the remaining streaming-window shape beyond tumbling + session)."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])
    w_us = window_s * 1_000_000
    h_us = hop_s * 1_000_000
    per_event = w_us // h_us  # windows covering each event

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = t["value"].to_numpy(zero_copy_only=False)
        # last window starting at or before ts: floor(ts / hop); the
        # event belongs to windows [floor(ts/hop) - per_event + 1 ..
        # floor(ts/hop)] clipped at 0
        last = ts // h_us
        offs = np.arange(per_event, dtype=np.int64)
        wids = (last[:, None] - offs[None, :]).reshape(-1)
        keep = wids >= 0
        return pa.Table.from_arrays(
            [pa.array(wids[keep]),
             pa.array(np.repeat(vals, per_event)[keep])],
            names=["window_id", "value"],
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow", batch_size=65536)
        .groupby("window_id")
        .aggregate(Count(alias_name="n"),
                   Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = round_half_away(out["sum_value"], 2)
    return out.sort_values("window_id", ignore_index=True)


def q_sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows per user (gap-based), groupby+map_groups over the
    ordered per-key log (§2.8 pattern)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_s * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        new_user = g["user_id"] != g["user_id"].shift(1)
        gap = ts - ts.shift(1)
        new_session = (new_user | (gap > gap_us)).astype("int64")
        g["new_session"] = new_session
        out = (
            g.groupby("user_id", sort=True)
            .agg(n_sessions=("new_session", "sum"),
                 n_events=("user_id", "size"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _bucketed_by_key(ds, "user_id", sessions)


# ------------------------------------------------------------- rank / fusion

def q_rrf_fusion(sf_dir: str, k: int = 100, top: int = 20, c: int = 60):
    """Reciprocal-rank fusion (T4) of two ranked lists over events:
    by value desc and by recency desc — the reference's hybrid-search
    fusion (hybrid_search.py:106-163) over small top-k lists."""
    from ..stages.topk import topk_rows

    ds = _read(sf_dir, "events", ["event_id", "ts", "value"]).materialize()
    by_value = topk_rows(ds, ["value", "event_id"],
                         [True, False], k).to_pandas()
    by_recency = topk_rows(ds, ["ts", "event_id"],
                           [True, False], k).to_pandas()
    scores: dict[int, float] = {}
    for rank, eid in enumerate(by_value["event_id"], start=1):
        scores[eid] = scores.get(eid, 0.0) + 1.0 / (c + rank)
    for rank, eid in enumerate(by_recency["event_id"], start=1):
        scores[eid] = scores.get(eid, 0.0) + 1.0 / (c + rank)
    out = pd.DataFrame(
        {"event_id": list(scores), "rrf_score": list(scores.values())}
    )
    out["rrf_score"] = round_half_away(out["rrf_score"], 6)
    out = out.sort_values(["rrf_score", "event_id"],
                          ascending=[False, True], ignore_index=True)
    return out.head(top)


def q_overlap_users(sf_dir: str, type_a: str = "purchase",
                    type_b: str = "signup"):
    """Set ops (T5) as semi/anti joins with a broadcast key set.

    The broadcast side is the distinct users of one event type; when that
    set outgrows worker memory at scale, swap the exact set for a Bloom
    filter of it (same pattern, bounded memory, tiny false-positive rate).
    """
    import ray

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    b_users_ref = ray.put(set(
        r["user_id"]
        for r in ds.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], pa.scalar(type_b))),
            batch_format="pyarrow",
        ).select_columns(["user_id"]).take_all()
    ))

    class SemiAnti:
        def __init__(self):
            self.b_users = ray.get(b_users_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], pa.scalar(type_a)))
            users = t["user_id"].to_pylist()
            return pa.Table.from_pydict({
                "user_id": users,
                "also_b": [u in self.b_users for u in users],
            })

    flags = (
        ds.map_batches(SemiAnti, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas().drop_duplicates("user_id")
    )
    both = sorted(flags.loc[flags["also_b"], "user_id"])
    only_a = sorted(flags.loc[~flags["also_b"], "user_id"])
    return pd.DataFrame({"n_both": [len(both)], "n_only_a": [len(only_a)]})


def q_cooccurrence(sf_dir: str, min_users: int = 5):
    """Co-occurrence counts (G6): event-type pairs sharing a user."""
    from ray.data.aggregate import Count

    _ = Count  # (kept for parity with other grouped queries)
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    # map-side dedup shrinks the shuffle; ONE bucketed exchange computes
    # per-user distinct sets, pair generation AND per-bucket partial pair
    # counts; the final merge is over <= |types|^2 rows on the driver
    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["user_id", "event_type"]].drop_duplicates()
        m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        out = (m.groupby(["event_type_a", "event_type_b"], sort=True)
               .size().rename("n").reset_index())
        out.columns = ["type_a", "type_b", "n"]
        return out

    partials = _bucketed_by_key(
        ds.map_batches(local_distinct, batch_format="pyarrow",
                       batch_size=65536),
        "user_id", bucket_pairs,
    ).to_pandas()
    out = (partials.groupby(["type_a", "type_b"], sort=True)["n"].sum()
           .rename("n_users").reset_index())
    out = out[out["n_users"] >= min_users]
    return out.sort_values(["type_a", "type_b"], ignore_index=True)


# --------------------------------------------------------------- JSON / S6-7

def q_json_props(sf_dir: str):
    """JSON record parsing (S6/S7/M9): extract props.k, aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        ks = []
        for s in t["props"].to_pylist():
            try:
                ks.append(int(json.loads(s).get("k", 0)))
            except (json.JSONDecodeError, TypeError, ValueError):
                ks.append(0)  # malformed-line skip (ectqa_loader.py:88-93)
        return pa.Table.from_arrays(
            [t["event_type"], pa.array(ks, pa.int64())],
            names=["event_type", "k"],
        )

    return (
        ds.map_batches(parse, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )


# ----------------------------------------------------------------- documents

def q_doc_stats(sf_dir: str):
    """Dataset stats (S8/G4): per-language counts + char sums."""
    from ray.data.aggregate import Count, Sum

    return (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_chars", alias_name="sum_chars"))
    )


def q_normalize_lines(sf_dir: str):
    """The text-normalization half of the HTML->text contract (S4 step 4),
    SQL-checkable byte-for-byte."""
    from ..functions.html_text import normalize_text_lines

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["doc_id"],
             pa.array([normalize_text_lines(x) for x in
                       t["text"].to_pylist()], pa.string())],
            names=["doc_id", "norm_text"],
        )

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=4096)


def q_extract_text_roundtrip(sf_dir: str):
    """Full HTML->text kernel driven through Ray: wrap each document in a
    deterministic HTML template (with script/style noise), extract, and
    return the text — the oracle is pure line-normalization of the source
    text, so the equality IS the byte-identical extraction gate."""
    from ..functions.html_text import extract_text_from_html

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def wrap_and_extract(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            esc = (text.replace("&", "&amp;").replace("<", "&lt;")
                   .replace(">", "&gt;"))
            html = (
                "<html><head><style>p{margin:0}</style>"
                "<script>var x=1;</script></head><body>\n"
                + "".join(f"  <p> {line} </p>\n" for line in esc.splitlines())
                + "</body></html>"
            )
            out.append(extract_text_from_html(html))
        return pa.Table.from_arrays(
            [t["doc_id"], pa.array(out, pa.string())],
            names=["doc_id", "extracted"],
        )

    return ds.map_batches(wrap_and_extract, batch_format="pyarrow",
                          batch_size=2048)


def q_evolution_diff(sf_dir: str, t0: str = "2024-01-01",
                     t1: str = "2024-01-15", t2: str = "2024-01-30"):
    """Temporal evolution diff (T6, reference temporal_retrieval.py:376-416):
    per event_type, users new / persistent / disappeared between period 1
    [t0,t1) and period 2 [t1,t2)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    lo = pa.scalar(np.datetime64(t0 + "T00:00:00", "us"))
    mid = pa.scalar(np.datetime64(t1 + "T00:00:00", "us"))
    hi = pa.scalar(np.datetime64(t2 + "T00:00:00", "us"))

    def tag_period(t: pa.Table) -> pa.Table:
        in1 = pc.and_(pc.greater_equal(t["ts"], lo), pc.less(t["ts"], mid))
        in2 = pc.and_(pc.greater_equal(t["ts"], mid), pc.less(t["ts"], hi))
        keep = pc.or_(in1, in2)
        t = t.filter(keep)
        period = pc.if_else(
            pc.and_(pc.greater_equal(t["ts"], mid), pc.less(t["ts"], hi)),
            pa.scalar(2, pa.int32()), pa.scalar(1, pa.int32()))
        return pa.Table.from_arrays(
            [t["event_type"], t["user_id"], period],
            names=["event_type", "user_id", "period"],
        ).group_by(["event_type", "user_id", "period"]).aggregate([])

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, sub in g.groupby("event_type", sort=True):
            p1 = set(sub.loc[sub["period"] == 1, "user_id"])
            p2 = set(sub.loc[sub["period"] == 2, "user_id"])
            out.append({
                "event_type": etype,
                "n_new": len(p2 - p1),
                "n_persistent": len(p1 & p2),
                "n_disappeared": len(p1 - p2),
            })
        return pd.DataFrame(out)

    # event_type is low-cardinality: one group per type is fine (5 types)
    tagged = ds.map_batches(tag_period, batch_format="pyarrow",
                            batch_size=65536)
    out = (tagged.groupby("event_type")
           .map_groups(diff, batch_format="pandas").to_pandas())
    for c in ("n_new", "n_persistent", "n_disappeared"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type", ignore_index=True)


def q_version_gc(sf_dir: str, keep: int = 3):
    """Old-version GC (V6, reference versioning.py:224-262): per user keep
    the newest ``keep`` events; report kept/deleted counts (dry-run)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def gc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False])
        ranked = g.groupby("user_id", sort=True).cumcount() + 1
        kept = (ranked <= keep).groupby(g["user_id"], sort=True).sum()
        total = g.groupby("user_id", sort=True).size()
        out = pd.DataFrame({
            "user_id": kept.index,
            "n_kept": kept.astype("int64").values,
            "n_deleted": (total - kept).astype("int64").values,
        })
        return out.reset_index(drop=True)

    return _bucketed_by_key(ds, "user_id", gc)


def q_flatten_metadata(sf_dir: str):
    """Metadata flattening (M10) applied to the events props JSON."""
    import json as _json

    from ..functions.metadata import flatten_metadata

    ds = _read(sf_dir, "events", ["event_id", "props"])

    def flatten(t: pa.Table) -> pa.Table:
        ks = []
        for s_ in t["props"].to_pylist():
            try:
                flat = flatten_metadata(_json.loads(s_))
            except (ValueError, TypeError):
                flat = {}
            ks.append(flat.get("meta_k"))
        return pa.Table.from_arrays(
            [t["event_id"], pa.array(ks, pa.int64())],
            names=["event_id", "meta_k"],
        )

    return ds.map_batches(flatten, batch_format="pyarrow", batch_size=65536)
