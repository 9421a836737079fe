"""Token-budget sequence packing for LLM training data (scale addition).

Training pipelines pack variable-length documents into fixed-token-budget
sequences so no batch slot is wasted.  This implements deterministic
NEXT-FIT packing, distributed the only way packing can be: the greedy
scan is inherently sequential, so documents are hash-bucketed by id and
each bucket packs independently in one group task — parallel across
buckets, sequential (and deterministic: docs scan in doc-id order)
within one.  The partitioning assumption is explicit: sequences never
span buckets, which costs at most one under-filled final sequence per
bucket versus a global scan — negligible when buckets hold thousands of
documents, and the price of making the operator data-parallel at all.

Semantics (property- and oracle-tested in tests/test_packing.py against
a DuckDB recursive-CTE implementation of the same scan):

- within a bucket, docs are ordered by ``id_col``;
- a doc joins the current sequence if it fits (``fill + tokens <=
  budget``), else starts the next sequence;
- the first doc of a sequence always joins it, so a doc larger than the
  budget occupies a sequence alone (callers that want to split oversized
  docs chunk them first — functions/chunking.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import hash64_vec


def _pack_bucket(df: pd.DataFrame, id_col: str, tokens_col: str,
                 budget: int) -> pd.DataFrame:
    df = df.sort_values(id_col, ignore_index=True)
    toks = df[tokens_col].to_numpy()
    seqs = np.empty(len(toks), dtype=np.int64)
    seq, fill = 0, 0
    for i, t in enumerate(toks):
        t = int(t)
        if fill > 0 and fill + t > budget:
            seq += 1
            fill = t
        else:
            fill += t
        seqs[i] = seq
    out = df[[id_col, tokens_col]].copy()
    out["bucket"] = np.int64(df["bucket"].iloc[0]) if len(df) else 0
    out["seq"] = seqs
    return out[[id_col, "bucket", "seq", tokens_col]]


def pack_sequences(ds, token_budget: int, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", buckets: int = 64):
    """Assign every doc a (bucket, seq) sequence slot under the budget.

    Input dataset needs ``id_col`` (unique) and ``tokens_col`` (doc token
    count — compose with the token-stats stage to derive it from text).
    Returns a Dataset of (id_col, bucket, seq, tokens_col).
    """
    import pyarrow as pa

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash64_vec(t[id_col].to_pylist())
        b = pa.array((h % np.uint64(buckets)).astype(np.int64),
                     pa.int64())
        return t.select([id_col, tokens_col]).append_column("bucket", b)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _pack_bucket(df, id_col, tokens_col, token_budget)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def packing_report_distributed(packed_ds, token_budget: int,
                               tokens_col: str = "n_tokens") -> dict:
    """packing_report over a packed-assignment DATASET: the driver
    never holds the per-doc table. Counts/sums come from per-batch
    scalar partials; the sequence count exploits that ``seq`` ids are
    0-based and dense WITHIN each bucket (_pack_bucket increments from
    0), so n_seq = Σ_bucket (max seq + 1) — a per-bucket max merge
    bounded by #buckets × #blocks rows."""
    import pyarrow as pa

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = t[tokens_col]
        df = pd.DataFrame({"bucket": t["bucket"].to_numpy(
            zero_copy_only=False),
            "seq": t["seq"].to_numpy(zero_copy_only=False)})
        g = df.groupby("bucket")["seq"].max()
        return pa.table({
            "docs": pa.array([t.num_rows] + [0] * (len(g) - 1)
                             if len(g) else [t.num_rows], pa.int64()),
            "used": pa.array([pc.sum(toks).as_py() or 0]
                             + [0] * max(0, len(g) - 1), pa.int64()),
            "oversized": pa.array(
                [(pc.sum(pc.cast(pc.greater(
                    toks, pa.scalar(token_budget)), pa.int64()))
                  .as_py() or 0)] + [0] * max(0, len(g) - 1),
                pa.int64()),
            "bucket": pa.array(g.index.to_numpy(np.int64)
                               if len(g) else np.array([-1]),
                               pa.int64()),
            "max_seq": pa.array(g.to_numpy(np.int64)
                                if len(g) else np.array([-1]),
                                pa.int64()),
        })

    from ray.data.aggregate import Max

    # per-batch partials reduce through Ray aggregates so the driver
    # sees scalars + <= #buckets rows, not buckets x blocks rows
    parts_ds = packed_ds.map_batches(part,
                                     batch_format="pyarrow").materialize()
    sums = {c: parts_ds.sum(c) or 0
            for c in ("docs", "used", "oversized")}
    per_bucket = (parts_ds
                  .filter(expr="bucket >= 0")
                  .groupby("bucket")
                  .aggregate(Max("max_seq", alias_name="max_seq"))
                  .to_pandas())
    n_seq = int((per_bucket["max_seq"] + 1).sum()) \
        if len(per_bucket) else 0
    used = int(sums["used"])
    parts = pd.DataFrame([sums])
    return {
        "docs": int(parts["docs"].sum()),
        "sequences": n_seq,
        "budget": token_budget,
        "fill_efficiency": used / float(n_seq * token_budget)
        if n_seq else 0.0,
        "oversized_docs": int(parts["oversized"].sum()),
    }


def packing_report(packed_df: pd.DataFrame, token_budget: int,
                   tokens_col: str = "n_tokens") -> dict:
    """Fill-efficiency summary of a packing result (driver-side; input
    is the packed assignment table, one row per doc)."""
    fills = packed_df.groupby(["bucket", "seq"])[tokens_col].sum()
    n_seq = len(fills)
    used = int(packed_df[tokens_col].sum())
    return {
        "docs": int(len(packed_df)),
        "sequences": int(n_seq),
        "budget": token_budget,
        "fill_efficiency": used / float(n_seq * token_budget)
        if n_seq else 0.0,
        "oversized_docs": int((packed_df[tokens_col]
                               > token_budget).sum()),
    }
