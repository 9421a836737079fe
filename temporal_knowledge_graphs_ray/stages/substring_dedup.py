"""Exact substring-duplication detection (scale addition following the
public recipe of Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better": any WINDOW_TOKENS-token span occurring more
than once in the corpus — in another document or the same one — is a
duplicate span worth trimming/weighting. Their suffix array is a global
structure; re-expressed here as a batch dataflow over 64-bit rolling
window hashes, which finds exactly the same spans up to hash collisions
(~(total_windows)^2 / 2^65 expected false pairs — at 10^12 windows a
few ppb of windows, each only ever FLAGGING a span, never dropping a
document; documented, not verified byte-wise).

Dataflow (the shuffles are inherent to the semantics — every window
must meet its global count):

1. window pass: per doc, token hashes -> vectorized polynomial rolling
   window hashes (numpy uint64 wraparound arithmetic, no Python loop);
2. count pass: per-batch map-side combine (unique window hash ->
   partial count) -> ``groupby(hash).sum`` -> hashes with count > 1;
3. mark-back: duplicate hashes co-located with the (hash, doc, pos)
   window rows via the house mixed-union bucketed groupby (no
   Dataset.join), emitting flagged positions;
4. span pass: per-doc bucket groupby merges overlapping flagged windows
   into maximal [start, end) token spans.

``substring_dup_stats`` folds the spans into a per-doc duplicated-token
fraction (the score curation funnels threshold on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_vec
from .dsir import _TOKEN_RE

_B = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier, full period mod 2^64


def _window_hashes(text: str, w: int, seed: int) -> np.ndarray:
    """Rolling polynomial hashes of every w-token window (uint64,
    wraparound): H[i] = sum_j h_tok[i+j] * B^(w-1-j)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    h = hash64_vec(toks, seed=seed or 1)  # seed=0 would skip finalizer
    with np.errstate(over="ignore"):  # uint64 wraparound is the design
        powers = np.empty(w, dtype=np.uint64)
        powers[-1] = np.uint64(1)
        for j in range(w - 2, -1, -1):
            powers[j] = powers[j + 1] * _B
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        # >>1 keeps hashes in int64 range: Ray's groupby re-infers key
        # column types and full-range uint64 keys fall back to pickled
        # object blocks (breaking every downstream vectorized kernel)
        return ((sw * powers).sum(axis=1, dtype=np.uint64)
                >> np.uint64(1)).astype(np.int64)


def duplicate_spans(ds, window_tokens: int = 50, id_col: str = "doc_id",
                    text_col: str = "text", seed: int = 7,
                    num_partitions: int = 64,
                    cache_windows: bool = True):
    """Dataset of (id, span_start, span_end, n_windows): maximal token
    spans covered by windows whose exact w-token content occurs >1 time
    in the corpus. Documents shorter than ``window_tokens`` tokens never
    produce windows (matching Lee et al.'s granularity floor). Touching
    spans merge (overlap OR exact adjacency); ``id`` is returned as
    string (the marker-union schema normalizes it).

    ``cache_windows``: the window table feeds BOTH the count pass and
    the mark-back. True (default) materializes it once — right when it
    fits the object store (it is ~8 bytes x corpus tokens + ids). At
    100 TB prefer False: both consumers recompute the hashing pass
    (2x CPU on a cheap vectorized kernel) and everything streams with
    no corpus-sized object-store residency."""
    windows = ds.select_columns([id_col, text_col]).map_batches(
        _window_rows(window_tokens, id_col, text_col, seed),
        batch_format="pyarrow")
    if cache_windows:
        windows = windows.materialize()

    # ---- count pass: map-side combined partial counts, tiny rows ----
    def partial_counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["whash"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"whash": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    dup_hashes = (windows.map_batches(partial_counts,
                                      batch_format="pyarrow")
                  .groupby("whash").aggregate(Sum("n", alias_name="n"))
                  .map_batches(
                      lambda t: t.filter(
                          pa.compute.greater(t["n"], pa.scalar(1))
                      ).select(["whash"]),
                      batch_format="pyarrow"))

    # ---- mark-back: co-locate dup hashes with window rows ----
    def bucket_w(t: pa.Table) -> pa.Table:
        b = (t["whash"].to_numpy(zero_copy_only=False)
             % num_partitions).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def as_marker(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "whash": t["whash"],
            id_col: pa.nulls(n, pa.string()),
            "pos": pa.nulls(n, pa.int64()),
        })

    def keep_marked(g: pd.DataFrame) -> pd.DataFrame:
        marked = set(g.loc[g["pos"].isna(), "whash"])
        rows = g[g["pos"].notna()]
        out = rows[rows["whash"].isin(marked)]
        return out[[id_col, "pos"]]

    def id_str(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index(id_col), id_col,
                            t[id_col].cast(pa.string()))

    flagged = (windows.map_batches(id_str, batch_format="pyarrow")
               .union(dup_hashes.map_batches(as_marker,
                                             batch_format="pyarrow"))
               .map_batches(bucket_w, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(keep_marked, batch_format="pandas"))

    # ---- span pass: merge overlapping flagged windows per doc ----
    def bucket_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (hash64_vec(df[id_col].to_list())
                        % np.uint64(num_partitions)).astype(np.int32)
        return df

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        out: list[dict] = []
        for did, grp in g.groupby(id_col, sort=False):
            pos = np.sort(grp["pos"].to_numpy(dtype=np.int64))
            start = prev = pos[0]
            n_win = 1
            for p in pos[1:]:
                if p <= prev + window_tokens:  # overlap or adjacency
                    prev = p
                    n_win += 1
                else:
                    out.append({id_col: did, "span_start": int(start),
                                "span_end": int(prev + window_tokens),
                                "n_windows": n_win})
                    start = prev = p
                    n_win = 1
            out.append({id_col: did, "span_start": int(start),
                        "span_end": int(prev + window_tokens),
                        "n_windows": n_win})
        return pd.DataFrame(
            out, columns=[id_col, "span_start", "span_end", "n_windows"])

    return (flagged.map_batches(bucket_doc, batch_format="pandas")
            .groupby("bucket")
            .map_groups(merge_spans, batch_format="pandas"))


def _window_rows(w: int, id_col: str, text_col: str, seed: int):
    def fn(t: pa.Table) -> pa.Table:
        # ONE hash64_vec call over every token in the batch (the
        # per-call pandas hash_array overhead dwarfs 50-token docs),
        # then per-doc slides over slices — value-exact, so output is
        # identical to the per-doc _window_hashes kernel (tested)
        doc_ids = t[id_col].to_pylist()
        toks_per = [_TOKEN_RE.findall((x or "").lower())
                    for x in t[text_col].to_pylist()]
        all_toks = [tok for toks in toks_per for tok in toks]
        h_all = (hash64_vec(all_toks, seed=seed or 1)
                 if all_toks else np.empty(0, dtype=np.uint64))
        powers = np.empty(w, dtype=np.uint64)
        with np.errstate(over="ignore"):
            powers[-1] = np.uint64(1)
            for j in range(w - 2, -1, -1):
                powers[j] = powers[j + 1] * _B

        ids, poss, hs = [], [], []
        off = 0
        for did, toks in zip(doc_ids, toks_per):
            h = h_all[off:off + len(toks)]
            off += len(toks)
            if len(toks) < w:
                continue
            with np.errstate(over="ignore"):
                sw = np.lib.stride_tricks.sliding_window_view(h, w)
                wh = ((sw * powers).sum(axis=1, dtype=np.uint64)
                      >> np.uint64(1)).astype(np.int64)
            ids.extend([did] * len(wh))
            poss.append(np.arange(len(wh), dtype=np.int64))
            hs.append(wh)
        if not hs:
            return pa.table({
                "whash": pa.array([], pa.int64()),
                id_col: pa.array([], t.schema.field(id_col).type),
                "pos": pa.array([], pa.int64())})
        return pa.table({
            "whash": pa.array(np.concatenate(hs), pa.int64()),
            id_col: pa.array(ids, t.schema.field(id_col).type),
            "pos": pa.array(np.concatenate(poss))})

    return fn


def substring_dup_stats(ds, window_tokens: int = 50,
                        id_col: str = "doc_id", text_col: str = "text",
                        seed: int = 7, num_partitions: int = 64,
                        cache_windows: bool = True):
    """Per-doc duplicated-token accounting: (id, n_tokens, dup_tokens,
    dup_fraction) for EVERY input doc (docs with no duplicate spans get
    0.0) — the thresholdable curation signal."""
    spans = duplicate_spans(ds, window_tokens, id_col, text_col, seed,
                            num_partitions, cache_windows=cache_windows)

    def tok_counts(t: pa.Table) -> pa.Table:
        ns = [len(_TOKEN_RE.findall((x or "").lower()))
              for x in t[text_col].to_pylist()]
        return pa.table({
            id_col: t[id_col].cast(pa.string()),
            "n_tokens": pa.array(ns, pa.int64()),
            "dup_tokens": pa.nulls(t.num_rows, pa.int64())})

    def span_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            id_col: t[id_col].cast(pa.string()),
            "n_tokens": pa.nulls(t.num_rows, pa.int64()),
            "dup_tokens": pc.subtract(t["span_end"], t["span_start"])})

    def bucket_doc(t: pa.Table) -> pa.Table:
        b = (hash64_vec(t[id_col].to_pylist())
             % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["n_tokens"].notna()]
        dups = (g[g["dup_tokens"].notna()]
                .groupby(id_col)["dup_tokens"].sum())
        out = pd.DataFrame({
            id_col: base[id_col].to_numpy(),
            "n_tokens": base["n_tokens"].to_numpy(dtype=np.int64),
            "dup_tokens": dups.reindex(base[id_col])
            .fillna(0).to_numpy(dtype=np.int64),
        })
        n = out["n_tokens"].to_numpy()
        out["dup_fraction"] = np.where(
            n > 0, out["dup_tokens"].to_numpy() / np.maximum(n, 1), 0.0)
        return out

    mixed = (ds.select_columns([id_col, text_col])
             .map_batches(tok_counts, batch_format="pyarrow")
             .union(spans.map_batches(span_rows, batch_format="pyarrow")))
    return (mixed.map_batches(bucket_doc, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pandas"))
