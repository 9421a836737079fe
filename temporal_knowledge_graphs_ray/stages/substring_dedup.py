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
   partial count) -> bucketed ``groupby(bucket).map_groups`` with ONE
   vectorized np.unique/bincount kernel per bucket -> hashes with
   count > 1 (a ``groupby(hash).aggregate`` here pays Ray's per-group
   overhead on ~one-group-per-row cardinality — measured ~220us/row,
   two orders of magnitude over the bucketed kernel);
3. mark-back: when the duplicate-hash set is small (most corpora:
   duplicated windows are the tail), broadcast it once via ``ray.put``
   and filter the window rows with a vectorized searchsorted — no
   shuffle; above ``broadcast_max`` fall back to co-locating dup
   hashes with the (hash, doc, pos) window rows via the house
   mixed-union bucketed groupby (no Dataset.join);
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


def _partial_counts_fn(num_partitions: int):
    """Map-side combined (whash, n, bucket) partial counts."""

    def fn(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["whash"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({
            "whash": pa.array(u, pa.int64()),
            "n": pa.array(c.astype(np.int64)),
            "bucket": pa.array((u % num_partitions).astype(np.int32))})

    return fn


def _dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
    h = g["whash"].to_numpy()
    u, inv = np.unique(h, return_inverse=True)
    # counts are ints; float64 bincount is exact below 2^53
    tot = np.bincount(inv, weights=g["n"].to_numpy())
    return pd.DataFrame({"whash": u[tot >= 2]})


def _dup_hash_set(windows, *, num_partitions: int, cache_windows: bool):
    """Duplicated window hashes as (hs_small ndarray | None,
    dup_hashes Dataset | None, n_dup) — shared by detection
    (duplicate_spans) and removal (remove_duplicate_spans).

    Driver-merge gate: when the windows table is small (known for free
    in cache mode), the per-block partial counts fit the driver
    (<= 24 bytes/row) and one np.unique/bincount replaces the whole
    grouped shuffle. Above the gate — or when streaming — the
    distributed bucketed path runs."""
    partials = windows.map_batches(_partial_counts_fn(num_partitions),
                                   batch_format="pyarrow")
    if cache_windows and windows.count() <= 4_000_000:
        pdf = partials.to_pandas()
        if len(pdf):
            u, inv = np.unique(pdf["whash"].to_numpy(),
                               return_inverse=True)
            tot = np.bincount(inv, weights=pdf["n"].to_numpy())
            hs_small = u[tot >= 2].astype(np.int64)
        else:
            hs_small = np.empty(0, dtype=np.int64)
        return hs_small, None, len(hs_small)
    dup_hashes = (partials.groupby("bucket")
                  .map_groups(_dup_in_bucket, batch_format="pandas"))
    if cache_windows:
        # bounded by distinct duplicated windows; lets count() + the
        # chosen mark-back reuse one execution
        dup_hashes = dup_hashes.materialize()
    return None, dup_hashes, dup_hashes.count()


def _mark_back(windows, hs_small, dup_hashes, n_dup, *, id_col: str,
               num_partitions: int, broadcast_max: int,
               keep_hash: bool):
    """Window rows bearing a duplicated hash, ids cast to string:
    (id, pos) rows, plus whash when ``keep_hash``. The dup-hash set
    broadcasts (one ray.put + vectorized searchsorted filter, no
    shuffle) below ``broadcast_max``; above it the house mixed-union
    bucketed groupby co-locates hashes with window rows, so driver
    memory never depends on how duplicated the corpus is."""
    import ray

    def project(flt: pa.Table) -> pa.Table:
        cols = {id_col: flt[id_col].cast(pa.string()),
                "pos": flt["pos"]}
        if keep_hash:
            cols = {"whash": flt["whash"], **cols}
        return pa.table(cols)

    if n_dup <= broadcast_max:
        hs = (np.sort(hs_small) if hs_small is not None
              else (np.sort(dup_hashes.to_pandas()["whash"]
                            .to_numpy(dtype=np.int64))
                    if n_dup else np.empty(0, dtype=np.int64)))
        hs_ref = ray.put(hs)

        def keep_flagged(t: pa.Table) -> pa.Table:
            marked = ray.get(hs_ref)  # zero-copy from the object store
            w = t["whash"].to_numpy(zero_copy_only=False)
            if len(marked):
                idx = np.clip(np.searchsorted(marked, w), 0,
                              len(marked) - 1)
                mask = marked[idx] == w
            else:
                mask = np.zeros(len(w), dtype=bool)
            return project(t.filter(pa.array(mask)))

        return windows.map_batches(keep_flagged, batch_format="pyarrow")

    # big side: co-locate dup hashes with window rows, no Dataset.join
    if dup_hashes is None:  # driver-merged set, forced distributed
        import ray.data as rd

        dup_hashes = rd.from_arrow(
            pa.table({"whash": pa.array(hs_small, pa.int64())}))

    def id_str(t: pa.Table) -> pa.Table:
        return pa.table({"whash": t["whash"],
                         id_col: t[id_col].cast(pa.string()),
                         "pos": t["pos"]})

    def as_marker(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "whash": t["whash"],
            id_col: pa.nulls(n, pa.string()),
            "pos": pa.nulls(n, pa.int64())})

    def bucket_w(t: pa.Table) -> pa.Table:
        b = (t["whash"].to_numpy(zero_copy_only=False)
             % num_partitions).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    out_cols = (["whash", id_col, "pos"] if keep_hash
                else [id_col, "pos"])

    def keep_marked(g: pd.DataFrame) -> pd.DataFrame:
        marked = set(g.loc[g["pos"].isna(), "whash"])
        rows = g[g["pos"].notna()]
        out = rows[rows["whash"].isin(marked)]
        return out[out_cols]

    return (windows.map_batches(id_str, batch_format="pyarrow")
            .union(dup_hashes.map_batches(as_marker,
                                          batch_format="pyarrow"))
            .map_batches(bucket_w, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(keep_marked, batch_format="pandas"))


def duplicate_spans(ds, window_tokens: int = 50, id_col: str = "doc_id",
                    text_col: str = "text", seed: int = 7,
                    num_partitions: int = 64,
                    cache_windows: bool = True,
                    broadcast_max: int = 4_000_000):
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
    no corpus-sized object-store residency.

    ``broadcast_max``: duplicate-hash sets up to this many int64s
    (default 4M = 32 MB) are broadcast once and the mark-back is a
    shuffle-free vectorized filter; larger sets take the bucketed
    union-groupby path. Counting the dup set costs one execution of
    the count pass either way (with ``cache_windows=False`` the losing
    union path would re-run it, so the gate also decides how often the
    window hashing recomputes)."""
    windows = ds.select_columns([id_col, text_col]).map_batches(
        _window_rows(window_tokens, id_col, text_col, seed),
        batch_format="pyarrow")
    if cache_windows:
        windows = windows.materialize()

    hs_small, dup_hashes, n_dup = _dup_hash_set(
        windows, num_partitions=num_partitions,
        cache_windows=cache_windows)
    flagged = _mark_back(windows, hs_small, dup_hashes, n_dup,
                         id_col=id_col, num_partitions=num_partitions,
                         broadcast_max=broadcast_max, keep_hash=False)

    # ---- span pass: merge overlapping flagged windows per doc ----
    def bucket_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (hash64_vec(df[id_col].to_list())
                        % np.uint64(num_partitions)).astype(np.int32)
        return df

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, "span_start", "span_end", "n_windows"]
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype="int64" if c != id_col
                                              else "object")
                                 for c in cols})
        g = g.sort_values([id_col, "pos"])
        ids = g[id_col].to_numpy()
        pos = g["pos"].to_numpy(dtype=np.int64)
        # span boundary: new doc, or gap beyond window width; cumulative
        # chain rule (each pos compares to its predecessor) == the
        # sequential prev-pointer merge
        b = np.flatnonzero(np.r_[True, (ids[1:] != ids[:-1])
                                 | (pos[1:] > pos[:-1] + window_tokens)])
        e = np.r_[b[1:], len(pos)]
        return pd.DataFrame({
            id_col: ids[b],
            "span_start": pos[b],
            "span_end": pos[e - 1] + window_tokens,
            "n_windows": (e - b).astype(np.int64)})

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

        n_win = np.zeros(len(doc_ids), dtype=np.int64)
        poss, hs = [], []
        off = 0
        for i, toks in enumerate(toks_per):
            h = h_all[off:off + len(toks)]
            off += len(toks)
            if len(toks) < w:
                continue
            with np.errstate(over="ignore"):
                sw = np.lib.stride_tricks.sliding_window_view(h, w)
                wh = ((sw * powers).sum(axis=1, dtype=np.uint64)
                      >> np.uint64(1)).astype(np.int64)
            n_win[i] = len(wh)
            poss.append(np.arange(len(wh), dtype=np.int64))
            hs.append(wh)
        if not hs:
            return pa.table({
                "whash": pa.array([], pa.int64()),
                id_col: pa.array([], t.schema.field(id_col).type),
                "pos": pa.array([], pa.int64())})
        # repeat ids zero-copy via Arrow take instead of Python lists
        row_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64),
                            n_win)
        return pa.table({
            "whash": pa.array(np.concatenate(hs), pa.int64()),
            id_col: t[id_col].take(pa.array(row_idx)),
            "pos": pa.array(np.concatenate(poss))})

    return fn


def substring_dup_stats(ds, window_tokens: int = 50,
                        id_col: str = "doc_id", text_col: str = "text",
                        seed: int = 7, num_partitions: int = 64,
                        cache_windows: bool = True,
                        broadcast_max: int = 4_000_000):
    """Per-doc duplicated-token accounting: (id, n_tokens, dup_tokens,
    dup_fraction) for EVERY input doc (docs with no duplicate spans get
    0.0) — the thresholdable curation signal."""
    spans = duplicate_spans(ds, window_tokens, id_col, text_col, seed,
                            num_partitions, cache_windows=cache_windows,
                            broadcast_max=broadcast_max)

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


# --------------------------------------------------------------------------
# Span REMOVAL — the second half of Lee et al. 2021's ExactSubstr recipe:
# detection above finds duplicated windows; this rewrites the corpus so
# each duplicated >= w-token window KEEPS exactly its globally-first
# occurrence (smallest (doc_id-as-string, pos), the same deterministic
# "first" as paradedup's keep_first) and every other occurrence is cut
# out of the text. Self-repeats within one document cut too (only the
# first occurrence survives anywhere).
# --------------------------------------------------------------------------


def _token_char_spans(text: str) -> tuple[list, np.ndarray, np.ndarray]:
    """Tokens of ``text`` (the _TOKEN_RE-over-lower() tokenization every
    substring kernel uses) WITH char offsets into the ORIGINAL string.

    Offsets come from finditer over ``text.lower()``; when lower()
    changes the string length (a handful of expanding code points, e.g.
    'İ' -> 'i̇') a per-char cumulative map converts lowered offsets back
    to original chars, rounding outward so a cut never leaves half an
    original character behind."""
    low = text.lower()
    spans = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(low)]
    if not spans:
        z = np.empty(0, dtype=np.int64)
        return [], z, z
    starts = np.fromiter((s for s, _ in spans), np.int64, len(spans))
    ends = np.fromiter((e for _, e in spans), np.int64, len(spans))
    toks = [low[s:e] for s, e in spans]
    if len(low) != len(text):
        # cum[i] = offset in low where original char i begins
        lens = np.fromiter((len(c.lower()) for c in text), np.int64,
                           len(text))
        cum = np.concatenate(([0], np.cumsum(lens)))
        starts = np.searchsorted(cum, starts, side="right") - 1
        ends = np.searchsorted(cum, ends - 1, side="right")
    return toks, starts, ends


def remove_duplicate_spans(ds, window_tokens: int = 50,
                           id_col: str = "doc_id",
                           text_col: str = "text", seed: int = 7,
                           num_partitions: int = 64,
                           cache_windows: bool = True,
                           broadcast_max: int = 4_000_000,
                           until_stable: bool = False,
                           max_passes: int = 10,
                           stats: dict | None = None):
    """ExactSubstr removal: rewrite ``text`` so every duplicated
    ``window_tokens``-token window survives only at its globally-first
    occurrence. Returns ``(id_col, text_col, removed_tokens)``; docs
    whose every token was cut DROP (the paradedup contract). Docs
    shorter than ``window_tokens`` tokens pass through untouched.

    ``until_stable=True`` re-runs the pass until a round removes zero
    tokens (the fixed point — one cut can create a NEW duplicate
    adjacency; see the caveat below) or ``max_passes`` rounds elapse
    (bounded; a warning logs if the bound hits first).
    ``removed_tokens`` then accumulates across rounds per doc. Pass a
    dict as ``stats`` to receive ``{"passes": n,
    "removed_tokens_per_pass": [...], "converged": bool}`` — the
    iteration record for run manifests. Each round materializes its
    output (the loop's bounded state: one (id, text, removed) corpus
    snapshot, never window-grain data).

    Dataflow: count pass (map-side combined partials) -> duplicated-hash
    set -> ONLY windows bearing a duplicated hash shuffle to the
    keep-first ranking (bucketed by whash; the dup-window tail is tiny
    next to the corpus, so the rank shuffle moves a sliver of the window
    table) -> non-first occurrences span-merge per doc -> one bucketed
    doc co-location applies the char-level cuts. The duplicated-hash set
    broadcasts below ``broadcast_max`` (32 MB of int64s); above it the
    filter runs as the house mixed-union bucketed groupby, so driver
    memory never depends on how duplicated the corpus is.
    ``cache_windows`` carries duplicate_spans' semantics: True (default)
    materializes the window table once for its two consumers; at 100 TB
    prefer False — both consumers recompute the cheap hashing pass and
    everything streams with no corpus-sized object-store residency.

    Caveat (inherent to one-pass window semantics, shared with Lee et
    al.'s implementation): cutting a span can create a NEW adjacency
    that itself duplicates elsewhere; the default single pass leaves
    it, ``until_stable=True`` re-runs to the fixed point.
    """
    if until_stable:
        return _remove_spans_until_stable(
            ds, window_tokens=window_tokens, id_col=id_col,
            text_col=text_col, seed=seed,
            num_partitions=num_partitions,
            cache_windows=cache_windows, broadcast_max=broadcast_max,
            max_passes=max_passes, stats=stats)
    # ids travel as strings through the union/groupby plumbing; the
    # OUTPUT corpus restores the input id dtype (an int64-keyed corpus
    # must not come back string-keyed)
    _sch = ds.schema()
    id_type = dict(zip(_sch.names, _sch.types))[id_col]

    windows = ds.select_columns([id_col, text_col]).map_batches(
        _window_rows(window_tokens, id_col, text_col, seed),
        batch_format="pyarrow")
    if cache_windows:
        windows = windows.materialize()

    hs_small, dup_hashes, n_dup = _dup_hash_set(
        windows, num_partitions=num_partitions,
        cache_windows=cache_windows)
    dup_windows = _mark_back(windows, hs_small, dup_hashes, n_dup,
                             id_col=id_col,
                             num_partitions=num_partitions,
                             broadcast_max=broadcast_max,
                             keep_hash=True)

    # ---- keep-first ranking: co-locate every occurrence of each dup
    # hash, flag all but the smallest (id, pos) ----
    def bucket_h(t: pa.Table) -> pa.Table:
        b = (t["whash"].to_numpy(zero_copy_only=False)
             % num_partitions).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def flag_non_first(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="object"),
                                 "pos": pd.Series(dtype="int64")})
        g = g.sort_values(["whash", id_col, "pos"], kind="mergesort")
        h = g["whash"].to_numpy()
        first = np.r_[True, h[1:] != h[:-1]]
        out = g[~first]
        return out[[id_col, "pos"]]

    flagged = (dup_windows.map_batches(bucket_h, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(flag_non_first, batch_format="pandas"))

    # ---- span merge per doc (same chain rule as duplicate_spans) ----
    def bucket_doc_pd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (hash64_vec(df[id_col].to_list())
                        % np.uint64(num_partitions)).astype(np.int32)
        return df

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        cols = {id_col: "object", "span_start": "int64",
                "span_end": "int64"}
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=d)
                                 for c, d in cols.items()})
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy()
        pos = g["pos"].to_numpy(dtype=np.int64)
        b = np.flatnonzero(np.r_[True, (ids[1:] != ids[:-1])
                                 | (pos[1:] > pos[:-1] + window_tokens)])
        e = np.r_[b[1:], len(pos)]
        return pd.DataFrame({
            id_col: ids[b],
            "span_start": pos[b],
            "span_end": pos[e - 1] + window_tokens})

    spans = (flagged.map_batches(bucket_doc_pd, batch_format="pandas")
             .groupby("bucket")
             .map_groups(merge_spans, batch_format="pandas"))

    # ---- apply cuts: docs + spans co-located per doc bucket ----
    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].cast(pa.string()),
            text_col: t[text_col].cast(pa.large_string()),
            "span_start": pa.nulls(t.num_rows, pa.int64()),
            "span_end": pa.nulls(t.num_rows, pa.int64())})

    def span_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].cast(pa.string()),
            text_col: pa.nulls(t.num_rows, pa.large_string()),
            "span_start": t["span_start"].cast(pa.int64()),
            "span_end": t["span_end"].cast(pa.int64())})

    def bucket_doc_pa(t: pa.Table) -> pa.Table:
        b = (hash64_vec(t[id_col].to_pylist())
             % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def apply_cuts(g: pd.DataFrame) -> pd.DataFrame:
        # doc rows carry null span_start (never null text — a null-text
        # doc is still a doc row and passes through untouched)
        docs = g[g["span_start"].isna()]
        sp = g[g["span_start"].notna()]
        by_doc: dict = {}
        for i, s, e in zip(sp[id_col].to_numpy(),
                           sp["span_start"].to_numpy(dtype=np.int64),
                           sp["span_end"].to_numpy(dtype=np.int64)):
            by_doc.setdefault(i, []).append((int(s), int(e)))
        out_id, out_text, out_rm = [], [], []
        for i, text in zip(docs[id_col].to_numpy(),
                           docs[text_col].to_numpy()):
            cuts = by_doc.get(i)
            if not cuts or text is None:
                out_id.append(i); out_text.append(text); out_rm.append(0)
                continue
            toks, starts, ends = _token_char_spans(text)
            n = len(toks)
            removed = 0
            pieces, cursor = [], 0
            for s, e in sorted(cuts):
                e = min(e, n)
                if s >= n or s >= e:
                    continue
                removed += e - s
                cs, ce = int(starts[s]), int(ends[e - 1])
                if cs > cursor:
                    pieces.append(text[cursor:cs])
                cursor = max(cursor, ce)
            pieces.append(text[cursor:])
            if removed >= n:
                continue  # fully-cut doc drops
            out_id.append(i)
            out_text.append("".join(pieces))
            out_rm.append(removed)
        return pd.DataFrame({
            id_col: pd.Series(out_id, dtype="object"),
            text_col: pd.Series(out_text, dtype="object"),
            "removed_tokens": pd.Series(out_rm, dtype="int64")})

    def restore_id_type(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(id_col)
        return t.set_column(i, id_col,
                            pa.compute.cast(t[id_col], id_type))

    mixed = (ds.select_columns([id_col, text_col])
             .map_batches(doc_rows, batch_format="pyarrow")
             .union(spans.map_batches(span_rows, batch_format="pyarrow")))
    return (mixed.map_batches(bucket_doc_pa, batch_format="pyarrow")
            .groupby("bucket").map_groups(apply_cuts,
                                          batch_format="pandas")
            .map_batches(restore_id_type, batch_format="pyarrow"))


def _remove_spans_until_stable(ds, *, window_tokens, id_col, text_col,
                               seed, num_partitions, cache_windows,
                               broadcast_max, max_passes, stats):
    """Bounded fixed-point loop over the one-pass removal. Per-round
    state is the (id, text, removed_tokens) corpus snapshot; previous
    removed counts carry into the next round through an inner join on
    the id (docs fully cut in a later round drop with their counts)."""
    import logging

    import pyarrow.compute as pc

    def one_pass(cur):
        return remove_duplicate_spans(
            cur, window_tokens=window_tokens, id_col=id_col,
            text_col=text_col, seed=seed,
            num_partitions=num_partitions,
            cache_windows=cache_windows,
            broadcast_max=broadcast_max).materialize()

    # a pass "changed" the corpus if it removed tokens OR dropped a
    # fully-cut doc — dropped docs never emit removed_tokens, so the
    # token sum alone would read a drop-only round as convergence
    per_pass: list[int] = []
    dropped_per_pass: list[int] = []
    # materialize ONCE before counting: count() on the lazy lineage would
    # execute the whole upstream pipeline and one_pass would re-execute
    # it (the connected_components waste class, commit 2e4121e)
    ds = ds.materialize()
    n_prev = ds.count()
    acc = one_pass(ds)
    n_acc = acc.count()
    per_pass.append(int(acc.sum(on="removed_tokens") or 0))
    dropped_per_pass.append(n_prev - n_acc)
    changed = per_pass[-1] > 0 or dropped_per_pass[-1] > 0
    while changed and len(per_pass) < max_passes:
        nxt = one_pass(acc.drop_columns(["removed_tokens"]))
        removed = int(nxt.sum(on="removed_tokens") or 0)
        n_nxt = nxt.count()
        per_pass.append(removed)
        dropped_per_pass.append(n_acc - n_nxt)
        changed = removed > 0 or n_nxt < n_acc
        if not changed:
            break  # nxt's text is identical to acc's; keep acc
        prev = acc.map_batches(
            lambda t: pa.table({id_col: t[id_col],
                                "_rm_prev": t["removed_tokens"]}),
            batch_format="pyarrow")
        # join partitions clamp below cluster CPUs (the hash join's
        # aggregator actors deadlock otherwise — export.py's
        # _default_join_partitions rule)
        from ..pipelines.export import _default_join_partitions

        acc = (nxt.join(prev, "inner", _default_join_partitions(),
                        on=(id_col,))
               .map_batches(
                   lambda t: pa.table({
                       id_col: t[id_col],
                       text_col: t[text_col],
                       "removed_tokens": pc.add(t["removed_tokens"],
                                                t["_rm_prev"])}),
                   batch_format="pyarrow")
               .materialize())
        n_acc = n_nxt
    converged = not changed
    if not converged:
        logging.getLogger(__name__).warning(
            "remove_duplicate_spans(until_stable=True): max_passes=%d "
            "reached while the last round still removed %d tokens / "
            "dropped %d docs — output is NOT the fixed point",
            max_passes, per_pass[-1], dropped_per_pass[-1])
    if stats is not None:
        stats["passes"] = len(per_pass)
        stats["removed_tokens_per_pass"] = per_pass
        stats["docs_dropped_per_pass"] = dropped_per_pass
        stats["converged"] = converged
    return acc


def remove_duplicate_spans_sequential(rows: list[dict],
                                      window_tokens: int = 50,
                                      id_col: str = "doc_id",
                                      text_col: str = "text",
                                      seed: int = 7) -> list[dict]:
    """Single-process oracle for remove_duplicate_spans: one dict over
    the whole corpus, occurrences ranked by (id-as-string, pos), cuts
    applied with the identical char-offset rule. O(corpus) memory —
    tests only."""
    occ: dict[int, list[tuple[str, int]]] = {}
    toks_cache: dict[str, tuple] = {}
    for r in rows:
        i = str(r[id_col])
        toks, starts, ends = _token_char_spans(r[text_col] or "")
        toks_cache[i] = (toks, starts, ends, r[text_col])
        wh = _window_hashes(r[text_col] or "", window_tokens, seed)
        for p, h in enumerate(wh.tolist()):
            occ.setdefault(h, []).append((i, p))
    flagged: dict[str, list[int]] = {}
    for h, lst in occ.items():
        if len(lst) < 2:
            continue
        for i, p in sorted(lst)[1:]:
            flagged.setdefault(i, []).append(p)
    out = []
    for r in rows:
        i = str(r[id_col])
        toks, starts, ends, text = toks_cache[i]
        poss = sorted(flagged.get(i, []))
        if not poss or text is None:
            out.append({id_col: r[id_col], text_col: text,
                        "removed_tokens": 0})
            continue
        spans, cur_s, cur_e = [], poss[0], poss[0] + window_tokens
        for p in poss[1:]:
            if p > cur_e:
                spans.append((cur_s, cur_e)); cur_s = p
            cur_e = p + window_tokens
        spans.append((cur_s, cur_e))
        n = len(toks)
        removed, pieces, cursor = 0, [], 0
        for s, e in spans:
            e = min(e, n)
            if s >= n or s >= e:
                continue
            removed += e - s
            cs, ce = int(starts[s]), int(ends[e - 1])
            if cs > cursor:
                pieces.append(text[cursor:cs])
            cursor = max(cursor, ce)
        pieces.append(text[cursor:])
        if removed >= n:
            continue
        out.append({id_col: r[id_col], text_col: "".join(pieces),
                    "removed_tokens": removed})
    return out
