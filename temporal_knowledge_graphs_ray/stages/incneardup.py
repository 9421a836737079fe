"""Cross-snapshot incremental NEAR-dedup against a persisted MinHash
store (scale addition — the recurring-crawl shape, like
stages/incdedup.py, but for NEAR duplicates: each new crawl must drop
documents that are near-copies of anything already in the accumulated
corpus WITHOUT re-shingling or even re-reading the corpus text).

The store holds, per accumulated doc, only its MinHash state:

- ``bands/inc-NNNNN/``: exploded ``(doc_id, band_index, band_hash)``
  LSH rows (~``num_bands`` x 20 B per doc) — the candidate-generation
  side;
- ``sigs/inc-NNNNN/``: ``(doc_id, sig)`` rows where ``sig`` is the
  little-endian uint64[num_perm] signature hex-encoded
  (~``num_perm`` x 16 B per doc) — the verification side;
- ``_meta.json``: the (num_perm, num_bands, shingle_k) the store was
  built with; every later write validates against it, because band
  hashes from different parameters never collide meaningfully.

At 64 perms / 16 bands that is ~1.3 KB per document — three orders of
magnitude below web-document text, so a 100 TB corpus carries a
~100 GB store that lives on shared storage and is read (never
rewritten) by every increment. Appends are numbered increment
DIRECTORIES of part files written by a distributed sharded
``write_parquet`` into a ``.tmp`` sibling and atomically renamed into
place (single writer per store by contract) — the driver never holds
an increment in memory; a killed update leaves a valid store, and
re-running the increment regenerates exactly the missing entries.

Match semantics: a new doc is dropped when it shares >= 1 LSH band
with a stored doc AND the signature agreement fraction
``mean(sig_new[i] == sig_store[i])`` is >= ``jaccard_threshold``.
Signature agreement is the standard unbiased MinHash estimator of
Jaccard — the store deliberately does NOT retain shingle sets, so
exact-Jaccard verification (what the in-corpus
``minhash_verified_pairs`` does, where text is at hand) is not
available; estimator stddev at J=t is ``sqrt(t(1-t)/num_perm)``
(~0.05 at t=0.8, 64 perms). That trade is the point: verification
against the whole corpus history costs two bounded hash joins on the
candidate set, never a corpus pass.

Docs with fewer than ``shingle_k`` words are excluded from the store
AND from matching (no full shingle exists), mirroring
``minhash_verified_pairs``'s guard — such docs always survive here;
route them through the exact store (stages/incdedup.py) instead.

Scale notes: candidate generation unions the new increment's band
rows with the store's band rows and groups by a bounded bucket of the
uniform band hash (the ``_candidate_pairs_from_bands`` pattern);
within a group the new x store merge is capped at
``max_store_partners`` smallest store ids per (new doc, band) — a new
doc needs only ONE surviving partner to be dropped, so the cap costs
recall only if every one of the first K band-mates fails the
signature check (boilerplate-hot bands; the skip count is reported in
``return_stats``). Verification joins ride Ray's hash join on uniform
int64 keys; matched-id suppression broadcasts below
``broadcast_limit`` ids and switches to a LEFT ANTI join above it
(the stages/incdedup.py gate). Doc ids must be unique ACROSS
snapshots (the 63-bit WET ids are; sources/wet.py).

No reference equivalent (its dedup is entity-level, SURVEY.md §2.6);
this extends the corpus-dedup family the 100 TB brief leads with.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import minhash_bands, minhash_signature, word_shingles

_SIG = "sig"
_PARAMS = ("num_perm", "num_bands", "shingle_k")

# per (new doc, band) at most this many smallest store ids become
# verification candidates — linear in the hot-band case, recall caveat
# in the module docstring, skips surfaced via return_stats
_MAX_STORE_PARTNERS = 64


# ---------------------------------------------------------------- store I/O
#
# each increment is a DIRECTORY ``inc-NNNNN/`` of part files written by a
# distributed ``write_parquet`` into a ``.tmp`` sibling and atomically
# renamed into place — the driver never concatenates an increment (or the
# store) in memory, so store init over a billion-doc corpus streams.
# ``.tmp`` leftovers from a kill are invisible to readers and overwritten
# by the re-run.

def _list_increments(store_dir: str, sub: str) -> list[str]:
    """inc-NNNNN entry paths (directories; also bare .parquet files so a
    hand-placed single-file increment still reads)."""
    d = os.path.join(store_dir, sub)
    if not os.path.isdir(d):
        return []
    out = []
    for e in os.listdir(d):
        if not e.startswith("inc-") or e.endswith(".tmp"):
            continue
        out.append(os.path.join(d, e))
    return sorted(out)


def _subdir_files(store_dir: str, sub: str) -> list[str]:
    """every parquet part file across the sub-store's increments."""
    files = []
    for entry in _list_increments(store_dir, sub):
        if os.path.isdir(entry):
            files.extend(sorted(
                os.path.join(entry, f) for f in os.listdir(entry)
                if f.endswith(".parquet")))
        elif entry.endswith(".parquet"):
            files.append(entry)
    return files


def _next_inc_dir(store_dir: str, sub: str) -> str:
    # max existing index + 1, NOT entry count (compaction collapses to
    # one high-numbered entry — stages/incdedup.py:_next_inc_path
    # rationale)
    d = os.path.join(store_dir, sub)
    os.makedirs(d, exist_ok=True)
    nxt = 0
    for entry in _list_increments(store_dir, sub):
        stem = os.path.basename(entry)
        try:
            nxt = max(nxt, int(stem.removesuffix(".parquet")[4:]) + 1)
        except ValueError:
            continue
    return os.path.join(d, f"inc-{nxt:05d}")


def _counts_path(store_dir: str, sub: str) -> str:
    # does not start with "inc-", so increment listing ignores it
    return os.path.join(store_dir, sub, "_counts.json")


def _load_counts(store_dir: str, sub: str) -> dict:
    p = _counts_path(store_dir, sub)
    if not os.path.exists(p):
        return {}
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        # a damaged sidecar must not brick the store: degrade to the
        # documented per-entry footer-scan fallback (the next append
        # rewrites the file)
        return {}


def _save_counts(store_dir: str, sub: str, counts: dict) -> None:
    p = _counts_path(store_dir, sub)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(counts, f)
    os.replace(tmp, p)


def _write_increment_ds(ds, store_dir: str, sub: str,
                        rows: int | None = None) -> None:
    """Distributed sharded write of one increment: parts land in a .tmp
    dir, then one atomic rename publishes the increment. ``rows`` (when
    the caller knows it) is recorded in the sub-store's ``_counts.json``
    sidecar so bucket sizing never re-reads parquet footers; a crash
    between the rename and the sidecar update just means that entry
    falls back to a footer scan (see :func:`_scaled_num_buckets`)."""
    import shutil

    path = _next_inc_dir(store_dir, sub)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)  # stale kill leftover
    ds.write_parquet(tmp)
    # a zero-row dataset writes no files AND creates no dir — publish
    # an empty increment anyway so callers like the all-removed
    # takedown don't crash on the rename
    os.makedirs(tmp, exist_ok=True)
    os.replace(tmp, path)
    if rows is not None:
        counts = _load_counts(store_dir, sub)
        counts[os.path.basename(path)] = int(rows)
        _save_counts(store_dir, sub, counts)


def store_params(store_dir: str) -> dict | None:
    """The (num_perm, num_bands, shingle_k) a store was built with, or
    None for an uninitialized store — callers that should follow the
    STORE's parameters rather than impose their own (e.g. the curate
    funnel's cross-snapshot leg) read them here."""
    meta_path = os.path.join(store_dir, "_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    return {k: meta[k] for k in _PARAMS}


def _check_meta(store_dir: str, num_perm: int, num_bands: int,
                shingle_k: int, create: bool = True) -> None:
    """First write records the MinHash parameters; later calls (reads
    and writes both) must match — mixed-parameter band hashes would
    silently never collide, reading as a clean corpus.

    ``create=False`` (the dedup/read path) validates an existing
    ``_meta.json`` but NEVER creates the store dir or writes the meta
    — a typo'd store path must not leave a bogus half-initialized
    store behind (it logs a warning and dedups against nothing, which
    the CLI turns into a hard error)."""
    meta_path = os.path.join(store_dir, "_meta.json")
    params = {"num_perm": num_perm, "num_bands": num_bands,
              "shingle_k": shingle_k}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
        got = {k: existing.get(k) for k in _PARAMS}
        if got != params:
            raise ValueError(
                f"minhash store {store_dir} was built with {got}, "
                f"call uses {params}")
        return
    if not create:
        if (_list_increments(store_dir, "bands")
                or _list_increments(store_dir, "sigs")):
            # band/sig data WITHOUT the meta (lost in a partial copy):
            # parameters cannot be validated, and a silent mismatch
            # would read every near-dup as clean — refuse loudly
            raise ValueError(
                f"minhash store {store_dir} has data but no "
                "_meta.json — cannot validate MinHash parameters")
        import logging

        logging.getLogger(__name__).warning(
            "minhash store %s has no _meta.json — deduping against an "
            "empty store (typo'd path?)", store_dir)
        return
    os.makedirs(store_dir, exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, meta_path)


# ------------------------------------------------------------ minhash pass

def minhash_state_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, num_bands: int = 16,
                       shingle_k: int = 3):
    """documents -> (id, sig, band_0..band_{B-1}) rows in ONE shingle
    pass: ``sig`` is the hex-encoded little-endian uint64[num_perm]
    signature, ``bands`` a fixed-width set of int64 columns (exploded
    lazily by :func:`_band_rows` — kept wide here so sig and bands
    come from a single shingle/signature computation). Docs without a
    full ``shingle_k``-word shingle are excluded entirely."""

    def rows(batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        band_cols: list[list[int]] = [[] for _ in range(num_bands)]
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            grams = word_shingles(text, shingle_k) if text else []
            if not (grams and len(grams[0].split(" ")) >= shingle_k):
                continue
            sig = minhash_signature(grams, num_perm)
            ids.append(did)
            # hex, not raw bytes: the blob rides Ray/Arrow hash joins as
            # a plain string column (raw bytes with NULs can't)
            sigs.append(sig.astype("<u8").tobytes().hex())
            for bi, bh in enumerate(minhash_bands(sig, num_bands)):
                band_cols[bi].append(bh)
        arrays = [pa.array(ids, pa.int64()), pa.array(sigs, pa.string())]
        names = [id_col, _SIG]
        for bi in range(num_bands):
            arrays.append(pa.array(band_cols[bi], pa.int64()))
            names.append(f"band_{bi}")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(rows, batch_format="pyarrow", batch_size=1024)


def _band_rows(state_ds, id_col: str, num_bands: int):
    """wide state rows -> exploded (id, band_index, band_hash) rows."""

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_ids = np.repeat(ids, num_bands)
        out_ix = np.tile(np.arange(num_bands, dtype=np.int32), n)
        cols = [t[f"band_{bi}"].to_numpy(zero_copy_only=False)
                for bi in range(num_bands)]
        out_h = np.column_stack(cols).ravel() if n else np.array(
            [], dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.int64()), pa.array(out_ix, pa.int32()),
             pa.array(out_h, pa.int64())],
            names=[id_col, "band_index", "band_hash"])

    return state_ds.map_batches(explode, batch_format="pyarrow")


def _sig_rows(state_ds, id_col: str):
    return state_ds.select_columns([id_col, _SIG])


def _append_state(state_ds, store_dir: str, id_col: str,
                  num_bands: int) -> int:
    """Append one increment's band + sig entries (distributed sharded
    writes); ``state_ds`` must be MATERIALIZED (it is consumed three
    times). Returns docs written; a zero-doc increment (every doc
    shingle-less) writes nothing."""
    n = state_ds.count()
    if n == 0:
        return 0
    # bands first: a kill between the two writes then leaves orphan band
    # rows whose candidates can never verify (no sig row -> inner join
    # drops them) — membership-neutral, and the re-run regenerates both
    _write_increment_ds(_band_rows(state_ds, id_col, num_bands),
                        store_dir, "bands", rows=n * num_bands)
    _write_increment_ds(_sig_rows(state_ds, id_col), store_dir, "sigs",
                        rows=n)
    return n


def write_neardup_store(docs, store_dir: str, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 64,
                        num_bands: int = 16, shingle_k: int = 3) -> int:
    """Initialize/extend a store with a corpus's MinHash state; returns
    docs written (those with a full shingle). Near-dedup the corpus
    FIRST (stages/dedup.minhash_lsh_dedup) if you want the store to
    hold one representative per near-cluster."""
    _check_meta(store_dir, num_perm, num_bands, shingle_k)
    state = minhash_state_rows(docs, text_col, id_col, num_perm,
                               num_bands, shingle_k).materialize()
    return _append_state(state, store_dir, id_col, num_bands)


def remove_from_neardup_store(store_dir: str, ids) -> dict:
    """Takedown support (the store-level analogue of the KG store's
    crash-safe purge): delete the given doc ids from the accumulated
    MinHash state so they stop matching future crawls. Implemented as
    a compaction that anti-filters the ids — all increments are read
    distributed, filtered, rewritten as ONE new entry per side, and
    the old entries deleted after (same crash-safety argument as
    :func:`compact_neardup_store`: a kill mid-way leaves the filtered
    entry plus a subset of old ones, i.e. the removed docs may
    transiently still match — re-running completes the removal; it
    never corrupts). ``ids`` is any iterable of int doc ids; returns
    per-side rows before/after."""
    import shutil

    import ray.data as rd

    id_arr = pa.array(sorted({int(i) for i in ids}), pa.int64())
    out: dict = {"removed_ids": len(id_arr)}
    for sub in ("bands", "sigs"):
        entries = _list_increments(store_dir, sub)
        if not entries:
            out[sub] = {"rows_before": 0, "rows_after": 0}
            continue
        ds = rd.read_parquet(_subdir_files(store_dir, sub))
        id_col = [c for c in ds.columns()
                  if c not in (_SIG, "band_index", "band_hash")][0]

        def drop(t: pa.Table, col=id_col) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(
                t[col].cast(pa.int64()), value_set=id_arr)))

        before = ds.count()
        kept = ds.map_batches(drop, batch_format="pyarrow").materialize()
        n_rows = kept.count()
        _write_increment_ds(kept, store_dir, sub, rows=n_rows)
        for e in entries:
            if os.path.isdir(e):
                shutil.rmtree(e)
            else:
                os.remove(e)
        counts = _load_counts(store_dir, sub)
        gone = {os.path.basename(e) for e in entries}
        _save_counts(store_dir, sub,
                     {k: v for k, v in counts.items() if k not in gone})
        out[sub] = {"rows_before": before, "rows_after": n_rows}
    return out


def compact_neardup_store(store_dir: str) -> dict:
    """Merge each side's increments into one (distinct band rows; min
    sig per doc_id) — fully distributed: the groupby shuffles on the
    uniform hash/id keys and the merged entry is a sharded
    ``write_parquet``; the driver never holds store rows. Crash-safe
    without journals: duplicate rows on either side are match-neutral
    (a doc matching twice still matches), so merged-then-partially-
    deleted states over-count nothing — the stages/incdedup.py
    compaction argument."""
    import ray.data as rd
    from ray.data.aggregate import Min

    import shutil

    out = {}
    for sub in ("bands", "sigs"):
        entries = _list_increments(store_dir, sub)
        if len(entries) <= 1:
            out[sub] = {"increments_before": len(entries),
                        "increments_after": len(entries)}
            continue
        ds = rd.read_parquet(_subdir_files(store_dir, sub))
        if sub == "bands":
            cols = ds.columns()
            merged = ds.groupby(cols).count().select_columns(cols)
        else:
            id_col = [c for c in ds.columns() if c != _SIG][0]
            merged = (ds.groupby(id_col)
                      .aggregate(Min(_SIG, alias_name=_SIG)))
        merged = merged.materialize()  # consumed twice: write + count
        n_rows = merged.count()
        _write_increment_ds(merged, store_dir, sub, rows=n_rows)
        for e in entries:
            if os.path.isdir(e):
                shutil.rmtree(e)
            else:
                os.remove(e)
        # drop the deleted entries' sidecar rows (the merged entry's
        # own count was just recorded)
        counts = _load_counts(store_dir, sub)
        gone = {os.path.basename(e) for e in entries}
        _save_counts(store_dir, sub,
                     {k: v for k, v in counts.items() if k not in gone})
        out[sub] = {"increments_before": len(entries),
                    "increments_after": 1, "rows": n_rows}
    return out


# ------------------------------------------------------------- the operator

# target band rows per shuffle bucket: the store side accumulates
# across snapshots without bound, so the bucket count must scale with
# it (the pipelines/kg.py _buckets_from_skew sizing idea) — ~4M rows
# keeps one bucket's pandas frame ~100 MB
_BAND_ROWS_PER_BUCKET = 4_000_000


def _scaled_num_buckets(store_dir: str, sub: str = "bands") -> int:
    """next power of two >= store band rows / _BAND_ROWS_PER_BUCKET,
    floored at 64. Row counts come from the ``_counts.json`` sidecar
    each append records (one small read, not thousands of parquet
    footer round-trips on a lifetime store); entries missing from the
    sidecar — a crash window, or a hand-placed file — fall back to a
    footer scan of just those entries. No data is ever read."""
    import pyarrow.parquet as pq

    counts = _load_counts(store_dir, sub)
    rows = 0
    for entry in _list_increments(store_dir, sub):
        name = os.path.basename(entry)
        if name in counts:
            rows += int(counts[name])
            continue
        if os.path.isdir(entry):
            files = [os.path.join(entry, f) for f in os.listdir(entry)
                     if f.endswith(".parquet")]
        else:
            files = [entry]
        rows += sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    need = max(64, -(-rows // _BAND_ROWS_PER_BUCKET))
    return 1 << (need - 1).bit_length()


def _store_candidates(new_bands, store_files: list[str], id_col: str,
                      num_buckets: int = 64,
                      max_store_partners: int = _MAX_STORE_PARTNERS):
    """new (id, band_index, band_hash) rows x store band files ->
    distinct (new_id, store_id, skipped) candidate rows, bucketed by the
    uniform band hash; ``skipped`` rides along as per-group accounting
    (partners beyond the cap), summed by the caller for stats."""
    import ray.data as rd

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    store = rd.read_parquet(store_files).map_batches(
        tag(0), batch_format="pyarrow")
    tagged_new = new_bands.map_batches(tag(1), batch_format="pyarrow")
    both = tagged_new.union(store)

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = pc.cast(
            pc.bit_wise_and(t["band_hash"],
                            pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32())
        return t.append_column("bucket", bucket)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "new_id": pd.Series([], dtype="int64"),
            "store_id": pd.Series([], dtype="int64"),
            "skipped": pd.Series([], dtype="int64")})
        if not len(g):  # empty-group guard (house convention)
            return empty
        keys = ["band_index", "band_hash"]
        # drop duplicate rows first: crash-recovery replays legitimately
        # duplicate store band rows, which must not consume cap slots
        # or inflate the skip count
        new = (g.loc[g["side"] == 1, keys + [id_col]]
               .drop_duplicates()
               .rename(columns={id_col: "new_id"}))
        old = (g.loc[g["side"] == 0, keys + [id_col]]
               .drop_duplicates()
               .rename(columns={id_col: "store_id"}))
        if new.empty or old.empty:
            return empty
        # hot-band cap BEFORE the merge (so a boilerplate band of K
        # store docs x M new docs builds K_cap*M rows, never K*M):
        # smallest store ids win (deterministic); one surviving partner
        # is enough to drop a new doc, so only all-K_cap-fail bands
        # cost recall — skipped count surfaces it
        old = old.sort_values(keys + ["store_id"])
        ogrp = old.groupby(keys, sort=False)
        capped = old[ogrp.cumcount() < max_store_partners]
        excess = (ogrp.size() - max_store_partners).clip(lower=0)
        n_new = new.groupby(keys).size()
        skipped = int((excess * n_new).dropna().sum())
        m = new.merge(capped, on=keys)
        if m.empty and not skipped:
            return empty
        out = (m[["new_id", "store_id"]]
               .drop_duplicates(ignore_index=True)
               .astype({"new_id": "int64", "store_id": "int64"}))
        out["skipped"] = np.int64(0)
        if skipped:
            # one accounting row per group task (the simhash_dedup
            # sentinel pattern); filtered out before verification
            out = pd.concat([out, pd.DataFrame(
                {"new_id": [-1], "store_id": [-1],
                 "skipped": [skipped]})], ignore_index=True)
        return out

    return (both.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas"))


def _dedup_candidates(cand_ds):
    """distinct (new_id, store_id) via a composite-key groupby count —
    cross-bucket duplicates arise when a pair surfaces via bands in
    different shuffle buckets. An aggregate (not a ``map_groups``) on
    purpose: its Arrow output blocks feed Ray's hash join directly,
    whereas sorted-``map_groups`` output can carry schema-less empty
    blocks the join layer rejects."""
    return (cand_ds.groupby(["new_id", "store_id"]).count()
            .select_columns(["new_id", "store_id"]))


def _sig_agreement(t: pa.Table, threshold: float, num_perm: int) -> pa.Table:
    """(new_id, sig, sig_s) rows -> new_id rows whose signature
    agreement fraction >= threshold (vectorized over the batch)."""
    if t.num_rows == 0:
        return pa.table({"new_id": pa.array([], pa.int64())})
    a = np.frombuffer(
        b"".join(bytes.fromhex(s) for s in t[_SIG].to_pylist()),
        dtype="<u8").reshape(t.num_rows, num_perm)
    b = np.frombuffer(
        b"".join(bytes.fromhex(s) for s in t[f"{_SIG}_s"].to_pylist()),
        dtype="<u8").reshape(t.num_rows, num_perm)
    frac = (a == b).mean(axis=1)
    keep = t["new_id"].to_numpy(zero_copy_only=False)[frac >= threshold]
    return pa.table({"new_id": pa.array(keep, pa.int64())})


def neardup_against_store(new_docs, store_dir: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          jaccard_threshold: float = 0.8,
                          update_store: bool = False,
                          broadcast_limit: int = 2_000_000,
                          join_partitions: int | None = None,
                          return_stats: bool = False,
                          num_perm: int = 64, num_bands: int = 16,
                          shingle_k: int = 3):
    """Surviving rows of ``new_docs``: docs NOT a near-duplicate (>= 1
    shared LSH band + signature agreement >= threshold) of anything in
    the store. Does NOT near-dedup the new snapshot against itself —
    run stages/dedup.minhash_lsh_dedup on it first if wanted.
    ``update_store=True`` appends the survivors' MinHash state
    afterwards, so the next increment dedups against this one too.
    ``return_stats=True`` returns ``(survivors, stats)`` with candidate
    / matched / hot-band-skip counts."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    _check_meta(store_dir, num_perm, num_bands, shingle_k,
                create=False)
    state = minhash_state_rows(new_docs, text_col, id_col, num_perm,
                               num_bands, shingle_k).materialize()
    stats = {"new_docs_with_shingles": state.count(),
             "candidates": 0, "matched": 0, "hot_band_skipped": 0}

    band_files = _subdir_files(store_dir, "bands")
    sig_files = _subdir_files(store_dir, "sigs")
    matched = None
    if band_files and sig_files and stats["new_docs_with_shingles"]:
        raw = _store_candidates(
            _band_rows(state, id_col, num_bands), band_files, id_col,
            # bucket count scales with the (unboundedly accumulating)
            # store so one bucket's group frame stays ~100 MB
            num_buckets=_scaled_num_buckets(store_dir),
            # module global read at CALL time so tests can monkeypatch
            max_store_partners=_MAX_STORE_PARTNERS,
        ).materialize()  # consumed twice: sentinels + pairs
        if return_stats:  # the sentinel sum is its own job — skip it
            sentinels = raw.map_batches(
                lambda t: t.filter(pc.equal(t["new_id"], pa.scalar(-1))),
                batch_format="pyarrow")
            stats["hot_band_skipped"] = int(
                sentinels.sum(on="skipped") or 0)
        if join_partitions is None:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            join_partitions = max(2, min(64, ncpu // 2))
        # repartition before the joins: the candidate lineage runs
        # through pandas map_groups, whose empty partitions emit
        # zero-column blocks that Ray's hash join rejects ("no match
        # for FieldRef on left side"); repartition rebuilds uniform
        # Arrow blocks with the full schema
        cand = (_dedup_candidates(raw.map_batches(
            lambda t: t.filter(pc.not_equal(t["new_id"], pa.scalar(-1))),
            batch_format="pyarrow"))
            .repartition(join_partitions).materialize())
        stats["candidates"] = cand.count()
        if stats["candidates"]:
            new_sigs = _sig_rows(state, id_col).rename_columns(
                {id_col: "new_id"})
            store_sigs = (rd.read_parquet(sig_files)
                          .rename_columns({id_col: "store_id",
                                           _SIG: f"{_SIG}_s"}))
            # repartition between the chained joins for the same
            # reason as above: a join's own empty output partitions
            # are schema-less and poison the next join
            joined = (cand.join(new_sigs, "inner", join_partitions,
                                on=("new_id",))
                      .repartition(join_partitions)
                      .join(store_sigs, "inner", join_partitions,
                            on=("store_id",)))
            matched = (joined.map_batches(
                lambda t: _sig_agreement(t, jaccard_threshold, num_perm),
                batch_format="pyarrow")
                .groupby("new_id").count()
                .select_columns(["new_id"]).materialize())
            stats["matched"] = matched.count()

    # suppress matched ids on BOTH the returned docs and (for
    # update_store) the already-computed MinHash state — the state is
    # filtered, never recomputed, so an update run shingles each doc
    # exactly once (the module's no-re-shingling contract)
    if matched is None or stats["matched"] == 0:
        survivors = new_docs
        surv_state = state
    elif stats["matched"] <= broadcast_limit:
        drop = pa.concat_tables(
            matched.iter_batches(batch_format="pyarrow"))["new_id"]
        drop_ref = ray.put(drop.combine_chunks())

        def drop_matched(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(
                t[id_col].cast(pa.int64()), value_set=ray.get(drop_ref))))

        survivors = new_docs.map_batches(drop_matched,
                                         batch_format="pyarrow")
        surv_state = state.map_batches(drop_matched,
                                       batch_format="pyarrow")
    else:
        anti = matched.rename_columns({"new_id": id_col})
        survivors = new_docs.join(anti, "left_anti", join_partitions,
                                  on=(id_col,))
        surv_state = state.join(anti, "left_anti", join_partitions,
                                on=(id_col,))

    if update_store:
        # an update legitimately initializes a fresh store — write the
        # meta now (the read above deliberately did not)
        _check_meta(store_dir, num_perm, num_bands, shingle_k)
        _append_state(surv_state.materialize(), store_dir, id_col,
                      num_bands)
    if return_stats:
        return survivors, stats
    return survivors


# -------------------------------------------------------- sequential oracle

def neardup_against_store_sequential(store_docs: list[tuple[int, str]],
                                     new_docs: list[tuple[int, str]],
                                     jaccard_threshold: float = 0.8,
                                     num_perm: int = 64,
                                     num_bands: int = 16,
                                     shingle_k: int = 3) -> list[int]:
    """Pure-Python oracle: surviving new ids under the SAME kernels and
    match rule (shared band + signature agreement), no caps, no joins —
    tests compare the distributed operator against this."""
    def state(docs):
        out = {}
        for did, text in docs:
            grams = word_shingles(text, shingle_k) if text else []
            if not (grams and len(grams[0].split(" ")) >= shingle_k):
                continue
            sig = minhash_signature(grams, num_perm)
            out[did] = (sig, set(minhash_bands(sig, num_bands)))
        return out

    store = state(store_docs)
    new = state(new_docs)
    survivors = []
    for did, _ in new_docs:
        if did not in new:
            survivors.append(did)  # no full shingle: always survives
            continue
        sig, bands = new[did]
        dropped = False
        for ssig, sbands in store.values():
            if bands & sbands and (sig == ssig).mean() >= jaccard_threshold:
                dropped = True
                break
        if not dropped:
            survivors.append(did)
    return survivors
