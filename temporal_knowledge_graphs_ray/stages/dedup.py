"""Document deduplication stages (training-data pipeline additions).

No equivalent exists in the reference (its dedup is entity-level, SURVEY.md
§2.6); these are the corpus-level dedup operators a 100 TB training-data
pipeline needs, built on the stable hashing kernels (functions/hashing.py):

- exact dedup: content fingerprint -> hash-partitioned groupby -> keep the
  smallest doc_id per group (deterministic winner).
- MinHash-LSH near-dup: shingle -> minhash signature -> band hashes ->
  explode to (band_hash) rows -> groupby band -> candidate pairs -> verify
  true Jaccard -> connected components via union-find on the (small)
  verified-pair set.
- SimHash near-dup: 64-bit simhash -> bucket by 4 x 16-bit sub-keys (docs
  within Hamming distance <= 3 of each other share at least one sub-key if
  the differing bits fall outside it; standard block-permuted construction)
  -> verify Hamming distance within buckets.
- n-gram Jaccard: brute-force verified Jaccard over LSH candidates.

All stages are Dataset -> Dataset; heavy work is vectorized or per-batch,
shuffles are explicit groupbys keyed by hashes (uniformly distributed — no
skew by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    hamming64_vec,
    jaccard,
    minhash_bands,
    minhash_signature,
    simhash64,
    word_shingles,
)
from ..functions.textstats import fingerprint
from ..functions.unionfind import cluster_pairs


def add_fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> (id, fingerprint) via vectorized map_batches."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.Table.from_arrays(
            [
                batch[id_col],
                pa.array([fingerprint(t) for t in texts], pa.string()),
            ],
            names=[id_col, "fingerprint"],
        )

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=4096)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep one representative (min id) per content fingerprint.

    Pattern: add hash column -> groupby(hash) -> min(id). The groupby key
    is a uniform hash, so no skew handling is needed.
    """
    from ray.data.aggregate import Min

    return (
        add_fingerprint(ds, text_col, id_col)
        .groupby("fingerprint")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


def minhash_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, num_bands: int = 16, shingle_k: int = 3):
    """documents -> exploded (id, band_index, band_hash) rows."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids, bands_ix, bands_h = [], [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            if not text:  # null/empty text: no shingles
                continue
            sig = minhash_signature(word_shingles(text, shingle_k), num_perm)
            for bi, bh in enumerate(minhash_bands(sig, num_bands)):
                ids.append(did)
                bands_ix.append(bi)
                bands_h.append(bh)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(bands_ix, pa.int32()),
             pa.array(bands_h, pa.int64())],
            names=[id_col, "band_index", "band_hash"],
        )

    return ds.map_batches(sig_rows, batch_format="pyarrow", batch_size=1024)


def _candidate_pairs_from_bands(band_ds, id_col: str = "doc_id",
                                num_buckets: int = 64):
    """(band_index, band_hash) rows -> unique candidate id pairs.

    Shuffle key is ``band_hash % num_buckets`` (band groups are numerous
    and mostly singletons — a bounded bucket count keeps map_groups
    invocations fixed); within a bucket a vectorized pandas self-merge on
    the full band key generates the pairs.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bucket = pc.cast(
            pc.bit_wise_and(t["band_hash"],
                            pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("bucket", bucket)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["band_index", "band_hash", id_col]].drop_duplicates()
        # hot-band guard: a degenerate band key shared by B docs generates
        # B^2/2 pairs in one task (empty/boilerplate docs at web scale all
        # hash identically). Cap the group size and report the drop — the
        # exact-dedup pass catches identical docs anyway.
        sizes = df.groupby(["band_index", "band_hash"])[id_col].transform("size")
        hot = sizes > _MAX_BAND_GROUP
        if hot.any():
            import logging

            logging.getLogger(__name__).warning(
                "lsh-bands: dropping %d rows in bands over %d members "
                "(minhash or embedding-lsh candidate gen)",
                int(hot.sum()), _MAX_BAND_GROUP)
            df = df[~hot]
        m = df.merge(df, on=["band_index", "band_hash"],
                     suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        out.columns = ["a", "b"]
        return out

    return (
        band_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


# band groups larger than this are dropped (with a log line) rather than
# pair-expanded quadratically; identical docs are handled by exact_dedup
_MAX_BAND_GROUP = 4096

# candidate-id count above which the verification semi-join broadcasts a
# Bloom filter instead of the exact id value_set (tests force the Bloom
# path by monkeypatching this to 0 — output is identical either way)
_BLOOM_SEMIJOIN_MIN = 200_000


def _as_array(col) -> pa.Array:
    """Table column (ChunkedArray) -> single contiguous Array."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def minhash_verified_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, num_bands: int = 32,
                           shingle_k: int = 3,
                           jaccard_threshold: float = 0.8) -> pd.DataFrame:
    """MinHash-LSH candidates -> DISTRIBUTED exact-Jaccard verification.

    Returns (a, b, jaccard) for every candidate pair whose true shingle
    Jaccard >= threshold — with bands chosen so detection probability at
    the threshold is ~1 (num_bands=32 over 64 perms -> r=2,
    P(detect | J=0.8) = 1-(1-0.64)^32 ≈ 1-1e-14), this equals the exact
    all-pairs result and is checked against a pure-SQL inverted-index
    Jaccard oracle (the recall gate).

    Verification is worker-side: shingle sets are attached to pair-halves
    via a doc-keyed bucketed groupby, then pairs reunite via a pair-keyed
    bucketed groupby and Jaccard is computed inside the group task. The
    driver only ever holds the candidate PAIR set (near-dup candidates,
    tiny relative to the corpus) — never texts, shingles, or a Python
    verify loop. Above ``_BLOOM_SEMIJOIN_MIN`` candidate ids the worker
    semi-join broadcasts a fixed-size Bloom filter instead of the exact
    id set (functions/bloom.py; FPs are harmless — see inline note).

    Docs with fewer than ``shingle_k`` words are excluded (no full shingle
    exists — matching the SQL oracle's ``len(ws) >= k`` guard).
    """
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    band_ds = minhash_rows(ds, text_col, id_col, num_perm, num_bands,
                           shingle_k)
    # pairs are distinct within each band bucket already; cross-bucket
    # duplicates (same pair surfacing via several bands) are deduped on
    # the driver — the pair set is the same driver-bounded quantity the
    # semi-join filter below needs anyway, so no extra shuffle for it
    cand_pdf = (_candidate_pairs_from_bands(band_ds, id_col)
                .to_pandas().drop_duplicates(ignore_index=True))
    if cand_pdf.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    cand_ids = set(cand_pdf["a"]) | set(cand_pdf["b"])
    cand_tbl = pa.Table.from_arrays(
        [pa.array(cand_pdf["a"].astype("int64")),
         pa.array(cand_pdf["b"].astype("int64"))],
        names=["a", "b"])

    # Semi-join broadcast: below the threshold ship the exact id set into
    # ``pc.is_in``; above it ship a fixed-size Bloom filter instead (a
    # 10^8-id value_set is gigabytes per task broadcast, the Bloom is
    # ~10 bits/id). Bloom false positives are HARMLESS here: a non-
    # candidate doc's shingle row has no pair-half to join onto, so the
    # attach stage drops it — FPs cost shuffle bytes, never output rows.
    use_bloom = len(cand_ids) >= _BLOOM_SEMIJOIN_MIN
    if use_bloom:
        import ray

        from ..functions.bloom import bloom_from_int64

        bloom_ref = ray.put(bloom_from_int64(
            np.fromiter(cand_ids, np.int64, len(cand_ids))))
        needed = None
    else:
        bloom_ref = None
        needed = pa.array(sorted(cand_ids), pa.int64())

    # (doc, payload) rows: candidate docs' shingle sets, serialized as a
    # list column; non-candidates are filtered worker-side (semi-join)
    def shingle_rows(t: pa.Table) -> pa.Table:
        if bloom_ref is not None:
            import ray

            bf = ray.get(bloom_ref)  # local object-store hit per task
            mask = bf.contains_many(
                t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False))
            t = t.filter(pa.array(mask))
        else:
            t = t.filter(pc.is_in(t[id_col], value_set=needed))
        docs, sh = [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            grams = word_shingles(text, shingle_k) if text else []
            if grams and len(grams[0].split(" ")) >= shingle_k:
                docs.append(did)
                # serialized as one NUL-joined string (shingles never
                # contain NUL) — plain string columns survive the
                # pandas<->Arrow round-trips of the group stages
                sh.append("\x00".join(sorted(set(grams))))
        return pa.Table.from_arrays(
            [pa.array(docs, pa.int64()),
             pa.array([-1] * len(docs), pa.int64()),
             pa.array([-1] * len(docs), pa.int64()),
             pa.array(sh, pa.string())],
            names=["doc", "pa", "pb", "shingles"],
        )

    # pair-half rows: one per (pair, endpoint), shingles empty until joined
    def half_rows(t: pa.Table) -> pa.Table:
        a = _as_array(t["a"].cast(pa.int64()))
        b = _as_array(t["b"].cast(pa.int64()))
        doc = pa.concat_arrays([a, b])
        pa_col = pa.concat_arrays([a, a])
        pb_col = pa.concat_arrays([b, b])
        empty = pa.array([None] * len(doc), pa.string())
        return pa.Table.from_arrays([doc, pa_col, pb_col, empty],
                                    names=["doc", "pa", "pb", "shingles"])

    def attach_shingles(g: pd.DataFrame) -> pd.DataFrame:
        # one group per doc bucket: join the doc's shingle list onto its
        # pair-half rows
        sh_rows = g[g["pa"] < 0]
        lookup = dict(zip(sh_rows["doc"], sh_rows["shingles"]))
        halves = g[g["pa"] >= 0].copy()
        halves["shingles"] = halves["doc"].map(lookup)
        halves = halves[halves["shingles"].notna()]
        return halves[["pa", "pb", "doc", "shingles"]]

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (a, b), grp in g.groupby(["pa", "pb"], sort=False):
            if len(grp) != 2:
                continue  # an endpoint had no full shingle
            s1, s2 = (set(x.split("\x00")) for x in grp["shingles"])
            inter = len(s1 & s2)
            if inter == 0:
                continue
            j = inter / len(s1 | s2)
            if j >= jaccard_threshold:
                rows.append({"a": int(a), "b": int(b),
                             "jaccard": float(round_half_away(
                                 np.array([j]), 6)[0])})
        return pd.DataFrame(rows, columns=["a", "b", "jaccard"])

    def bucket_by(col: str, n: int = 64):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.append_column(
                "bucket",
                _pc.cast(_pc.bit_wise_and(t[col].cast(pa.int64()),
                                          pa.scalar(n - 1, pa.int64())),
                         pa.int32()))

        return fn

    import ray.data as rd

    halves_ds = rd.from_arrow(half_rows(cand_tbl))
    sh_ds = (ds.map_batches(shingle_rows, batch_format="pyarrow")
             .union(halves_ds))
    joined = (
        sh_ds.map_batches(bucket_by("doc"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_shingles, batch_format="pandas")
    )
    out = (
        joined.map_batches(bucket_by("pa"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return out.sort_values(["a", "b"], ignore_index=True)


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, num_bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8):
    """Full MinHash-LSH near-dup pipeline: verified pairs -> clusters.

    Thin wrapper over :func:`minhash_verified_pairs` (the distributed
    candidate + worker-side verify path — the driver never holds texts or
    shingles) followed by a union-find over the verified-pair set. Returns
    a pandas DataFrame (id, cluster_id) for near-duplicate docs
    (cluster_id = min member id). The verified-pair set is tiny relative
    to the corpus (only near-dups survive), so the final union-find runs
    on the driver — the documented smallness assumption; at extreme dup
    rates switch to iterated min-label propagation.
    """
    pairs = minhash_verified_pairs(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        num_bands=num_bands, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
    )
    if pairs.empty:
        return pd.DataFrame({id_col: [], "cluster_id": []})
    rows = []
    for cluster in cluster_pairs(list(zip(pairs["a"], pairs["b"]))):
        cid = min(cluster)
        for member in cluster:
            rows.append({id_col: member, "cluster_id": cid})
    out = pd.DataFrame(rows, columns=[id_col, "cluster_id"])
    return out.sort_values(id_col, ignore_index=True)


def _block_bounds(num_blocks: int) -> list[tuple[int, int]]:
    """Split 64 bits into num_blocks near-equal (offset, width) blocks."""
    base, extra = divmod(64, num_blocks)
    bounds, off = [], 0
    for i in range(num_blocks):
        w = base + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, num_blocks: int = 4):
    """SimHash near-dup: block-permuted bucket LSH, verify Hamming distance.

    Returns pandas (a, b, hamming) pairs with distance <= max_hamming.
    Pigeonhole guarantee: with ``num_blocks`` blocks, any pair within
    Hamming distance <= num_blocks - 1 shares at least one identical
    block, so recall is EXACT iff ``max_hamming < num_blocks`` (use
    num_blocks=9 for the standard Hamming-8 near-dup setting; the default
    4 x 16-bit blocks cover Hamming <= 3).
    """
    if not 2 <= num_blocks <= 64:
        raise ValueError(f"num_blocks must be in [2, 64], got {num_blocks}")
    bounds = _block_bounds(num_blocks)
    if max_hamming >= num_blocks:
        import logging

        logging.getLogger(__name__).warning(
            "simhash: max_hamming=%d >= num_blocks=%d — recall is "
            "approximate (pairs whose diffs span every block are missed)",
            max_hamming, num_blocks)

    def sims(batch: pa.Table) -> pa.Table:
        ids, hashes, blocks, block_ix = [], [], [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            if not text:  # null/empty text: nothing to hash
                continue
            h = simhash64(word_shingles(text, 2))
            for b, (off, w) in enumerate(bounds):
                ids.append(did)
                hashes.append(np.int64(np.uint64(h).astype(np.int64)))
                blocks.append((h >> off) & ((1 << w) - 1))
                block_ix.append(b)
        # int64 blocks: num_blocks=2 gives 32-bit block values, which
        # overflow int32
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(hashes, pa.int64()),
             pa.array(blocks, pa.int64()),
             pa.array(block_ix, pa.int32())],
            names=[id_col, "simhash", "block", "block_index"],
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # overflow-safe mix for any block width (the old 65536 multiplier
        # silently assumed <= 16-bit blocks)
        combined = pc.bit_wise_xor(
            pc.multiply(t["block_index"].cast(pa.int64()),
                        pa.scalar(2654435761, pa.int64())),
            t["block"].cast(pa.int64()),
        )
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(combined,
                                              pa.scalar(63, pa.int64())),
                              pa.int32()))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["block_index", "block", id_col, "simhash"]].drop_duplicates()
        # hot-group guard (same failure mode as the MinHash bands): B
        # boilerplate docs with identical simhash blocks would otherwise
        # pair-expand to B^2/2 rows in ONE task. Identical docs are the
        # exact-dedup pass's job; the drop is logged.
        sizes = df.groupby(["block_index", "block"])[id_col].transform("size")
        hot = sizes > _MAX_BAND_GROUP
        if hot.any():
            import logging

            logging.getLogger(__name__).warning(
                "simhash: dropping %d rows in blocks over %d members",
                int(hot.sum()), _MAX_BAND_GROUP)
            df = df[~hot]
        m = df.merge(df, on=["block_index", "block"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        if m.empty:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ham = hamming64_vec(m["simhash_a"].to_numpy(),
                            m["simhash_b"].to_numpy())
        m = m.assign(hamming=ham)
        m = m[m["hamming"] <= max_hamming]
        out = m[[f"{id_col}_a", f"{id_col}_b", "hamming"]]
        out.columns = ["a", "b", "hamming"]
        return out

    out = (
        ds.map_batches(sims, batch_format="pyarrow", batch_size=1024)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"], ignore_index=True))


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3, max_id: int = 40,
                        min_jaccard: float = 0.0):
    """Exact n-gram Jaccard over all pairs of a bounded id range.

    The exact (non-LSH) similarity-matrix variant, bounded for testing —
    the production path is minhash_lsh_dedup which verifies with the same
    Jaccard. Returns pandas (a, b, jaccard rounded to 6); pairs with
    empty shingle intersection are dropped. Docs with < shingle_k words
    are excluded (no full shingle exists).
    """
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    sub = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t[id_col], pa.scalar(max_id))),
            batch_format="pyarrow",
        )
        .select_columns([id_col, text_col])
        .take_all()
    )
    shingle_sets = {}
    for r in sub:
        words_shingles = word_shingles(r[text_col], shingle_k)
        # exclude docs shorter than one full shingle (SQL-oracle parity)
        if words_shingles and len(words_shingles[0].split(" ")) >= shingle_k:
            shingle_sets[r[id_col]] = set(words_shingles)
    ids = sorted(shingle_sets)
    rows = []
    for i, a in enumerate(ids):
        sa = shingle_sets[a]
        for b in ids[i + 1:]:
            sb = shingle_sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / len(sa | sb)
            if j >= min_jaccard:
                rows.append({"a": a, "b": b,
                             "jaccard": round_half_away(j, 6)})
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).sort_values(
        ["a", "b"], ignore_index=True)
