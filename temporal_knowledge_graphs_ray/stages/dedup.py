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
    hamming64,
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


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, num_bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8):
    """Full MinHash-LSH near-dup pipeline.

    Returns a pandas DataFrame (id, cluster_id) for near-duplicate docs
    (cluster_id = min member id). The verified-pair set is tiny relative to
    the corpus (only near-dups survive), so the final union-find runs on
    the driver — the documented smallness assumption; at extreme dup rates
    switch to iterated min-label propagation.
    """
    texts_ref = None  # texts fetched per verified pair below

    band_ds = minhash_rows(ds, text_col, id_col, num_perm, num_bands, shingle_k)
    cand = _candidate_pairs_from_bands(band_ds, id_col).to_pandas()
    cand = cand.drop_duplicates(ignore_index=True)
    if cand.empty:
        return pd.DataFrame({id_col: [], "cluster_id": []})

    # verify true n-gram Jaccard for candidates (broadcast the shingle sets
    # of candidate docs only — small side)
    needed = sorted(set(cand["a"]) | set(cand["b"]))
    import pyarrow.compute as pc

    def keep_needed(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=pa.array(needed)))

    doc_rows = (
        ds.map_batches(keep_needed, batch_format="pyarrow")
        .select_columns([id_col, text_col]).take_all()
    )
    shingles = {r[id_col]: set(word_shingles(r[text_col], shingle_k))
                for r in doc_rows}
    verified = [
        (a, b) for a, b in zip(cand["a"], cand["b"])
        if jaccard(shingles[a], shingles[b]) >= jaccard_threshold
    ]
    _ = texts_ref
    rows = []
    for cluster in cluster_pairs(verified):
        cid = min(cluster)
        for member in cluster:
            rows.append({id_col: member, "cluster_id": cid})
    out = pd.DataFrame(rows, columns=[id_col, "cluster_id"])
    return out.sort_values(id_col, ignore_index=True)


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """SimHash near-dup: 4 x 16-bit block buckets, verify Hamming distance.

    Returns pandas (a, b, hamming) pairs with distance <= max_hamming.
    """

    def sims(batch: pa.Table) -> pa.Table:
        ids, hashes, blocks, block_ix = [], [], [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            h = simhash64(word_shingles(text, 2))
            for b in range(4):
                ids.append(did)
                hashes.append(np.int64(np.uint64(h).astype(np.int64)))
                blocks.append((h >> (16 * b)) & 0xFFFF)
                block_ix.append(b)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(hashes, pa.int64()),
             pa.array(blocks, pa.int32()),
             pa.array(block_ix, pa.int32())],
            names=[id_col, "simhash", "block", "block_index"],
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        combined = pc.add(
            pc.multiply(t["block_index"].cast(pa.int64()),
                        pa.scalar(65536, pa.int64())),
            t["block"].cast(pa.int64()),
        )
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(combined,
                                              pa.scalar(63, pa.int64())),
                              pa.int32()))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["block_index", "block", id_col, "simhash"]].drop_duplicates()
        m = df.merge(df, on=["block_index", "block"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        if m.empty:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ham = [
            hamming64(int(x) & (2**64 - 1), int(y) & (2**64 - 1))
            for x, y in zip(m["simhash_a"], m["simhash_b"])
        ]
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
