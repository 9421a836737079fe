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
        # hash identically). Hot groups switch from the quadratic
        # self-merge to a LINEAR star expansion — every member pairs with
        # the group's min id — the dedup analogue of canonicalize's
        # bounded hierarchical pass: candidate connectivity within the
        # group is preserved (verification + union-find reconnect the
        # cluster through the hub), only non-hub pair ENUMERATION is
        # skipped, so cluster-level recall survives where the old path
        # dropped the group outright.
        sizes = df.groupby(["band_index", "band_hash"])[id_col].transform("size")
        hot = sizes > _MAX_BAND_GROUP
        outs = []
        if hot.any():
            import logging

            logging.getLogger(__name__).warning(
                "lsh-bands: %d rows in bands over %d members — star "
                "expansion (linear, hub=min id) instead of all-pairs "
                "(minhash or embedding-lsh candidate gen)",
                int(hot.sum()), _MAX_BAND_GROUP)
            dh = df[hot]
            hub = dh.groupby(["band_index", "band_hash"])[id_col].transform("min")
            star = pd.DataFrame({"a": hub[dh[id_col] != hub],
                                 "b": dh.loc[dh[id_col] != hub, id_col]})
            outs.append(star.drop_duplicates())
            df = df[~hot]
        m = df.merge(df, on=["band_index", "band_hash"],
                     suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m[[f"{id_col}_a", f"{id_col}_b"]].drop_duplicates()
        out.columns = ["a", "b"]
        outs.append(out)
        return (pd.concat(outs, ignore_index=True)
                .drop_duplicates(ignore_index=True)
                .astype({"a": "int64", "b": "int64"}))

    return (
        band_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


# band groups larger than this star-expand (linear pairs to the min-id
# hub, cluster connectivity preserved) rather than pair-expanding
# quadratically; see the hot-group branches in _candidate_pairs_from_bands
# and simhash_dedup
_MAX_BAND_GROUP = 4096

# candidate-id count above which the verification semi-join broadcasts a
# Bloom filter instead of the exact id value_set (tests force the Bloom
# path by monkeypatching this to 0 — output is identical either way)
_BLOOM_SEMIJOIN_MIN = 200_000


def _as_array(col) -> pa.Array:
    """Table column (ChunkedArray) -> single contiguous Array."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _dedup_pair_rows(cand_ds):
    """Distinct (a, b) pairs via a composite-key groupby aggregate —
    the distributed replacement for driver-side ``drop_duplicates``
    over the candidate pair set (cross-bucket duplicates arise when
    the same pair surfaces through bands hashing into different
    shuffle buckets). An aggregate, not a bucketed ``map_groups``, on
    purpose: sorted-map_groups lineages emit schema-less empty blocks
    for empty partitions, a latent hazard for any downstream hash
    join (the stages/incneardup.py finding)."""
    return (cand_ds.groupby(["a", "b"]).count()
            .select_columns(["a", "b"]))


def minhash_verified_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, num_bands: int = 32,
                           shingle_k: int = 3,
                           jaccard_threshold: float = 0.8,
                           as_dataset: bool = False):
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

    ``as_dataset=True`` returns the verified pairs as an (unsorted)
    ``ray.data.Dataset`` instead of a sorted pandas frame — the 100 TB
    mode, where the pair set itself can be corpus-scale (boilerplate-
    heavy web crawls) and must stay off the driver end to end.
    """
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    band_ds = minhash_rows(ds, text_col, id_col, num_perm, num_bands,
                           shingle_k)
    # pairs are distinct within each band bucket already; cross-bucket
    # duplicates (same pair surfacing via several bands) dedup through a
    # second bucketed groupby keyed on the pair hash — the pair set
    # never lands on the driver as a frame
    cand_ds = _dedup_pair_rows(
        _candidate_pairs_from_bands(band_ds, id_col)).materialize()
    n_pairs = cand_ds.count()
    if n_pairs == 0:
        if as_dataset:
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64())}))
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    # Semi-join broadcast: below the threshold ship the exact id set into
    # ``pc.is_in``; above it ship a fixed-size Bloom filter instead (a
    # 10^8-id value_set is gigabytes per task broadcast, the Bloom is
    # ~10 bits/id). Bloom false positives are HARMLESS here: a non-
    # candidate doc's shingle row has no pair-half to join onto, so the
    # attach stage drops it — FPs cost shuffle bytes, never output rows.
    # Either way the driver only ever STREAMS id batches (into a numpy
    # unique or a fixed-size bitmap) — it never holds the pair frame.
    def _id_batches():
        for batch in (cand_ds.select_columns(["a", "b"])
                      .iter_batches(batch_format="pyarrow")):
            yield np.concatenate([
                batch["a"].to_numpy(zero_copy_only=False),
                batch["b"].to_numpy(zero_copy_only=False)]).astype(np.int64)

    use_bloom = 2 * n_pairs >= _BLOOM_SEMIJOIN_MIN
    if use_bloom:
        import ray

        from ..functions.bloom import BloomFilter

        bf = BloomFilter(max(1, 2 * n_pairs))
        for ids in _id_batches():
            bf.add_many(ids)
        bloom_ref = ray.put(bf)
        needed = None
    else:
        bloom_ref = None
        needed = pa.array(
            np.unique(np.concatenate(list(_id_batches()))), pa.int64())

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
        return (pd.DataFrame(rows, columns=["a", "b", "jaccard"])
                .astype({"a": "int64", "b": "int64",
                         "jaccard": "float64"}))

    def bucket_by(col: str, n: int = 64):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.append_column(
                "bucket",
                _pc.cast(_pc.bit_wise_and(t[col].cast(pa.int64()),
                                          pa.scalar(n - 1, pa.int64())),
                         pa.int32()))

        return fn

    halves_ds = cand_ds.map_batches(half_rows, batch_format="pyarrow")
    sh_ds = (ds.map_batches(shingle_rows, batch_format="pyarrow")
             .union(halves_ds))
    joined = (
        sh_ds.map_batches(bucket_by("doc"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_shingles, batch_format="pandas")
    )
    verified = (
        joined.map_batches(bucket_by("pa"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
    if as_dataset:
        return verified
    out = verified.to_pandas()
    if out.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return out.sort_values(["a", "b"], ignore_index=True)


# verified-pair count above which cluster assignment routes through the
# distributed connected_components (hash-min label propagation) instead
# of a driver-side union-find loop; tests force the distributed path by
# monkeypatching this to 0. _CC_LOCAL_EDGE_CUTOFF is forwarded to
# connected_components' own local shortcut (0 in forced-distributed
# tests so the label-propagation rounds genuinely run).
_DRIVER_CLUSTER_MAX = 500_000
_CC_LOCAL_EDGE_CUTOFF = 500_000

# doc ids are zero-padded to this width so connected_components'
# lexicographic-min component label equals the numeric min member id
_ID_PAD = 20


def _cluster_pairs_distributed(pairs_ds, id_col: str):
    """(a, b) pair Dataset -> (id_col, cluster_id) Dataset via the
    distributed connected_components (pipelines/graph.py). Ids must be
    non-negative (the engine's 63-bit doc-id contract) — they are
    zero-padded to strings so the component label (lexicographic min)
    is the numeric min member, matching the driver union-find's
    cluster_id convention exactly."""
    import pyarrow.compute as pc

    from ..pipelines.graph import connected_components

    def to_edges(t: pa.Table) -> pa.Table:
        a = [f"{x:0{_ID_PAD}d}" for x in t["a"].to_pylist()]
        b = [f"{x:0{_ID_PAD}d}" for x in t["b"].to_pylist()]
        return pa.table({"subj_id": pa.array(a, pa.string()),
                         "obj_id": pa.array(b, pa.string())})

    comp = connected_components(
        pairs_ds.map_batches(to_edges, batch_format="pyarrow"),
        local_edge_cutoff=_CC_LOCAL_EDGE_CUTOFF)

    def back(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(t["entity_id"], pa.int64()),
            "cluster_id": pc.cast(t["component"], pa.int64())})

    return comp.map_batches(back, batch_format="pyarrow")


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, num_bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8,
                      as_dataset: bool = False):
    """Full MinHash-LSH near-dup pipeline: verified pairs -> clusters.

    Wrapper over :func:`minhash_verified_pairs` (the distributed
    candidate + worker-side verify path — the driver never holds texts,
    shingles, or the pair frame) followed by cluster assignment over the
    verified-pair set. Returns (id, cluster_id) rows for near-duplicate
    docs (cluster_id = min member id).

    Cluster assignment is GATED on the verified-pair count: at or below
    ``_DRIVER_CLUSTER_MAX`` pairs (only near-dups survive verification,
    so this covers any realistic dup rate at bench scale) a driver-side
    union-find resolves clusters; above it — boilerplate-replicated web
    crawls where the verified-pair set is itself corpus-scale — pairs
    feed the distributed ``connected_components`` label propagation
    (pipelines/graph.py), so no step holds O(pairs) state on the driver.
    Both paths produce identical output (forced-distributed equality
    test on a planted-cluster corpus). ``as_dataset=True`` always takes
    the distributed path and returns a Dataset (the 100 TB mode).
    """
    pairs_ds = minhash_verified_pairs(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        num_bands=num_bands, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold, as_dataset=True,
    ).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        if as_dataset:
            import ray.data as rd

            return rd.from_arrow(pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64())}))
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})
    if as_dataset or n_pairs > _DRIVER_CLUSTER_MAX:
        out_ds = _cluster_pairs_distributed(pairs_ds, id_col)
        if as_dataset:
            return out_ds
        return (out_ds.to_pandas()
                .sort_values(id_col, ignore_index=True))
    pairs = pairs_ds.to_pandas()
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
                  max_hamming: int = 3, num_blocks: int = 4,
                  return_stats: bool = False):
    """SimHash near-dup: block-permuted bucket LSH, verify Hamming distance.

    Returns pandas (a, b, hamming) pairs with distance <= max_hamming.
    Pigeonhole guarantee: with ``num_blocks`` blocks, any pair within
    Hamming distance <= num_blocks - 1 shares at least one identical
    block, so recall is EXACT iff ``max_hamming < num_blocks`` (use
    num_blocks=9 for the standard Hamming-8 near-dup setting; the default
    4 x 16-bit blocks cover Hamming <= 3).

    Hot blocks (> ``_MAX_BAND_GROUP`` docs sharing one block value —
    boilerplate at web scale) switch from the quadratic self-merge to a
    LINEAR star expansion around the block's min-id member, so
    duplicate-cluster connectivity is preserved (identical docs have
    hamming 0 to the hub) while pair ENUMERATION within the hot block is
    bounded. ``return_stats=True`` additionally returns
    ``{"hot_groups": n, "comparisons_skipped": m}`` so the recall loss
    on non-hub hot pairs is measurable, not silent (m is the count of
    within-hot-block pairs not enumerated, before cross-block dedup).
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

    _EMPTY = {"a": "int64", "b": "int64", "hamming": "int64",
              "skipped": "int64"}

    def _verified(m: pd.DataFrame,
                  skipped_per_group: list[int]) -> pd.DataFrame:
        if m.empty:
            out = pd.DataFrame(columns=list(_EMPTY)).astype(_EMPTY)
        else:
            ham = hamming64_vec(m["simhash_a"].to_numpy(),
                                m["simhash_b"].to_numpy())
            m = m.assign(hamming=ham)
            m = m[m["hamming"] <= max_hamming]
            out = m[[f"{id_col}_a", f"{id_col}_b", "hamming"]].copy()
            out.columns = ["a", "b", "hamming"]
            out["skipped"] = 0
            out = out.astype(_EMPTY)
        if skipped_per_group:
            # accounting sentinels: ONE row per hot (block_index, block)
            # group carrying that group's un-enumerated comparison count
            # (the substring_dup_stats pattern — recall loss is data, not
            # a log line), so stats["hot_groups"] counts hot GROUPS even
            # when several hash into one shuffle bucket. Doc ids are
            # non-negative, so a=-1 is reserved.
            k = len(skipped_per_group)
            out = pd.concat(
                [out, pd.DataFrame({"a": [-1] * k, "b": [-1] * k,
                                    "hamming": [-1] * k,
                                    "skipped": skipped_per_group})],
                ignore_index=True).astype(_EMPTY)
        return out

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        df = group[["block_index", "block", id_col, "simhash"]].drop_duplicates()
        # hot-group guard (same failure mode as the MinHash bands): B
        # boilerplate docs with identical simhash blocks would otherwise
        # pair-expand to B^2/2 rows in ONE task. Hot blocks run the
        # linear star expansion (hub = min id) instead; the skipped
        # comparison count rides out as sentinel rows.
        sizes = df.groupby(["block_index", "block"])[id_col].transform("size")
        hot = sizes > _MAX_BAND_GROUP
        star = None
        skipped_per_group: list[int] = []
        if hot.any():
            import logging

            dh = df[hot]
            grp_sizes = dh.groupby(["block_index", "block"])[id_col].size()
            skipped_per_group = [int(g * (g - 1) // 2 - (g - 1))
                                 for g in grp_sizes]
            logging.getLogger(__name__).warning(
                "simhash: %d rows in %d blocks over %d members — star "
                "expansion (hub=min id), %d comparisons skipped",
                int(hot.sum()), len(skipped_per_group), _MAX_BAND_GROUP,
                sum(skipped_per_group))
            hub_id = dh.groupby(["block_index", "block"])[id_col].transform("min")
            spokes = dh[dh[id_col] != hub_id]
            hub_rows = (dh[dh[id_col] == hub_id]
                        .drop_duplicates(["block_index", "block"]))
            # left=spokes gets _b, right=hub gets _a: hub is the min id,
            # so the a < b pair invariant holds by construction
            star = spokes.merge(
                hub_rows, on=["block_index", "block"],
                suffixes=("_b", "_a"))
            df = df[~hot]
        m = df.merge(df, on=["block_index", "block"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if star is not None and len(star):
            m = pd.concat(
                [m, star[[f"{id_col}_a", f"{id_col}_b",
                          "simhash_a", "simhash_b"]]],
                ignore_index=True)
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        return _verified(m, skipped_per_group)

    out = (
        ds.map_batches(sims, batch_format="pyarrow", batch_size=1024)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    sentinel = out["a"] < 0
    stats = {"hot_groups": int(sentinel.sum()),
             "comparisons_skipped": int(out.loc[sentinel, "skipped"].sum())}
    out = (out[~sentinel].drop(columns=["skipped"])
           .drop_duplicates(subset=["a", "b"])
           .sort_values(["a", "b"], ignore_index=True))
    if return_stats:
        return out, stats
    return out


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
