"""Entity canonicalization — the wide, skew-prone shuffle.

Reference semantics (entity_deduplication.py, SURVEY.md §2.6): candidate
blocking by embedding similarity, Jaro-Winkler string filter, threshold
cascade, union-find clustering, merge stats (sum counts / min first_seen /
max last_seen). The LLM-validation stage is replaced by the reference's own
documented fallback score ``0.6*emb + 0.4*string >= 0.8``
(entity_deduplication.py:448-456); embeddings are the deterministic hashed
char-n-gram vectors (functions/embed.py).

Distributed design (north_star: "groupby(surface_key).aggregate min-hash/
union-find merge ... salted partitions"):

1. per-batch PARTIAL aggregation inside ``map_batches``: mentions collapse
   to one row per (type, entity_key, linked_name) per batch with partial
   count/min/max — this is the head-entity skew defuser (a hub entity
   contributes <= 1 row per batch to the shuffle instead of millions).
2. global ``groupby(type, block)`` where ``block = entity_key[:prefix]``:
   all surface variants that could possibly merge land in one group
   (spacing/suffix/typo variants share a prefix; acronym <-> full-name
   variants are pre-unified by the broadcast alias dictionary in the
   linking stage, which is what keeps clusters LOCAL to a blocking group —
   the documented partitioning assumption that removes any need for
   cross-partition union-find iteration).
3. per-group pair generation capped at ``dedup_max_candidates_per_entity``
   (reference settings.py:117-120), threshold cascade, local union-find,
   canonical pick, node-stat merge — all in ``map_groups``.

Output (small: one row per distinct (type, entity_key)): the canonical map
+ node stats. Nodes and the rewrite map are projections of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import embed_texts
from ..functions.jaro_winkler import jaro_winkler
from ..functions.unionfind import UnionFind
from .entities import entity_id_for

PARTIAL_SCHEMA = pa.schema([
    ("type", pa.string()),
    ("block", pa.string()),
    ("entity_key", pa.string()),
    ("linked_name", pa.string()),
    ("cnt", pa.int64()),
    ("first_seen", pa.timestamp("us")),
    ("last_seen", pa.timestamp("us")),
])

CANONICAL_SCHEMA = pa.schema([
    ("type", pa.string()),
    ("entity_key", pa.string()),
    ("canonical_key", pa.string()),
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("first_seen", pa.timestamp("us")),
    ("last_seen", pa.timestamp("us")),
    ("mention_count", pa.int64()),
    ("aliases", pa.list_(pa.string())),
])


def make_partial_agg_stage(cfg: EngineConfig = DEFAULT_CONFIG):
    prefix = cfg.blocking_prefix_len

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac

        # Arrow-native (Acero) group_by: ~50x faster than a pandas
        # round-trip for string keys; this map-side combine is the
        # head-entity skew defuser (a hub key contributes one row per
        # batch to the shuffle, not millions)
        g = (
            batch.select(["type", "entity_key", "linked_name",
                          "mention_count", "valid_from"])
            .group_by(["type", "entity_key", "linked_name"])
            .aggregate([("mention_count", "sum"),
                        ("valid_from", "min"), ("valid_from", "max")])
        )
        block = pac.utf8_slice_codeunits(g["entity_key"], 0, prefix)
        return pa.Table.from_arrays(
            [
                g["type"].cast(pa.string()).combine_chunks(),
                block.cast(pa.string()).combine_chunks(),
                g["entity_key"].cast(pa.string()).combine_chunks(),
                g["linked_name"].cast(pa.string()).combine_chunks(),
                g["mention_count_sum"].cast(pa.int64()).combine_chunks(),
                g["valid_from_min"].cast(pa.timestamp("us")).combine_chunks(),
                g["valid_from_max"].cast(pa.timestamp("us")).combine_chunks(),
            ],
            schema=PARTIAL_SCHEMA,
        )

    return partial


def _accept_pair(cos: float, jw: float, cfg: EngineConfig) -> bool:
    """Reference threshold cascade (entity_deduplication.py:329-456):
    auto-accept emb>=0.95 & str>=0.9; auto-reject emb<0.7 & str<0.6;
    else fallback score 0.6*emb + 0.4*str >= 0.8 (the reference's
    LLM-failure fallback, used here in place of the LLM)."""
    if cos >= 0.95 and jw >= 0.9:
        return True
    if cos < 0.7 and jw < 0.6:
        return False
    return 0.6 * cos + 0.4 * jw >= 0.8


def _dense_cluster_into(uf: "UnionFind", keys: list[str],
                        cfg: EngineConfig) -> None:
    """Candidate gen + threshold cascade over one bounded key set, unioning
    accepted pairs into ``uf`` (reference :233-327 semantics). Builds the
    full cosine matrix — callers must keep ``len(keys)`` within
    ``cfg.dedup_max_block_keys``."""
    if len(keys) < 2:
        return
    emb_dim, emb_ngram = cfg.embed_dim, cfg.embed_ngram
    emb_threshold = cfg.dedup_embedding_threshold  # 0.85
    str_threshold = cfg.dedup_string_threshold  # 0.7
    max_cand = cfg.dedup_max_candidates_per_entity  # 10

    # embedding blocking (reference :233-297): cosine matrix over the
    # keys, slacked threshold, top-N candidates per entity, same type
    # only (a block is one type)
    vecs = embed_texts(keys, emb_dim, emb_ngram)
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -1.0)
    slack = emb_threshold * 0.8
    order = np.argsort(-sims, axis=1)[:, :max_cand]
    seen_pairs: set[tuple[int, int]] = set()
    for i in range(len(keys)):
        for j in order[i]:
            j = int(j)
            pair = (min(i, j), max(i, j))
            if pair in seen_pairs:
                continue
            seen_pairs.add(pair)
            cos = float(sims[i, j])
            if cos < slack:
                continue
            # string filter (:299-327): keep if jw >= 0.8*thr or cos>=0.95
            jw = jaro_winkler(keys[pair[0]], keys[pair[1]])
            if jw < str_threshold * 0.8 and cos < 0.95:
                continue
            if _accept_pair(cos, jw, cfg):
                uf.union(keys[pair[0]], keys[pair[1]])


def _cluster_block_keys(keys: list[str], cfg: EngineConfig) -> "UnionFind":
    """Union-find over one blocking group's distinct (sorted) entity keys.

    Blocks within ``cfg.dedup_max_block_keys`` run the exact dense pass.
    Oversized hot blocks (a popular 4-char prefix at web scale) run a
    BOUNDED hierarchical pass instead of an N x N matrix:

    1. chunk the sorted keys into runs of <= max_block and dense-cluster
       each chunk (lexicographic adjacency keeps shared-prefix variants —
       the likeliest merges — in one chunk);
    2. collapse every cluster to its deterministic representative (min
       member) and repeat over the representatives until they either fit
       one dense pass or a round makes no new merges.

    Cross-chunk pairs whose representatives never co-reside in a chunk are
    the dropped comparisons; the drop is logged. Results are deterministic
    (sorted input, sorted chunk boundaries, min-representatives) and peak
    memory is bounded by one max_block^2 matrix per task.
    """
    uf = UnionFind()
    for k in keys:
        uf.find(k)
    max_block = cfg.dedup_max_block_keys
    if len(keys) <= max_block:
        _dense_cluster_into(uf, keys, cfg)
        return uf

    import logging

    logging.getLogger(__name__).warning(
        "hot blocking group: %d distinct keys > dedup_max_block_keys=%d; "
        "running bounded hierarchical clustering (cross-chunk pairs whose "
        "representatives never co-reside in a chunk are not compared)",
        len(keys), max_block)

    def _reps() -> list[str]:
        root_min: dict[str, str] = {}
        for k in keys:
            r = str(uf.find(k))
            if r not in root_min or k < root_min[r]:
                root_min[r] = k
        return sorted(root_min.values())

    level = list(keys)  # caller passes sorted keys
    while True:
        if len(level) <= max_block:
            _dense_cluster_into(uf, level, cfg)
            break
        before = len(level)
        for i in range(0, len(level), max_block):
            _dense_cluster_into(uf, level[i:i + max_block], cfg)
        level = _reps()
        if len(level) >= before:
            # a full round made no merges — further rounds would chunk
            # identically; remaining cross-chunk comparisons are dropped
            n_chunks = (before + max_block - 1) // max_block
            logging.getLogger(__name__).warning(
                "hierarchical clustering converged with %d representatives "
                "in %d chunks; cross-chunk candidate pairs dropped",
                before, n_chunks)
            break
    return uf


def canonicalize_rows(df: pd.DataFrame,
                      cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Canonicalize a frame holding one or more (type, block) groups.

    ONE vectorized two-level aggregation over the whole frame, then a
    cheap python loop over blocking groups (each already reduced to its
    distinct keys/names) — most groups hold a single key and skip the
    clustering machinery entirely.
    """
    if df.empty:
        # properly typed empty frame (an object-dtype frame would emit a
        # mismatched-schema RefBundle for empty buckets)
        return CANONICAL_SCHEMA.empty_table().to_pandas()

    per_name = (
        df.groupby(["type", "block", "entity_key", "linked_name"], sort=True)
        .agg(cnt=("cnt", "sum"), first_seen=("first_seen", "min"),
             last_seen=("last_seen", "max"))
        .reset_index()
    )
    out_rows = []
    for (etype, _block), sub in per_name.groupby(["type", "block"],
                                                 sort=True):
        # per distinct entity_key totals within this blocking group
        key_cnt: dict[str, int] = {}
        key_rows: dict[str, list[int]] = {}
        for ix, (k, c) in enumerate(zip(sub["entity_key"], sub["cnt"])):
            key_cnt[k] = key_cnt.get(k, 0) + int(c)
            key_rows.setdefault(k, []).append(ix)
        keys = sorted(key_cnt)

        if len(keys) == 1:
            clusters = [[keys[0]]]
        else:
            uf = _cluster_block_keys(keys, cfg)
            grouped: dict[str, list[str]] = {}
            for k in keys:
                grouped.setdefault(str(uf.find(k)), []).append(k)
            clusters = list(grouped.values())

        names_arr = sub["linked_name"].to_numpy()
        cnts_arr = sub["cnt"].to_numpy()
        first_arr = sub["first_seen"].to_numpy()
        last_arr = sub["last_seen"].to_numpy()

        for members in clusters:
            # canonical pick: highest total count, tie -> smallest key
            # (order-insensitive replacement for the reference's "first
            # member", entity_deduplication.py:679-681)
            canonical_key = min(members, key=lambda k: (-key_cnt[k], k))
            entity_id = entity_id_for(etype, canonical_key)
            row_ix = [i for m in members for i in key_rows[m]]
            total = int(cnts_arr[row_ix].sum())
            # null-SKIPPING min/max, matching every earlier aggregation
            # level (Arrow group_by / pandas agg skip nulls) — plain
            # numpy min()/max() would let one undated variant poison the
            # whole cluster's first/last_seen to NaT
            fsel = first_arr[row_ix]
            fval = fsel[~np.isnat(fsel)]
            first_seen = fval.min() if len(fval) else np.datetime64("NaT")
            lsel = last_arr[row_ix]
            lval = lsel[~np.isnat(lsel)]
            last_seen = lval.max() if len(lval) else np.datetime64("NaT")
            # canonical display name: most frequent linked_name, tie smallest
            name_cnt: dict[str, int] = {}
            for i in row_ix:
                name_cnt[names_arr[i]] = (name_cnt.get(names_arr[i], 0)
                                          + int(cnts_arr[i]))
            best = max(name_cnt.values())
            name = min(n for n, c in name_cnt.items() if c == best)
            aliases = sorted(name_cnt)
            for member in members:
                out_rows.append({
                    "type": etype,
                    "entity_key": member,
                    "canonical_key": canonical_key,
                    "entity_id": entity_id,
                    "name": name,
                    "first_seen": first_seen,
                    "last_seen": last_seen,
                    "mention_count": total,
                    "aliases": aliases,
                })
    return pd.DataFrame(out_rows)


def make_canonicalize_group_fn(cfg: EngineConfig = DEFAULT_CONFIG):
    """One-(type,block)-group kernel (oracle/unit-test entry point)."""

    def canonicalize_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        if "block" not in g.columns:
            g["block"] = g["entity_key"].str[:cfg.blocking_prefix_len]
        return canonicalize_rows(g, cfg)

    return canonicalize_group


def _type_block_bucket(type_vals, block_vals,
                       num_buckets: int) -> "np.ndarray":
    """THE bucket hash for (type, block) blocking groups — one definition
    so the small-shuffle driver split and the distributed add_bucket stage
    cannot drift (they must bucket identically for path equivalence)."""
    joined = np.asarray(
        [f"{t}|{b}" for t, b in zip(type_vals, block_vals)], dtype=object)
    if joined.size == 0:
        return np.empty(0, dtype="int32")
    return (pd.util.hash_array(joined, categorize=False)
            % num_buckets).astype("int32")


def canonicalize(mentions_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                 num_buckets: int = 64):
    """mentions Dataset -> canonical map Dataset (one row per entity_key).

    The shuffle key is ``bucket = hash(type, block) % num_buckets`` rather
    than (type, block) directly: blocking groups are numerous and tiny, so
    grouping by a bounded bucket count keeps the number of ``map_groups``
    invocations fixed (64 parallel merges) while each invocation loops the
    blocking groups inside vectorized pandas — same semantics (a blocking
    group never spans buckets), far less per-group scheduling overhead.
    """
    partial = make_partial_agg_stage(cfg)

    def recombine(batch: pa.Table) -> pa.Table:
        # SECOND-LEVEL combine: partial rows grow with the input (one per
        # distinct key per input batch) while distinct keys stay bounded,
        # so at web scale the shuffle/gather input is dominated by
        # re-mergeable duplicates — recombining in 256k-row batches
        # bounds it near the distinct-key count (measured 264k -> ~20k
        # rows at 1.28M pages). Same associative aggregates as the
        # per-batch partial.
        g = (
            batch.group_by(["type", "block", "entity_key", "linked_name"])
            .aggregate([("cnt", "sum"), ("first_seen", "min"),
                        ("last_seen", "max")])
        )
        return pa.Table.from_arrays(
            [
                g["type"].cast(pa.string()).combine_chunks(),
                g["block"].cast(pa.string()).combine_chunks(),
                g["entity_key"].cast(pa.string()).combine_chunks(),
                g["linked_name"].cast(pa.string()).combine_chunks(),
                g["cnt_sum"].cast(pa.int64()).combine_chunks(),
                g["first_seen_min"].cast(pa.timestamp("us")).combine_chunks(),
                g["last_seen_max"].cast(pa.timestamp("us")).combine_chunks(),
            ],
            schema=PARTIAL_SCHEMA,
        )

    partial_ds = (
        mentions_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=65536)
        .map_batches(recombine, batch_format="pyarrow", batch_size=262144)
        .materialize()
    )
    # the post-combine table holds one row per distinct (type, block, key)
    # per input batch — tiny relative to mentions. Below the gate, Ray's
    # sort-shuffle barrier (~1.4 s wall even for 4.5k rows) is replaced by
    # a DRIVER-side bucket split: gather the small table, partition it
    # into per-bucket blocks locally, and run the (CPU-heavy) clustering
    # kernel as parallel map_batches tasks — same 64-way parallelism, no
    # all-to-all. Blocking groups never span buckets, so results are
    # identical to the shuffle path.
    if partial_ds.count() <= cfg.small_shuffle_rows:
        import pandas as pd_
        import ray.data as rd

        df = partial_ds.to_pandas()
        if df.empty:
            # typed empty with the promised CANONICAL columns —
            # partial_ds.limit(0) would leak PARTIAL_SCHEMA to consumers
            return rd.from_arrow(CANONICAL_SCHEMA.empty_table())
        h = _type_block_bucket(df["type"].astype(str),
                               df["block"].astype(str), num_buckets)
        frames = [g for _, g in df.groupby(h, sort=True)]
        return rd.from_pandas(frames).map_batches(
            lambda g: canonicalize_rows(g, cfg),
            batch_format="pandas", batch_size=None)

    def add_bucket(t: pa.Table) -> pa.Table:
        # bucket ids are a within-run shuffle key only — a blocking group
        # lands wholly in one bucket either way — but the small/large
        # paths share _type_block_bucket so they bucket identically
        h = _type_block_bucket(t["type"].to_pylist(),
                               t["block"].to_pylist(), num_buckets)
        return t.append_column("bucket", pa.array(h))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return canonicalize_rows(df, cfg)

    return (
        partial_ds
        .map_batches(add_bucket, batch_format="pyarrow")
        # spread the (small) partial table so the bucket groupby produces
        # parallel reduce tasks instead of one task holding all buckets
        .repartition(num_buckets)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
