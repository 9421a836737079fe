"""Engine tunables.

Mirrors the reference's pydantic-settings surface
(/root/reference/src/temporal_kg_rag/config/settings.py:10-158) but only the
knobs that matter for batch construction, plus Ray-execution knobs the
reference has no equivalent for (batch sizes, actor-pool sizes, partition
counts).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # --- chunking (reference settings.py: chunk_size=1000, chunk_overlap=100) ---
    chunk_size: int = 1000
    chunk_overlap: int = 100
    chunk_strategy: str = "semantic"  # "semantic" | "fixed"

    # provenance cap: an edge keeps at most this many source chunk ids
    # (smallest-N, deterministic and safe under partial merging). The
    # reference is unbounded (relation_extractor.py:456-458) — unbounded
    # hub-pair edges grow without limit at web scale.
    max_source_chunks: int = 1000

    # --- extraction confidences (entity_extractor.py:137; relation_extractor.py:323) ---
    mention_confidence: float = 0.8
    relation_confidence: float = 0.85

    # --- dedup thresholds (reference settings.py:100-120) ---
    dedup_embedding_threshold: float = 0.85
    dedup_string_threshold: float = 0.7
    dedup_max_candidates_per_entity: int = 10

    # --- Ray execution ---
    # text stages move large strings: big batches. extractor stages are
    # regex-heavy: medium batches. All chosen so batch x concurrency fits a
    # worker heap at 100 TB scale (html dropped right after text extraction).
    # NOTE: when stages fuse, Ray bundles ~max(batch_size) INPUT rows per
    # task — keep these moderate so a fused chain still yields >= cluster
    # CPUs tasks on small inputs (1 -> N fan-out stages amplify rows).
    # SIZE TO THE CORPUS: 64 keeps a 5k-page corpus fully parallel, but at
    # >= 100k pages the resulting ~1 task per 64 pages is pure scheduling
    # tax — 256 measured 25% faster end-to-end at 1.28M pages (86.7 ->
    # 65.1 s at 16 CPUs; knee at 256, 512 regresses). Output is
    # bit-identical at any batch size. bench.py switches to 256 above
    # 100k pages; a 100 TB run should, too.
    read_batch_size: int = 2048
    extract_batch_size: int = 64
    chunk_batch_size: int = 64
    ner_batch_size: int = 64
    relation_batch_size: int = 64
    # actor pool sizes: None -> sized to the cluster at pipeline build time
    # ((2, num_cpus)); a fixed (min, max) tuple pins the pool. A pool that
    # cannot grow with the cluster flattens scaling — see BASELINE.md.
    ner_concurrency: tuple | None = None
    relation_concurrency: tuple | None = None
    # "actors": stages run as actor pools (the right mode when _extract
    # holds a real model — weights load once per actor). "tasks": stateless
    # task pool (faster for the deterministic rule-based extractor: no pool
    # cold-start per phase; broadcast objects still fetched once per worker
    # via the lazy object-ref resolution in the stage classes).
    extractor_compute: str = "tasks"
    # "memory": derived tables are materialized in the object store for the
    # downstream phases (Parquet writes are checkpoint-only); "disk": every
    # phase re-reads the written Parquet (no object-store footprint — the
    # 100 TB setting; resume always uses this path).
    stage_cache: str = "memory"


    # --- output layout / resume ---
    # hash(url) % num_partitions -> part column. None = auto: derived at
    # build time from the input size so each part targets
    # ``target_part_bytes`` of input (at 100 TB a fixed 16 parts would
    # make every resume/compaction unit multi-TB). The resolved count is
    # persisted in _manifests/_layout.json and REUSED by resume /
    # increment / supersede runs — the layout must never drift from the
    # parts already on disk.
    num_partitions: int | None = None
    target_part_bytes: int = 2 << 30  # ~2 GB of input per partition
    min_partitions: int = 16
    max_partitions: int = 65536

    # canonical-map broadcast ceiling: above this many entities the edge
    # rewrite switches from a ray.put broadcast (read zero-copy per worker)
    # to a distributed bucketed hash join on (type, entity_key) — at
    # 10^12-doc scale the entity table itself is 10^8-10^9 rows and no
    # longer broadcastable
    canonical_broadcast_limit: int = 5_000_000

    # global-phase shuffle gate: below this many POST-COMBINE rows the
    # canonicalize / edge-merge reducers run as driver-split parallel
    # bucket tasks instead of an all-to-all shuffle — Ray's sort-shuffle
    # barrier costs ~1 s even for a 5k-row table, pure overhead at small
    # scale. The gate is deliberately TIGHT: the driver split serializes
    # a gather + groupby, which at a few hundred thousand rows (measured
    # at 1.28M pages) costs more than the shuffle it avoids.
    small_shuffle_rows: int = 50_000

    # --- canonicalization blocking ---
    blocking_prefix_len: int = 4  # (type, skey[:4]) blocking key
    # hot-block guard: a (type, prefix) blocking group with more distinct
    # keys than this never builds the full N x N similarity matrix (at web
    # scale a hot 4-char prefix can hold 10^5+ keys -> a 10^10-cell matrix
    # in one task). Oversized blocks run the bounded hierarchical pass in
    # canonicalize.py:_cluster_block_keys: sorted chunks of <= this size
    # dense-clustered, then cluster-representative rounds until
    # convergence. 4096 keys -> ~260 MB peak for the sims + argsort
    # temporaries, well inside a worker heap.
    dedup_max_block_keys: int = 4096

    # --- embedding stand-in (deterministic char-ngram hash embedding) ---
    embed_dim: int = 256
    embed_ngram: int = 3


def effective_partitions(cfg: EngineConfig) -> int:
    """Concrete partition count for kernels used standalone (build_kg
    resolves ``num_partitions`` itself — see _resolve_partitions — so
    inside the pipeline this is just the resolved value)."""
    return (cfg.num_partitions if cfg.num_partitions is not None
            else cfg.min_partitions)


DEFAULT_CONFIG = EngineConfig()
