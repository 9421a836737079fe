"""Engine tunables.

Mirrors the reference's pydantic-settings surface
(/root/reference/src/temporal_kg_rag/config/settings.py:10-158) but only the
knobs that matter for batch construction, plus Ray-execution knobs the
reference has no equivalent for (batch sizes, actor-pool sizes, partition
counts).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- chunking (reference settings.py: chunk_size=1000, chunk_overlap=100) ---
    chunk_size: int = 1000
    chunk_overlap: int = 100
    chunk_strategy: str = "semantic"  # "semantic" | "fixed"

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
    read_batch_size: int = 2048
    extract_batch_size: int = 1024
    chunk_batch_size: int = 512
    ner_batch_size: int = 256
    relation_batch_size: int = 256
    # actor pool sizes: (min, max) autoscaling pools
    ner_concurrency: tuple = (2, 8)
    relation_concurrency: tuple = (2, 8)

    # --- output layout / resume ---
    num_partitions: int = 16  # hash(url) % num_partitions → part column

    # --- canonicalization blocking ---
    blocking_prefix_len: int = 4  # (type, skey[:4]) blocking key
    salt_buckets: int = 8  # salting factor for hub-key partial aggregation

    # --- embedding stand-in (deterministic char-ngram hash embedding) ---
    embed_dim: int = 256
    embed_ngram: int = 3


DEFAULT_CONFIG = EngineConfig()
