"""Entity-extraction actor stage + mention explode/link stage.

The reference's EntityExtractor holds an HTTP client and calls an LLM per
chunk (entity_extractor.py:36-66, :156-272). Here the stage is an actor
pool holding the "model" (the deterministic rule-based extractor — or a
real NER model, dropped in by overriding ``_extract``): state pinned once
per actor in ``__init__``, work per Arrow batch in ``__call__``.

Output of ``EntityExtractorStage``: the chunk rows plus an
``entities: list<struct>`` column — mentions stay co-located with their
chunk so the relation stage needs NO shuffle (the reference's
chunk<->entity containment join, pipeline.py:369-390, is free here because
extraction already scopes entities to the chunk).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import ner
from ..functions.hashing import md5_hex
from ..functions.normalize import surface_key

ENTITY_STRUCT = pa.struct([
    ("name", pa.string()),
    ("type", pa.string()),
    ("position", pa.int32()),
    ("mention_count", pa.int32()),
])

CHUNK_ENTS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("part", pa.int32()),
    ("chunk_id", pa.string()),
    ("chunk_index", pa.int32()),
    ("text", pa.large_string()),
    ("token_count", pa.int32()),
    ("valid_from", pa.timestamp("us")),
    ("entities", pa.list_(ENTITY_STRUCT)),
])

MENTIONS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("part", pa.int32()),
    ("chunk_id", pa.string()),
    ("surface", pa.string()),
    ("type", pa.string()),
    ("position", pa.int32()),
    ("mention_count", pa.int32()),
    ("confidence", pa.float32()),
    ("valid_from", pa.timestamp("us")),
    ("linked_name", pa.string()),
    ("entity_key", pa.string()),
])


class EntityExtractorStage:
    """Actor-pool stage: chunks -> chunk_ents (entities nested per chunk)."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        # per-actor setup (the reference builds its httpx client here,
        # entity_extractor.py:56); our deterministic extractor's regexes are
        # compiled at module import — still once per actor process.
        self.cfg = cfg

    def _extract(self, text: str) -> list[dict]:
        return ner.extract_entities(text)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ents_col = [
            [
                {
                    "name": e["name"],
                    "type": e["type"],
                    "position": e["position"],
                    "mention_count": e["mention_count"],
                }
                for e in self._extract(t)
            ]
            for t in texts
        ]
        return pa.Table.from_arrays(
            [
                batch["url"].cast(pa.string()),
                batch["part"].cast(pa.int32()),
                batch["chunk_id"].cast(pa.string()),
                batch["chunk_index"].cast(pa.int32()),
                batch["text"].cast(pa.large_string()),
                batch["token_count"].cast(pa.int32()),
                batch["valid_from"].cast(pa.timestamp("us")),
                pa.array(ents_col, pa.list_(ENTITY_STRUCT)),
            ],
            schema=CHUNK_ENTS_SCHEMA,
        )


class LlmEntityExtractorStage(EntityExtractorStage):
    """EntityExtractorStage wired the way a REAL LLM extractor would be:
    ``client`` is any callable ``text -> raw response string`` (an HTTP
    chat-completion call in production, built once per actor in
    ``__init__`` like the reference's httpx client, entity_extractor.py:56);
    the response goes through the reference's fault-tolerant JSON repair
    (functions/llm_json.py = entity_extractor.py:213-269) and field
    normalization. Proves the pluggable ``_extract`` seam actually fits an
    LLM — exercised with canned responses in tests/test_llm_extractor.py.
    """

    def __init__(self, client, cfg: EngineConfig = DEFAULT_CONFIG,
                 max_attempts: int = 3, backoff_base: float = 0.5,
                 sleep=None):
        super().__init__(cfg)
        self.client = client
        self.max_attempts = max(1, int(max_attempts))
        self.backoff_base = backoff_base
        import time

        self._sleep = sleep if sleep is not None else time.sleep

    def _call_with_retry(self, text: str) -> str | None:
        """Bounded per-call retry with exponential backoff, then give up
        with ``None`` — mirrors the reference's tenacity x3 wrapper
        (embeddings/generator.py:63-71) plus its extractor's
        failure-means-empty policy (entity_extractor.py:151-154). Without
        this, a transient error would kill the Ray task (re-running the
        whole batch) and a poison chunk would retry forever."""
        import logging

        for attempt in range(self.max_attempts):
            try:
                return self.client(text)
            except Exception as e:  # noqa: BLE001 - any client fault
                if attempt + 1 >= self.max_attempts:
                    logging.getLogger(__name__).warning(
                        "LLM extraction failed after %d attempts; chunk "
                        "yields zero entities: %s", self.max_attempts, e)
                    return None
                self._sleep(self.backoff_base * (2 ** attempt))
        return None

    def _extract(self, text: str) -> list[dict]:
        from ..functions.llm_json import parse_llm_entities

        raw = self._call_with_retry(text)
        if raw is None:
            return []  # failed chunk -> no entities, pipeline continues
        out = []
        for e in parse_llm_entities(raw):
            if not isinstance(e, dict) or not e.get("name"):
                continue  # reference drops malformed entries
            name = str(e["name"])
            pos = text.find(name)
            out.append({
                "name": name,
                "type": str(e.get("type", "OTHER")).upper(),
                "position": pos if pos >= 0 else 0,
                "mention_count": max(1, text.count(name)),
            })
        return out


class MentionLinkStage:
    """chunk_ents -> flat mentions, linked against a broadcast alias dict.

    The alias dictionary (alias -> canonical surface, per type) is put in
    the object store ONCE by the driver (``ray.put``) and fetched per actor
    in ``__init__`` — the north_star's broadcast-small-side pattern; never
    re-shipped per batch. ``entity_key`` is the canonical surface key used
    as the canonicalization blocking/identity key.
    """

    def __init__(self, alias_ref=None, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self._alias_ref = alias_ref
        self._aliases: dict | None = None

    @property
    def aliases(self) -> dict:
        # resolved lazily on the worker: in actor mode this runs once per
        # actor; in task mode the instance ships with only the tiny object
        # ref and each worker process fetches the dict from its local
        # object store (never re-shipped per batch)
        if self._aliases is None:
            if self._alias_ref is None:
                self._aliases = {}
            else:
                import ray

                self._aliases = ray.get(self._alias_ref)
        return self._aliases

    def _link(self, name: str, etype: str) -> str:
        return self.aliases.get((etype, name.lower()), name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized mention explode: list_flatten + list_parent_indices
        # broadcast the chunk-grain columns to mention grain zero-copy-ish;
        # the only Python loop left is the alias-dict lookup + surface_key
        # (both per-mention by nature).
        import numpy as np
        import pyarrow.compute as pc

        ents_col = batch["entities"]
        if isinstance(ents_col, pa.ChunkedArray):
            ents_col = ents_col.combine_chunks()
        idx = pc.list_parent_indices(ents_col)
        flat = pc.list_flatten(ents_col)
        n = len(flat)

        def take(col_name: str, typ: pa.DataType) -> pa.Array:
            col = batch[col_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # part may arrive as a string after a hive-partitioned read
            return pc.take(col.cast(typ), idx)

        aliases = self.aliases
        names = flat.field("name").to_pylist()
        types = flat.field("type").to_pylist()
        linked = [aliases.get((t, s.lower()), s)
                  for s, t in zip(names, types)]
        return pa.Table.from_arrays(
            [
                take("url", pa.string()),
                take("part", pa.int32()),
                take("chunk_id", pa.string()),
                flat.field("name").cast(pa.string()),
                flat.field("type").cast(pa.string()),
                flat.field("position").cast(pa.int32()),
                flat.field("mention_count").cast(pa.int32()),
                pa.array(
                    np.full(n, ner.MENTION_CONFIDENCE, dtype=np.float32)),
                take("valid_from", pa.timestamp("us")),
                pa.array(linked, pa.string()),
                pa.array([surface_key(x) for x in linked], pa.string()),
            ],
            schema=MENTIONS_SCHEMA,
        )


def entity_id_for(etype: str, canonical_key: str) -> str:
    """Deterministic entity id (identity = (type, canonical surface key),
    mirroring the reference's MERGE on (name, type), operations.py:334-346).
    """
    return md5_hex(f"{etype}|{canonical_key}")[:16]
