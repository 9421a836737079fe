"""Entity-name normalization kernels.

- ``normalize_entity_name`` replicates
  /root/reference/src/temporal_kg_rag/ingestion/entity_extractor.py:344-360
  (collapse whitespace, strip trailing punctuation).
- ``simplify_entity_name`` replicates
  /root/reference/src/temporal_kg_rag/ingestion/relation_extractor.py:357-374
  (strip corporate suffixes and honorific/article prefixes; the reference
  loops over all suffixes/prefixes, so multiple distinct affixes can be
  stripped in one pass — behavior preserved).
- ``surface_key`` is this engine's canonical blocking/identity key:
  simplified, normalized, lower-cased surface form.
"""

from __future__ import annotations

from functools import lru_cache

_SUFFIXES = [" Inc.", " Inc", " Corp.", " Corp", " LLC", " Ltd.", " Ltd",
             " GmbH", " AG", " Co.", " Company", " Corporation"]
_PREFIXES = ["The ", "Dr. ", "Mr. ", "Mrs. ", "Ms. ", "Prof. "]


def normalize_entity_name(name: str) -> str:
    name = " ".join(name.split())
    name = name.rstrip(".,;:!?")
    return name.strip()


@lru_cache(maxsize=65536)
def simplify_entity_name(name: str) -> str:
    # pure function of the name; surface forms repeat heavily (hub
    # entities appear in ~1/3 of pages), so the suffix/prefix scan runs
    # once per distinct form per worker process
    name = name.strip()
    for suffix in _SUFFIXES:
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    for prefix in _PREFIXES:
        if name.startswith(prefix):
            name = name[len(prefix):]
    return name.strip()


@lru_cache(maxsize=65536)
def surface_key(name: str) -> str:
    """Canonical identity key for a surface form.

    Pure function; lru_cached per worker process — surface forms repeat
    heavily (hub entities appear in ~1/3 of pages).
    """
    return simplify_entity_name(normalize_entity_name(name)).lower()
