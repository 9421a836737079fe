"""Metadata flattening (M10).

The reference flattens nested metadata dicts to ``meta_<key>`` scalars plus
a ``metadata_json`` string because Neo4j cannot store nested dicts
(/root/reference/src/temporal_kg_rag/models/document.py:41-96,
chunk.py:69-138, entity.py:42-85). Arrow has native structs/maps, so the
engine does not need this internally — the kernels exist for export
compatibility with reference-shaped consumers.
"""

from __future__ import annotations

import json
from typing import Any

META_PREFIX = "meta_"
META_JSON_KEY = "metadata_json"


def flatten_metadata(metadata: dict[str, Any]) -> dict[str, Any]:
    """dict -> meta_* scalars (str/int/float/bool kept; nested values JSON-
    encoded) + a metadata_json round-trip string (document.py:48-73)."""
    out: dict[str, Any] = {}
    for key, value in metadata.items():
        if isinstance(value, (str, int, float, bool)) or value is None:
            out[f"{META_PREFIX}{key}"] = value
        else:
            out[f"{META_PREFIX}{key}"] = json.dumps(value, sort_keys=True)
    out[META_JSON_KEY] = json.dumps(metadata, sort_keys=True)
    return out


def unflatten_metadata(flat: dict[str, Any]) -> dict[str, Any]:
    """Inverse (document.py:75-96): prefer metadata_json when present."""
    if META_JSON_KEY in flat and flat[META_JSON_KEY]:
        return json.loads(flat[META_JSON_KEY])
    out: dict[str, Any] = {}
    for key, value in flat.items():
        if key.startswith(META_PREFIX):
            out[key[len(META_PREFIX):]] = value
    return out
