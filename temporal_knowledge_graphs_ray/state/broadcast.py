"""Broadcast small lookup tables via the object store.

Pattern (north_star): ``ray.put`` ONCE on the driver; actors fetch the
handle in ``__init__``; the object is shared zero-copy on each node —
never re-shipped per batch, never a shuffle join.
"""

from __future__ import annotations

import pyarrow as pa


def put_alias_dict(alias_table: pa.Table):
    """alias table (alias, canonical, type) -> broadcast dict ref.

    Keyed by (type, alias_lower) — matching the linking stage's lookup.
    """
    import ray

    aliases = {
        (t, a.lower()): c
        for a, c, t in zip(
            alias_table["alias"].to_pylist(),
            alias_table["canonical"].to_pylist(),
            alias_table["type"].to_pylist(),
        )
    }
    return ray.put(aliases)


def put_canonical_map(canonical_table: pa.Table):
    """canonical map table -> broadcast dict ref.

    dict[(type, entity_key)] -> (entity_id, canonical name). The canonical
    map is small relative to the corpus (#distinct entities << #mentions).
    If it ever outgrows worker memory, the edge rewrite falls back to a
    partitioned hash join on (type, entity_key) — documented scale path,
    not needed at current scales.
    """
    import ray

    cmap = {
        (t, k): (eid, n)
        for t, k, eid, n in zip(
            canonical_table["type"].to_pylist(),
            canonical_table["entity_key"].to_pylist(),
            canonical_table["entity_id"].to_pylist(),
            canonical_table["name"].to_pylist(),
        )
    }
    return ray.put(cmap)
