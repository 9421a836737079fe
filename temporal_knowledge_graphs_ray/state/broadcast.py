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
    """canonical map table -> broadcast ARROW resolve-table ref.

    Columns: jk = type + NUL + entity_key (the join key), entity_id, name.
    Shipping Arrow instead of a Python dict means workers read the object
    zero-copy from the plasma store (no per-actor dict rebuild) and resolve
    endpoints with vectorized ``pc.index_in`` + ``pc.take``. The canonical
    map is small relative to the corpus (#distinct entities << #mentions);
    above cfg.canonical_broadcast_limit the edge rewrite switches to the
    distributed bucketed hash join in pipelines/kg.py instead.
    """
    import pyarrow.compute as pc
    import ray

    jk = pc.binary_join_element_wise(
        canonical_table["type"].cast(pa.string()),
        canonical_table["entity_key"].cast(pa.string()),
        "\x00",
    )
    tbl = pa.Table.from_arrays(
        [jk.combine_chunks() if isinstance(jk, pa.ChunkedArray) else jk,
         canonical_table["entity_id"].cast(pa.string()).combine_chunks(),
         canonical_table["name"].cast(pa.string()).combine_chunks()],
        names=["jk", "entity_id", "name"],
    ).combine_chunks()
    return ray.put(tbl)
