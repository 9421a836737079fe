"""Path-compressed union-find.

Same algorithm the reference uses to cluster duplicate-entity pairs
(/root/reference/src/temporal_kg_rag/ingestion/entity_deduplication.py:490-530).
Used per blocking group inside ``map_groups`` — the distributed design keeps
equivalence classes local to a blocking key (cross-block merges are resolved
earlier by the broadcast alias dictionary), so no cross-partition union-find
iteration is needed; that partitioning assumption is documented in
stages/canonicalize.py.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[Hashable, Hashable] = {}

    def find(self, x: Hashable) -> Hashable:
        root = self.parent.setdefault(x, x)
        while root != self.parent[root]:
            root = self.parent[root]
        # path compression
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: Hashable, b: Hashable) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins, so cluster ids are stable
            # regardless of pair order
            if str(rb) < str(ra):
                ra, rb = rb, ra
            self.parent[rb] = ra

    def groups(self) -> dict[Hashable, list[Hashable]]:
        out: dict[Hashable, list[Hashable]] = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return {r: sorted(ms, key=str) for r, ms in out.items()}


def cluster_pairs(pairs: Iterable[tuple[Hashable, Hashable]]) -> list[list[Hashable]]:
    """Group accepted duplicate pairs into clusters of size > 1."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return [g for g in uf.groups().values() if len(g) > 1]
