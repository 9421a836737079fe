"""Unit tests for the canonicalization group kernel (no Ray needed)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from temporal_knowledge_graphs_ray.stages.canonicalize import (
    _accept_pair,
    make_canonicalize_group_fn,
)
from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG


def _group(rows):
    return pd.DataFrame({
        "type": [r[0] for r in rows],
        "entity_key": [r[1] for r in rows],
        "linked_name": [r[2] for r in rows],
        "cnt": [r[3] for r in rows],
        "first_seen": [r[4] for r in rows],
        "last_seen": [r[4] for r in rows],
    })


T0 = datetime(2020, 1, 1)
T1 = datetime(2021, 1, 1)


class TestCanonicalizeGroup:
    def test_typo_variants_cluster(self):
        fn = make_canonicalize_group_fn()
        out = fn(_group([
            ("ORGANIZATION", "globex corp", "Globex Corp.", 10, T0),
            ("ORGANIZATION", "globexx corp", "Globexx Corp.", 1, T1),
        ]))
        # typo merges into the high-count canonical
        assert set(out["canonical_key"]) == {"globex corp"}
        canon = out[out["entity_key"] == out["canonical_key"]].iloc[0]
        assert canon["mention_count"] == 11
        assert canon["name"] == "Globex Corp."
        assert canon["first_seen"] == T0 and canon["last_seen"] == T1
        assert sorted(canon["aliases"]) == ["Globex Corp.", "Globexx Corp."]

    def test_distinct_entities_not_merged(self):
        fn = make_canonicalize_group_fn()
        out = fn(_group([
            ("ORGANIZATION", "acme", "Acme", 5, T0),
            ("ORGANIZATION", "aperture", "Aperture", 5, T0),
        ]))
        assert len(set(out["entity_id"])) == 2

    def test_same_key_partials_summed(self):
        fn = make_canonicalize_group_fn()
        out = fn(_group([
            ("ORGANIZATION", "acme", "Acme Inc.", 5, T0),
            ("ORGANIZATION", "acme", "Acme Inc.", 7, T1),
            ("ORGANIZATION", "acme", "Acme", 2, T1),
        ]))
        assert len(out) == 1
        row = out.iloc[0]
        assert row["mention_count"] == 14
        assert row["name"] == "Acme Inc."  # most frequent display name
        assert row["aliases"] == ["Acme", "Acme Inc."]

    def test_deterministic_under_row_order(self):
        fn = make_canonicalize_group_fn()
        rows = [
            ("ORGANIZATION", "globex corp", "Globex Corp.", 10, T0),
            ("ORGANIZATION", "globexx corp", "Globexx Corp.", 1, T1),
            ("ORGANIZATION", "acme", "Acme", 3, T0),
        ]
        a = fn(_group(rows)).sort_values("entity_key").reset_index(drop=True)
        b = fn(_group(rows[::-1])).sort_values("entity_key").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestHotBlockGuard:
    """Oversized blocking groups run the bounded hierarchical pass
    (config.dedup_max_block_keys) instead of an N x N matrix."""

    def _keys(self, n):
        # one hot block: every key shares the 4-char prefix "john", but the
        # surnames are high-entropy hex so distinct keys are NOT near-dups
        # by the cascade's own thresholds
        import hashlib

        return [
            "john " + hashlib.md5(str(i).encode()).hexdigest()[:10]
            for i in range(n)
        ]

    def test_oversized_block_completes_and_merges_planted_dups(self):
        import dataclasses

        from temporal_knowledge_graphs_ray.stages.canonicalize import (
            _cluster_block_keys,
        )

        cfg = dataclasses.replace(DEFAULT_CONFIG, dedup_max_block_keys=64)
        base = sorted(self._keys(500))
        lo, hi = base[3], base[-3]
        # planted near-duplicates: typo variants adjacent lexicographically
        # (same chunk) at both ends of the sorted range
        keys = sorted(base + [lo + "x", hi + "x"])
        uf = _cluster_block_keys(keys, cfg)
        assert uf.find(lo) == uf.find(lo + "x")
        assert uf.find(hi) == uf.find(hi + "x")
        # distinct high-entropy keys stay separate
        assert uf.find(base[100]) != uf.find(base[200])

    def test_capped_path_matches_dense_when_cap_not_hit(self):
        import dataclasses

        from temporal_knowledge_graphs_ray.stages.canonicalize import (
            _cluster_block_keys,
        )

        base50 = sorted(self._keys(50))
        keys = sorted(base50 + [base50[7] + "x"])
        big = _cluster_block_keys(keys, DEFAULT_CONFIG)  # dense
        small_cfg = dataclasses.replace(DEFAULT_CONFIG,
                                        dedup_max_block_keys=16)
        hier = _cluster_block_keys(keys, small_cfg)  # hierarchical

        def clusters(uf):
            groups = {}
            for k in keys:
                groups.setdefault(str(uf.find(k)), set()).add(k)
            return sorted(frozenset(g) for g in groups.values())

        assert clusters(big) == clusters(hier)

    def test_hierarchical_path_bounds_matrix(self, monkeypatch):
        """No dense pass ever sees more keys than the cap."""
        import dataclasses

        from temporal_knowledge_graphs_ray.stages import canonicalize as cz

        cap = 32
        seen_sizes = []
        orig = cz._dense_cluster_into

        def spy(uf, keys, cfg):
            seen_sizes.append(len(keys))
            return orig(uf, keys, cfg)

        monkeypatch.setattr(cz, "_dense_cluster_into", spy)
        cfg = dataclasses.replace(DEFAULT_CONFIG, dedup_max_block_keys=cap)
        cz._cluster_block_keys(sorted(self._keys(300)), cfg)
        assert seen_sizes and max(seen_sizes) <= cap


class TestAcceptPair:
    def test_cascade(self):
        cfg = DEFAULT_CONFIG
        assert _accept_pair(0.99, 0.95, cfg)       # auto-accept
        assert not _accept_pair(0.5, 0.5, cfg)     # auto-reject
        assert _accept_pair(0.9, 0.7, cfg)         # 0.54+0.28=0.82 >= 0.8
        assert not _accept_pair(0.8, 0.6, cfg)     # 0.48+0.24=0.72 < 0.8


class TestNullTimestamps:
    def test_undated_variant_does_not_poison_cluster_dates(self):
        """One variant with NaT first/last_seen (a page without warc_ts)
        must not propagate NaT into the merged node stats — min/max skip
        nulls at every aggregation level."""
        fn = make_canonicalize_group_fn()
        out = fn(_group([
            ("ORGANIZATION", "globex corp", "Globex Corp.", 10, T0),
            ("ORGANIZATION", "globexx corp", "Globexx Corp.", 1, pd.NaT),
        ]))
        assert set(out["canonical_key"]) == {"globex corp"}
        canon = out[out["entity_key"] == out["canonical_key"]].iloc[0]
        assert canon["first_seen"] == T0 and canon["last_seen"] == T0

    def test_all_undated_cluster_stays_nat(self):
        fn = make_canonicalize_group_fn()
        out = fn(_group([
            ("ORGANIZATION", "acme", "Acme", 5, pd.NaT),
        ]))
        assert pd.isna(out.iloc[0]["first_seen"])
        assert pd.isna(out.iloc[0]["last_seen"])


def test_empty_input_returns_canonical_schema(ray_session):
    """The small-shuffle empty path must return the promised CANONICAL
    columns, not leak PARTIAL_SCHEMA via limit(0)."""
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.canonicalize import (
        CANONICAL_SCHEMA,
        canonicalize,
    )
    from temporal_knowledge_graphs_ray.stages.entities import (  # noqa: F401
        EntityExtractorStage,
    )

    empty_mentions = rd.from_arrow(pa.table({
        "type": pa.array([], pa.string()),
        "entity_key": pa.array([], pa.string()),
        "linked_name": pa.array([], pa.string()),
        "valid_from": pa.array([], pa.timestamp("us")),
    }))
    out = canonicalize(empty_mentions)
    assert out.count() == 0
    assert out.schema().names == CANONICAL_SCHEMA.names
