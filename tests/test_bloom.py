"""Bloom-filter kernel + the Bloom semi-join path in MinHash verification."""

from __future__ import annotations

import numpy as np
import pytest

from temporal_knowledge_graphs_ray.functions.bloom import (
    BloomFilter,
    bloom_from_int64,
)


class TestBloomKernel:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(7)
        keys = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
        bf = bloom_from_int64(keys)
        assert bf.contains_many(keys).all()

    def test_false_positive_rate_sane(self):
        rng = np.random.default_rng(8)
        keys = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
        probes = rng.integers(-(2**62), -1, size=100_000, dtype=np.int64)
        bf = bloom_from_int64(keys)
        fp = bf.contains_many(probes).mean()
        # 10 bits/key, k=7 -> theoretical ~0.8%; allow generous slack
        assert fp < 0.03

    def test_deterministic_across_builds(self):
        keys = np.arange(10_000, dtype=np.int64) * 7919
        a, b = bloom_from_int64(keys), bloom_from_int64(keys)
        assert np.array_equal(a.words, b.words)

    def test_empty_and_validation(self):
        bf = bloom_from_int64(np.array([], dtype=np.int64))
        assert not bf.contains_many(np.array([1, 2, 3], np.int64)).any()
        with pytest.raises(ValueError):
            BloomFilter(10, num_hashes=9)


class TestBloomSemiJoin:
    def test_minhash_output_identical_under_bloom_path(self, ray_session,
                                                       monkeypatch):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages import dedup as D

        base = ("the quick brown fox jumps over the lazy dog while rain "
                "falls gently on the quiet green hills of the northern "
                "valley and the birds sing softly in the morning light")
        rows = [{"doc_id": i, "text": base.replace("dog", w)}
                for i, w in enumerate(
                    ["dog", "dog", "cat", "wolf", "dog", "fox"])]
        rows += [{"doc_id": 100 + i,
                  "text": f"unrelated filler document number {i} about "
                          f"topic {i % 3} with unique trailing words "
                          f"alpha{i} beta{i} gamma{i}"}
                 for i in range(30)]

        def pairs():
            return D.minhash_verified_pairs(
                rd.from_items(rows), jaccard_threshold=0.5)

        exact = pairs()
        monkeypatch.setattr(D, "_BLOOM_SEMIJOIN_MIN", 0)
        bloomed = pairs()
        assert exact.equals(bloomed)
        assert len(exact) > 0
