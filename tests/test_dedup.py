"""Dedup stages on planted duplicates (positive-path verification)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls gently on the quiet green hills of the northern valley "
            "and the birds sing softly in the morning light")
    other = ("completely different subject matter about financial markets "
             "and quarterly earnings reports from technology companies "
             "listed on major stock exchanges around the world today")
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact duplicate
        {"doc_id": 2, "text": base.replace("dog", "cat")},  # near duplicate
        {"doc_id": 3, "text": other},
        {"doc_id": 4, "text": other.replace("today", "tonight")},  # near dup
        {"doc_id": 5, "text": "tiny"},
    ]
    return rd.from_items(rows)


class TestExactDedup:
    def test_exact_duplicates_collapse(self, docs_with_dups):
        from temporal_knowledge_graphs_ray.stages.dedup import exact_dedup

        out = exact_dedup(docs_with_dups).to_pandas()
        # 6 docs, one exact pair -> 5 fingerprints; keeper is the min id
        assert len(out) == 5
        fp_counts = out.set_index("fingerprint")["keep_id"]
        assert 0 in set(fp_counts.values)
        assert 1 not in set(fp_counts.values)


class TestMinhashLsh:
    def test_near_duplicates_clustered(self, docs_with_dups):
        from temporal_knowledge_graphs_ray.stages.dedup import (
            minhash_lsh_dedup,
        )

        out = minhash_lsh_dedup(docs_with_dups, jaccard_threshold=0.5)
        clusters = out.groupby("cluster_id")["doc_id"].apply(set).to_dict()
        assert {0, 1, 2} in clusters.values()
        assert {3, 4} in clusters.values()

    def test_high_threshold_only_exact(self, docs_with_dups):
        from temporal_knowledge_graphs_ray.stages.dedup import (
            minhash_lsh_dedup,
        )

        out = minhash_lsh_dedup(docs_with_dups, jaccard_threshold=0.999)
        clusters = out.groupby("cluster_id")["doc_id"].apply(set).to_dict()
        assert {0, 1} in clusters.values()
        assert not any({3, 4} <= c for c in clusters.values())


class TestSimhash:
    def test_near_duplicates_paired(self, docs_with_dups):
        from temporal_knowledge_graphs_ray.stages.dedup import simhash_dedup

        out = simhash_dedup(docs_with_dups, max_hamming=10)
        pairs = set(zip(out["a"], out["b"]))
        assert (0, 1) in pairs  # identical -> hamming 0
        assert (0, 2) in pairs or (1, 2) in pairs  # near dup


class TestNgramJaccard:
    def test_exact_pair_is_one(self, docs_with_dups):
        from temporal_knowledge_graphs_ray.stages.dedup import (
            ngram_jaccard_pairs,
        )

        out = ngram_jaccard_pairs(docs_with_dups, max_id=10)
        j = {(a, b): v for a, b, v in zip(out["a"], out["b"], out["jaccard"])}
        assert j[(0, 1)] == 1.0
        assert 0.5 < j[(0, 2)] < 1.0


def test_simhash_two_blocks_no_overflow(ray_session):
    """num_blocks=2 gives 32-bit block values — they must be carried as
    int64 (int32 storage overflowed) and still find Hamming<=1 pairs."""
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.dedup import simhash_dedup

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again",
            "completely different content about financial markets today",
        ],
    })
    out = simhash_dedup(rd.from_arrow(docs), max_hamming=1, num_blocks=2)
    assert [(r.a, r.b) for r in out.itertuples()] == [(0, 1)]
