"""Tests: metadata flattening (M10) + embedding stage (A3)."""

from __future__ import annotations

import numpy as np

from temporal_knowledge_graphs_ray.functions.metadata import (
    flatten_metadata,
    unflatten_metadata,
)


class TestMetadata:
    def test_scalars_kept(self):
        flat = flatten_metadata({"a": 1, "b": "x", "c": 2.5, "d": True})
        assert flat["meta_a"] == 1
        assert flat["meta_b"] == "x"
        assert flat["meta_d"] is True
        assert "metadata_json" in flat

    def test_nested_json_encoded(self):
        flat = flatten_metadata({"nested": {"k": [1, 2]}})
        assert flat["meta_nested"] == '{"k": [1, 2]}'

    def test_roundtrip(self):
        meta = {"a": 1, "nested": {"k": [1, 2]}, "s": "t"}
        assert unflatten_metadata(flatten_metadata(meta)) == meta

    def test_unflatten_from_scalars_only(self):
        assert unflatten_metadata({"meta_a": 5, "other": 1}) == {"a": 5}


class TestEmbeddingStage:
    def test_embed_documents(self, ray_session):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.embed import embed_documents

        ds = rd.from_items([
            {"doc_id": 0, "text": "hello world of graphs"},
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "hello world of graphs"},
        ])
        rows = {r["doc_id"]: r["embedding"]
                for r in embed_documents(ds).take_all()}
        assert len(rows[0]) == 256
        # deterministic: same text -> same vector
        assert rows[0] == rows[2]
        # empty text -> zero vector
        assert all(v == 0.0 for v in rows[1])
        # non-empty -> unit norm
        assert abs(float(np.linalg.norm(rows[0])) - 1.0) < 1e-5


def test_encode_override_with_different_dim():
    """The documented real-model seam: an _encode override returning a
    width other than cfg.embed_dim must produce correctly-aligned rows
    (offsets derive from the encoder's actual output, not the config)."""
    import numpy as np
    import pyarrow as pa

    from temporal_knowledge_graphs_ray.stages.embed import EmbeddingStage

    class FiveDim(EmbeddingStage):
        def _encode(self, texts):
            # row i = [i, i, i, i, i] so misalignment is detectable
            n = len(texts)
            return np.repeat(np.arange(n, dtype=np.float32)[:, None],
                             5, axis=1)

    stage = FiveDim()
    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["a", "b", "c"])})
    out = stage(batch)["embedding"].to_pylist()
    assert [len(v) for v in out] == [5, 5, 5]
    assert out == [[float(i)] * 5 for i in range(3)]


def test_frame_samples_hop_zero_raises():
    import numpy as np
    import pytest

    from temporal_knowledge_graphs_ray.functions.audiocodec import (
        frame_samples,
    )

    with pytest.raises(ValueError):
        frame_samples(np.zeros(100, np.float32), 16, hop=0)
