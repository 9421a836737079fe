"""Multimodal actor-pool stages: resize, frame sampling, feature embed."""

from __future__ import annotations

import pytest

@pytest.mark.usefixtures("ray_session")
class TestMultimodalKernels:
    def _media(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.pipelines.queries import _read
        from temporal_knowledge_graphs_ray.stages.multimodal import (
            binarize_documents,
        )

        _ = rd
        return binarize_documents(
            _read("/root/testdata/sf0.001", "documents",
                  ["doc_id", "text"]).limit(50))

    def test_resize_preserves_aspect_and_caps_side(self):
        from temporal_knowledge_graphs_ray.stages.multimodal import (
            decode_media,
            resize_media,
        )

        decoded = decode_media(self._media(), fake=True)
        # re-attach payloads for the resize stage input
        media = self._media().to_pandas().set_index("media_id")
        dec = decoded.to_pandas().set_index("media_id")
        import pyarrow as pa
        import ray.data as rd

        joined = pa.Table.from_pydict({
            "media_id": dec.index.to_list(),
            "media_type": dec["media_type"].to_list(),
            "payload": media.loc[dec.index]["payload"].to_list(),
            "width": dec["width"].to_list(),
            "height": dec["height"].to_list(),
        })
        out = resize_media(rd.from_arrow(joined), max_side=100,
                           fake=True).to_pandas()
        assert (out[["width", "height"]].max(axis=1) <= 100).all()
        assert len(out) == len(dec)

    def test_frame_sampling_fans_out(self):
        from temporal_knowledge_graphs_ray.stages.multimodal import (
            sample_frames,
        )

        out = sample_frames(self._media(), num_frames=4,
                            fake=True).to_pandas()
        counts = out.groupby("media_id")["frame_index"].count()
        assert (counts == 4).all()
        assert set(out.columns) == {"media_id", "frame_index", "frame"}

    def test_media_embedding_deterministic_unit_norm(self):
        import numpy as np

        from temporal_knowledge_graphs_ray.stages.multimodal import (
            embed_media,
        )

        a = embed_media(self._media()).to_pandas().sort_values("media_id")
        b = embed_media(self._media()).to_pandas().sort_values("media_id")
        va = np.array(a["embedding"].tolist())
        vb = np.array(b["embedding"].tolist())
        assert np.array_equal(va, vb)
        norms = np.linalg.norm(va, axis=1)
        assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)
