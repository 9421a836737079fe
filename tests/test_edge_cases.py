"""Robustness: degenerate inputs through the full pipeline."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.sources.synth import PAGES_SCHEMA


@pytest.mark.usefixtures("ray_session")
def test_degenerate_pages(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg

    rows = [
        # empty html
        {"url": "https://x.example/empty", "warc_ts": datetime(2020, 1, 1),
         "html": b"", "text": "", "lang": "en"},
        # whitespace-only body
        {"url": "https://x.example/ws", "warc_ts": datetime(2020, 1, 2),
         "html": b"<html><body>   \n\n  </body></html>", "text": "",
         "lang": "en"},
        # invalid utf-8 bytes
        {"url": "https://x.example/bin", "warc_ts": datetime(2020, 1, 3),
         "html": b"<p>caf\xe9 \xff\xfe broken</p>", "text": "", "lang": "en"},
        # unicode + entities
        {"url": "https://x.example/uni", "warc_ts": datetime(2020, 1, 4),
         "html": "<p>Zür&amp;ich — Acme Inc. partnered with OpenAI.</p>".encode(),
         "text": "", "lang": "de"},
        # one real page with facts
        {"url": "https://x.example/ok", "warc_ts": datetime(2020, 1, 5),
         "html": (b"<html><body><p>Alice Johnson founded Acme Inc. in 2015."
                  b"</p></body></html>"), "text": "", "lang": "en"},
    ]
    pages = rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA))
    res = build_kg(pages, str(tmp_path / "out"))
    # the pipeline completes; the real page yields its triple
    assert res["edge_rows"] >= 1
    import pyarrow.dataset as pads

    edges = pads.dataset(res["edges"], partitioning="hive").to_table().to_pylist()
    assert any(e["subj"] == "Alice Johnson" and e["pred"] == "founded"
               for e in edges)


@pytest.mark.usefixtures("ray_session")
def test_empty_pages_dataset(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg

    pages = rd.from_arrow(PAGES_SCHEMA.empty_table())
    res = build_kg(pages, str(tmp_path / "out_empty"))
    assert res["edge_rows"] == 0
    assert res["node_rows"] == 0
