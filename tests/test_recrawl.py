"""Re-crawl supersession (V1 at the pipeline head)."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from temporal_knowledge_graphs_ray.sources.synth import PAGES_SCHEMA


@pytest.mark.usefixtures("ray_session")
def test_recrawl_keeps_latest(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg

    url = "https://x.example/recrawled"
    old = {"url": url, "warc_ts": datetime(2020, 1, 1),
           "html": (b"<p>Alice Johnson founded Oldcorp Inc. in 2010.</p>"),
           "text": "", "lang": "en"}
    new = {"url": url, "warc_ts": datetime(2022, 6, 1),
           "html": (b"<p>Alice Johnson founded Newcorp Inc. in 2012.</p>"),
           "text": "", "lang": "en"}
    pages = rd.from_arrow(pa.Table.from_pylist([old, new],
                                               schema=PAGES_SCHEMA))

    res = build_kg(pages, str(tmp_path / "out"), dedup_recrawls=True)
    edges = pads.dataset(res["edges"], partitioning="hive").to_table().to_pylist()
    objs = {e["obj"] for e in edges}
    assert any("Newcorp" in o for o in objs)
    assert not any("Oldcorp" in o for o in objs)

    # without the flag both crawls would contribute (url treated as PK)
    res2 = build_kg(pages, str(tmp_path / "out2"), dedup_recrawls=False)
    edges2 = pads.dataset(res2["edges"], partitioning="hive").to_table().to_pylist()
    objs2 = {e["obj"] for e in edges2}
    assert any("Oldcorp" in o for o in objs2)
