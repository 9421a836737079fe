"""The canonical-rewrite fallback (distributed bucketed hash join, used
when the canonical map exceeds cfg.canonical_broadcast_limit) must produce
edges bit-identical to the broadcast path."""

from __future__ import annotations

import dataclasses

import pyarrow.dataset as pads
import pytest


def _edges_sorted(path: str):
    t = (pads.dataset(path, format="parquet", partitioning="hive")
         .to_table())
    df = t.select(["subj", "subj_id", "pred", "obj", "obj_id", "valid_from",
                   "description", "confidence"]).to_pandas()
    return df.sort_values(["subj_id", "pred", "obj_id"],
                          ignore_index=True)


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.sources.synth import pages_table

    return rd.from_arrow(pages_table(list(range(160))))


def test_distributed_join_rewrite_matches_broadcast(ray_session, tmp_path,
                                                    pages_ds):
    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import alias_table

    res_b = build_kg(pages_ds, str(tmp_path / "broadcast"),
                     alias_table=alias_table())
    cfg_join = dataclasses.replace(DEFAULT_CONFIG,
                                   canonical_broadcast_limit=0)
    res_j = build_kg(pages_ds, str(tmp_path / "joined"), cfg=cfg_join,
                     alias_table=alias_table())

    eb = _edges_sorted(res_b["edges"])
    ej = _edges_sorted(res_j["edges"])
    assert len(eb) == len(ej) and len(eb) > 0
    import pandas.testing as pdt

    pdt.assert_frame_equal(eb, ej)
    # provenance lists identical too
    tb = (pads.dataset(res_b["edges"], format="parquet",
                       partitioning="hive").to_table()
          .select(["subj_id", "pred", "obj_id", "source_chunks"])
          .to_pandas())
    tj = (pads.dataset(res_j["edges"], format="parquet",
                       partitioning="hive").to_table()
          .select(["subj_id", "pred", "obj_id", "source_chunks"])
          .to_pandas())
    for df in (tb, tj):
        df["source_chunks"] = df["source_chunks"].map(tuple)
    tb = tb.sort_values(["subj_id", "pred", "obj_id"], ignore_index=True)
    tj = tj.sort_values(["subj_id", "pred", "obj_id"], ignore_index=True)
    pdt.assert_frame_equal(tb, tj)
