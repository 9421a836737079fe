"""build_kg(blocked_domains=...): pages of listed registrable domains
are dropped BEFORE extraction; the output is bit-identical to building
over a pre-filtered pages dataset; default None is a no-op."""

from __future__ import annotations

import pandas as pd
import pytest

BLOCK = ["site8.example", "site23.example"]


def _pages():
    from temporal_knowledge_graphs_ray.sources.synth import (
        pages_from_documents,
    )

    return pages_from_documents("/root/testdata/sf0.001")


def _edges(out: str) -> pd.DataFrame:
    import ray.data as rd

    return (rd.read_parquet(f"{out}/edges")
            .to_pandas()
            .sort_values(["subj_id", "pred", "obj_id"],
                         ignore_index=True))


@pytest.mark.usefixtures("ray_session")
def test_blocklist_equals_prefiltered_build(tmp_path):
    import pyarrow.compute as pc

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import alias_table
    from temporal_knowledge_graphs_ray.stages.urlfilter import (
        filter_domains,
    )

    a_out = str(tmp_path / "a")
    b_out = str(tmp_path / "b")

    res_a = build_kg(_pages(), a_out, alias_table=alias_table(),
                     blocked_domains=BLOCK)
    pre = filter_domains(_pages(), BLOCK, mode="block")
    res_b = build_kg(pre, b_out, alias_table=alias_table())

    assert res_a["edge_rows"] == res_b["edge_rows"]
    pd.testing.assert_frame_equal(_edges(a_out), _edges(b_out))

    # non-vacuous: the blocklist actually dropped pages/edges
    c_out = str(tmp_path / "c")
    res_c = build_kg(_pages(), c_out, alias_table=alias_table())
    n_blocked = _pages().map_batches(
        lambda t: t.filter(pc.match_substring(t["url"], "site8.")),
        batch_format="pyarrow").count()
    assert n_blocked > 0
    assert res_a["edge_rows"] < res_c["edge_rows"]
