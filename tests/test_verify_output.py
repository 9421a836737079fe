"""verify_output: the engine's schema-verification analog."""

from __future__ import annotations

import json
import os

import pytest


@pytest.mark.usefixtures("ray_session")
def test_verify_detects_problems(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    from temporal_knowledge_graphs_ray.state.manifests import verify_output

    out = str(tmp_path / "kg")
    build_kg(rd.from_arrow(pages_table(list(range(30)))), out,
             alias_table=alias_table())

    res = verify_output(out)
    assert res["ok"], res["problems"]
    assert res["tables"]["edges"]["rows"] > 0

    # remove one completion marker -> flagged
    mdir = os.path.join(out, "_manifests")
    victim = next(f for f in os.listdir(mdir) if f.startswith("edges-part-"))
    os.remove(os.path.join(mdir, victim))
    res2 = verify_output(out)
    assert not res2["ok"]
    assert any("without completion markers" in p for p in res2["problems"])
    json.dumps(res2)  # serializable for the CLI

    # missing table -> flagged
    import shutil

    shutil.rmtree(os.path.join(out, "nodes"))
    res3 = verify_output(out)
    assert any("missing table dir: nodes" in p for p in res3["problems"])
