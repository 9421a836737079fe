"""Output identity under Ray task retries: the engine's determinism claim
("retries and re-runs are idempotent", BASELINE.md) exercised for real — a
worker process DIES mid-pipeline (os._exit, the system-failure class Ray
retries transparently, unlike user exceptions) and the rerun block must
reproduce the identical output."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_stage_output_identical_when_worker_crashes(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.sources.synth import pages_table
    from temporal_knowledge_graphs_ray.stages.entities import (
        EntityExtractorStage,
    )
    from temporal_knowledge_graphs_ray.stages.extract_text import (
        make_chunk_stage,
        make_extract_text_stage,
    )

    cfg = DEFAULT_CONFIG
    marker = str(tmp_path / "crashed-once")

    def run(crash: bool) -> pa.Table:
        ds = (rd.from_arrow(pages_table(list(range(40))))
              .map_batches(make_extract_text_stage(cfg),
                           batch_format="pyarrow", batch_size=8)
              .map_batches(make_chunk_stage(cfg),
                           batch_format="pyarrow", batch_size=8))

        stage = EntityExtractorStage(cfg)

        def ner_with_optional_crash(t: pa.Table) -> pa.Table:
            if crash:
                # exactly ONE worker dies hard (filesystem marker is the
                # cross-process mutex; O_EXCL makes a single winner) — Ray
                # must re-execute that task on another worker
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL)
                except FileExistsError:
                    pass
                else:
                    os.close(fd)
                    os._exit(1)
            return stage(t)

        out = ds.map_batches(ner_with_optional_crash,
                             batch_format="pyarrow", batch_size=8)
        tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        order = pa.compute.sort_indices(
            tbl, sort_keys=[("chunk_id", "ascending")])
        return tbl.take(order)

    clean = run(crash=False)
    crashed = run(crash=True)
    assert os.path.exists(marker), "the crash never fired"
    assert clean.equals(crashed)
