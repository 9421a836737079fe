"""CLI smoke: the new curation subcommands run end-to-end as real
subprocesses (each owns its Ray session — the library contract) and
their Parquet outputs match the library-level results."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

SF = "/root/testdata/sf0.001"


def _run(args: list[str], tmp_path) -> dict:
    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run(
        [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
         *args, "--num-cpus", "4"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, timeout=240)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_sample_subcommand_matches_oracle(tmp_path):
    out_dir = str(tmp_path / "s")
    rep = _run(["sample", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--per-group", "5",
                "--group-col", "lang", "--seed", "3"], tmp_path)
    want = duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT * FROM read_parquet('{SF}/documents.parquet')
          QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5(concat('3|', CAST(doc_id AS VARCHAR))), doc_id
          ) <= 5)
    """).fetchone()[0]
    assert rep["rows"] == want
    got = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()[0]
    assert got == want


def test_dupspans_subcommand(tmp_path):
    out_dir = str(tmp_path / "d")
    rep = _run(["dupspans", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--window-tokens", "20"], tmp_path)
    assert rep["rows"] == 500
    assert 0 < rep["docs_with_dup_spans"] < 500
