"""Training-data export e2e: every doc lands exactly once; sequences
are contiguous, internally doc-ordered and within budget; the stream
order equals the DuckDB md5 sequence-shuffle oracle computed over the
OUTPUT itself; re-running reproduces identical content; the manifest
and vocab sidecar are written."""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"
SEED = 2


def _export(tmp_dir: str, **kw) -> dict:
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.export import (
        export_training_data,
    )

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    return export_training_data(docs, tmp_dir, token_budget=512,
                                seed=SEED, num_shards=8,
                                vocab_size=25, **kw)


def _read_back(out: str) -> pd.DataFrame:
    return duckdb.sql(f"""
        SELECT * FROM read_parquet('{out}/shard=*/*.parquet',
                                   hive_partitioning=true)
        ORDER BY shard, pos
    """).df()


@pytest.mark.usefixtures("ray_session")
def test_export_end_to_end(tmp_path):
    out = str(tmp_path / "exp")
    manifest = _export(out)
    df = _read_back(out)

    # every doc exactly once
    assert sorted(df["doc_id"].tolist()) == sorted(
        duckdb.sql(f"SELECT doc_id FROM read_parquet('{SF}')")
        .df()["doc_id"].tolist())
    assert manifest["docs"] == len(df)
    assert manifest["sequences"] == df["seq_key"].nunique()
    assert 0 < manifest["fill_efficiency"] <= 1

    # sequences within budget (oversized docs sit alone)
    per_seq = df.groupby("seq_key").agg(tok=("n_tokens", "sum"),
                                        n=("doc_id", "count"))
    over = per_seq[per_seq["tok"] > 512]
    assert (over["n"] == 1).all()

    # sequences contiguous in the stream and internally doc-ordered
    runs = df["seq_key"].ne(df["seq_key"].shift()).cumsum()
    assert runs.groupby(df["seq_key"]).nunique().max() == 1
    assert df.groupby("seq_key")["doc_id"].apply(
        lambda s: s.is_monotonic_increasing).all()

    # stream order equals the md5 sequence-shuffle oracle on the OUTPUT
    want = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{out}/shard=*/*.parquet',
                                        hive_partitioning=true)
        ORDER BY md5(concat('{SEED}', '|', seq_key)), seq_key, doc_id
    """).df()["doc_id"].tolist()
    assert df["doc_id"].tolist() == want

    # sidecars
    assert json.load(open(f"{out}/_export_manifest.json")) == manifest
    vocab = pd.read_parquet(f"{out}/_vocab.parquet")
    assert manifest["vocab_terms"] == len(vocab) == 25


@pytest.mark.usefixtures("ray_session")
def test_export_is_deterministic(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = _export(a)
    mb = _export(b)
    assert ma == mb
    pd.testing.assert_frame_equal(_read_back(a), _read_back(b))


@pytest.mark.usefixtures("ray_session")
def test_disk_cache_mode_identical(tmp_path):
    a = str(tmp_path / "mem")
    b = str(tmp_path / "dsk")
    ma = _export(a)
    mb = _export(b, stage_cache="disk")
    assert {k: v for k, v in ma.items()} == mb
    pd.testing.assert_frame_equal(_read_back(a), _read_back(b))


@pytest.mark.usefixtures("ray_session")
def test_distributed_report_equals_pandas_report():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.packing import (
        pack_sequences,
        packing_report,
        packing_report_distributed,
    )
    from temporal_knowledge_graphs_ray.stages.textstats import (
        token_stats_stage,
    )

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    packed = pack_sequences(token_stats_stage(docs), 512).materialize()
    a = packing_report_distributed(packed, 512)
    b = packing_report(packed.to_pandas(), 512)
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_jsonl_format_identical_rows(tmp_path):
    """output_format='jsonl' writes one shard=K/part-0.jsonl per shard
    with EXACTLY the parquet export's rows in the same (shard, pos)
    order."""
    a = str(tmp_path / "pq")
    b = str(tmp_path / "jl")
    ma = _export(a)
    mb = _export(b, output_format="jsonl")
    assert mb["output_format"] == "jsonl"
    assert {k: v for k, v in ma.items() if k != "output_format"} == \
        {k: v for k, v in mb.items() if k != "output_format"}

    want = _read_back(a)
    import glob

    frames = []
    for path in glob.glob(f"{b}/shard=*/part-0.jsonl"):
        df = pd.read_json(path, lines=True)
        df["shard"] = int(path.split("shard=")[1].split("/")[0])
        frames.append(df)
    got = (pd.concat(frames).sort_values(["shard", "pos"],
                                         ignore_index=True))
    for col in ["doc_id", "seq_key", "n_tokens", "pos", "shard"]:
        assert got[col].tolist() == want[col].tolist(), col
    assert got["text"].tolist() == want["text"].tolist()
