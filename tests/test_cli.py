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


def test_paradedup_subcommand_matches_oracle(tmp_path):
    from temporal_knowledge_graphs_ray.stages.paradedup import (
        paragraph_dedup_sql,
    )

    out_dir = str(tmp_path / "p")
    rep = _run(["paradedup", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--sep", " the "], tmp_path)
    assert rep["docs_in"] == 500
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{SF}/documents.parquet')""")
    want = con.execute(
        paragraph_dedup_sql("documents", sep=" the ")).fetch_df()
    got = duckdb.sql(f"""
        SELECT doc_id, text FROM read_parquet('{out_dir}/*.parquet')
        ORDER BY doc_id
    """).df()
    assert got.values.tolist() == want.values.tolist()
    assert rep["docs_out"] == len(want)


def test_bm25_subcommand_build_then_load(tmp_path):
    idx = str(tmp_path / "bm25_idx")
    rep = _run(["bm25", "--documents", f"{SF}/documents.parquet",
                "--index", idx, "--query", "sort merge join",
                "--k", "5", "--num-buckets", "16"], tmp_path)
    assert rep["n_docs"] == 500 and len(rep["topk"]) == 5
    # second run loads the persisted index and must rank identically
    rep2 = _run(["bm25", "--documents", f"{SF}/documents.parquet",
                 "--index", idx, "--query", "sort merge join",
                 "--k", "5"], tmp_path)
    assert rep2["topk"] == rep["topk"]


def test_shuffle_subcommand_matches_md5_order(tmp_path):
    out = str(tmp_path / "shards")
    rep = _run(["shuffle", "--documents", f"{SF}/documents.parquet",
                "--out", out, "--seed", "5", "--num-shards", "8"],
               tmp_path)
    assert rep["rows"] == 500
    got = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{out}/*/*.parquet',
                                        hive_partitioning=true)
        ORDER BY shard, pos
    """).df()["doc_id"].tolist()
    want = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
        ORDER BY md5(concat('5', '|', doc_id)), doc_id
    """).df()["doc_id"].tolist()
    assert got == want


def test_hybrid_subcommand(tmp_path):
    rep = _run(["hybrid", "--documents", f"{SF}/documents.parquet",
                "--query", "sort merge join window", "--k", "5"],
               tmp_path)
    assert len(rep["topk"]) == 5
    assert all(r["rank_bm25"] > 0 or r["rank_dense"] > 0
               for r in rep["topk"])


def test_mix_subcommand(tmp_path):
    out = str(tmp_path / "mixed")
    rep = _run(["mix", "--documents", f"{SF}/documents.parquet",
                "--out", out, "--weights", "src0=2,src1=1",
                "--seed", "1"], tmp_path)
    # src0 (25 rows) is the binding corpus at weight 2 -> keeps all 25;
    # src1 downsamples toward ~12.5 expected
    assert rep["by_corpus"]["src0"] == 25
    assert 4 <= rep["by_corpus"]["src1"] <= 21
    got = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{out}/*/*.parquet',
                                          hive_partitioning=true)
    """).fetchone()[0]
    assert got == rep["rows"]


def test_vocab_subcommand(tmp_path):
    out = str(tmp_path / "vocab.parquet")
    rep = _run(["vocab", "--documents", f"{SF}/documents.parquet",
                "--out", out, "--max-size", "10"], tmp_path)
    assert rep["terms"] == 10
    want = duckdb.sql(f"""
        SELECT term FROM (
          SELECT unnest(regexp_extract_all(lower(text),
                                           '[a-z0-9]+')) AS term
          FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY term ORDER BY count(*) DESC, term LIMIT 5
    """).df()["term"].tolist()
    assert rep["top5"] == want


def test_incdedup_subcommand(tmp_path):
    store = str(tmp_path / "store")
    rep = _run(["incdedup", "--store", store,
                "--init-from", f"{SF}/documents.parquet"], tmp_path)
    assert rep["fingerprints"] > 0
    out = str(tmp_path / "surv")
    # the same corpus replayed as the "new" snapshot: nothing survives
    rep2 = _run(["incdedup", "--store", store,
                 "--documents", f"{SF}/documents.parquet",
                 "--out", out], tmp_path)
    assert rep2["survivors"] == 0


def test_export_subcommand(tmp_path):
    out = str(tmp_path / "exp")
    rep = _run(["export", "--documents", f"{SF}/documents.parquet",
                "--out", out, "--token-budget", "512",
                "--num-shards", "4"], tmp_path)
    assert rep["docs"] == 500 and rep["sequences"] > 0
    got = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{out}/shard=*/*.parquet',
                                          hive_partitioning=true)
    """).fetchone()[0]
    assert got == 500


def test_profile_subcommand_exact_fields_and_skew(tmp_path):
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps({
        "doc_id": {"not_null": True, "unique": True},
        "lang": {"in_set": ["en", "de", "fr", "es", "zh"]}}))
    rep = _run(["profile", "--table", f"{SF}/documents.parquet",
                "--columns", "lang,n_chars",
                "--rules", str(rules),
                "--skew-key", "lang", "--skew-exact"], tmp_path)
    n, d, mn, mx = duckdb.sql(f"""
        SELECT count(*), count(DISTINCT lang), min(n_chars), max(n_chars)
        FROM read_parquet('{SF}/documents.parquet')
    """).fetchone()
    assert rep["profile"]["lang"]["n"] == n
    assert rep["profile"]["lang"]["distinct"] == d
    assert rep["profile"]["n_chars"]["min"] == mn
    assert rep["profile"]["n_chars"]["max"] == mx
    assert rep["expectations"]["doc_id.unique"]["violations"] == 0
    assert rep["expectations"]["lang.in_set"]["violations"] == 0
    assert rep["skew"]["lang"]["exact"] is True
    assert rep["skew"]["lang"]["rows"] == n
    assert rep["skew"]["lang"]["distinct"] == d


def test_weighted_sample_subcommand_matches_oracle(tmp_path):
    from temporal_knowledge_graphs_ray.stages.sampling import (
        weighted_sample_uniform_sql,
    )

    out_dir = str(tmp_path / "ws")
    rep = _run(["sample", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--weight-col", "n_chars",
                "--k", "30", "--seed", "4"], tmp_path)
    assert rep["rows"] == 30
    u = weighted_sample_uniform_sql("CAST(doc_id AS VARCHAR)", 4)
    want = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
        ORDER BY ln({u}) / n_chars DESC, doc_id LIMIT 30
    """).df()["doc_id"].sort_values().tolist()
    got = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{out_dir}/*.parquet') "
        "ORDER BY doc_id").df()["doc_id"].tolist()
    assert got == want


def test_classify_subcommand_train_then_score(tmp_path):
    import pandas as pd

    labels = str(tmp_path / "labels.parquet")
    rows = []
    for i in range(80):
        label = i % 2
        base = ("rigorous measured analysis of study evidence"
                if label else "buy free click winner casino deal")
        rows.append({"doc_id": i,
                     "text": f"{base} u{i}a u{i}b u{i}c",
                     "label": label})
    pd.DataFrame(rows).to_parquet(labels)

    model = str(tmp_path / "clf.npz")
    scored = str(tmp_path / "scored")
    rep = _run(["classify", "--model", model, "--train-labels", labels,
                "--label-col", "label", "--dim", "4096",
                "--epochs", "25", "--lr", "8.0",
                "--documents", labels, "--out", scored], tmp_path)
    assert rep["final_loss"] < 0.3
    assert rep["rows"] == 80
    acc = duckdb.sql(f"""
        SELECT avg(CAST((s.quality_score > 0.5) =
                        (l.label = 1) AS DOUBLE))
        FROM read_parquet('{scored}/*.parquet') s
        JOIN read_parquet('{labels}') l USING (doc_id)
    """).fetchone()[0]
    assert acc == 1.0

    # load-only path: re-score with the saved model, no retrain
    scored2 = str(tmp_path / "scored2")
    rep2 = _run(["classify", "--model", model,
                 "--documents", labels, "--out", scored2], tmp_path)
    assert "final_loss" not in rep2 and rep2["rows"] == 80
    same = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{scored}/*.parquet') a
        JOIN read_parquet('{scored2}/*.parquet') b USING (doc_id)
        WHERE a.quality_score = b.quality_score
    """).fetchone()[0]
    assert same == 80


def test_curate_wet_subcommand(tmp_path):
    from temporal_knowledge_graphs_ray.sources.wet import write_wet

    recs = []
    for i in range(15):
        recs.append({
            "warc_type": "conversion",
            "url": f"https://example.org/{i}",
            "warc_date": "2021-01-01T00:00:00Z",
            "record_id": f"r{i}",
            "text": (f"page {i} about subject s{i} "
                     + " ".join(f"q{i}z{j}" for j in range(8))),
        })
    shard = str(tmp_path / "in.wet.gz")
    write_wet(shard, recs, per_record_members=True)
    out = str(tmp_path / "curated")
    rep = _run(["curate", "--wet", shard, "--out", out,
                "--min-words", "3", "--max-punct-ratio", "1.0"],
               tmp_path)
    assert rep["input_docs"] == 15
    assert rep["curated_docs"] == 15
    got = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM "
        f"read_parquet('{out}/*.parquet')").fetchone()
    assert got == (15, 15)


def test_analytics_subcommand_distributed_scalars(tmp_path):
    # fixture graph: triangle {1,2,3} + disjoint edge {4,5}; the report's
    # scalars (distinct components/communities, mean clustering) must be
    # computed WITHOUT driver-side node-grain materialization and still
    # match the values the old to_pandas()/nunique path produced.
    import pyarrow as pa
    import pyarrow.parquet as pq

    kg = tmp_path / "kg"
    (kg / "edges").mkdir(parents=True)
    pq.write_table(pa.table({
        "subj_id": pa.array([1, 2, 3, 4], pa.int64()),
        "obj_id": pa.array([2, 3, 1, 5], pa.int64()),
    }), str(kg / "edges" / "part0.parquet"))

    rep = _run(["analytics", "--kg", str(kg), "--k", "2",
                "--metrics", "components,clustering,communities,kcore"],
               tmp_path)
    assert rep["components"] == 2
    # triangle nodes have clustering 1.0, the pendant pair 0.0 -> 3/5
    assert rep["avg_clustering"] == 0.6
    # LPA on two disjoint dense-ish pieces settles on >=2 communities
    assert rep["communities"] >= 2
    assert rep["k_core_nodes"] == 3  # k=2: only the triangle survives


def test_dupspans_remove_subcommand(tmp_path):
    out_dir = str(tmp_path / "dr")
    rep = _run(["dupspans", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--window-tokens", "20", "--remove"],
               tmp_path)
    assert 0 < rep["rows"] <= 500
    assert rep["docs_cut"] > 0 and rep["removed_tokens"] > 0
    # the rewritten corpus matches the library sequential oracle
    from temporal_knowledge_graphs_ray.stages.substring_dedup import (
        remove_duplicate_spans_sequential,
    )

    src = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()
    want = remove_duplicate_spans_sequential(
        src.to_dict("records"), window_tokens=20)
    got = duckdb.sql(
        f"SELECT doc_id, text, removed_tokens FROM "
        f"read_parquet('{out_dir}/*.parquet') ORDER BY CAST(doc_id AS BIGINT)"
    ).df()
    want.sort(key=lambda r: int(r["doc_id"]))
    assert list(got["doc_id"]) == [r["doc_id"] for r in want]
    assert list(got["text"]) == [r["text"] for r in want]
    assert list(got["removed_tokens"]) == [r["removed_tokens"]
                                           for r in want]


def test_urldedup_subcommand(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "pages.parquet"
    pq.write_table(pa.table({
        "url": pa.array(["HTTP://A.example:80/x?utm_source=1",
                         "http://a.example/x",
                         "http://a.example/y"], pa.string()),
        "warc_ts": pa.array([1, 2, 1], pa.int64()),
        "text": pa.array(["old", "new", "other"], pa.string())}), src)
    out_dir = str(tmp_path / "u")
    rep = _run(["urldedup", "--pages", str(src), "--out", out_dir],
               tmp_path)
    assert rep["rows_in"] == 3 and rep["rows_out"] == 2
    got = duckdb.sql(
        f"SELECT text FROM read_parquet('{out_dir}/*.parquet') "
        f"ORDER BY canonical_url").df()
    assert list(got["text"]) == ["new", "other"]


def test_export_tokenized_subcommand(tmp_path):
    bpe_out = str(tmp_path / "bpe.json")
    _run(["bpe", "--documents", f"{SF}/documents.parquet",
          "--out", bpe_out, "--num-merges", "30"], tmp_path)
    out_dir = str(tmp_path / "tok")
    rep = _run(["export", "--documents", f"{SF}/documents.parquet",
                "--out", out_dir, "--tokenize-with", bpe_out,
                "--token-budget", "256", "--num-shards", "4"], tmp_path)
    assert rep["docs"] == 500 and rep["sequences"] > 0
    assert rep["eos_id"] == 0 and rep["vocab_size"] > 1
    import glob

    import pandas as pd

    files = glob.glob(f"{out_dir}/shard=*/*.parquet")
    assert files
    df = pd.read_parquet(files[0])
    assert {"seq_key", "n_ids", "ids", "pos"} <= set(df.columns)
    assert (df["ids"].map(len) == df["n_ids"]).all()


def test_ask_subcommand(tmp_path):
    """build -> ask: the serving story end to end as subprocesses. The
    deterministic generate stage must produce a non-empty, verified
    answer for a question about an entity the KG contains."""
    kg = str(tmp_path / "kg")
    _run(["build", "--from-documents", SF, "--out", kg], tmp_path)
    import pyarrow.parquet as pq

    nodes = pq.read_table(f"{kg}/nodes", columns=["name"])
    entity = nodes["name"].to_pylist()[0]
    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run(
        [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
         "ask", "--kg", kg, "--question", f"What is known about {entity}?",
         "--question", "What happened in fiscal 2021?",
         "--num-cpus", "4"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, timeout=240)
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()
            if line.startswith("{")]
    assert len(rows) == 2
    assert rows[0]["query"].startswith("What is known about")
    assert rows[0]["num_results"] > 0
    assert len(rows[0]["answer"]) > 20
    assert {r["query_id"] for r in rows} == {0, 1}
