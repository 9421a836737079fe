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


@pytest.mark.usefixtures("ray_session")
def test_export_tokenized(tmp_path):
    """BPE-id training shards: ids reproduce a sequential oracle
    (encode -> pack on n_pieces+1 -> md5 seq shuffle -> concat + eos),
    vocab sidecar round-trips, every doc appears exactly once."""
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.export import (
        export_tokenized,
    )
    from temporal_knowledge_graphs_ray.stages.bpe import (
        BpeModel,
        train_bpe,
    )

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    model = train_bpe(docs, num_merges=40)
    out = str(tmp_path / "tok")
    man = export_tokenized(docs, model.merges, out, seq_budget=256,
                           seed=SEED, num_shards=4)
    import glob

    frames = []
    for path in sorted(glob.glob(f"{out}/shard=*/*.parquet")):
        df = pd.read_parquet(path)
        df["shard"] = int(path.split("shard=")[1].split("/")[0])
        frames.append(df)
    got = (pd.concat(frames).sort_values(["shard", "pos"],
                                         ignore_index=True))
    got["ids"] = got["ids"].map(list)
    assert man["sequences"] == len(got)
    assert (got["n_ids"] == got["ids"].map(len)).all()
    assert man["total_tokens"] == int(got["n_ids"].sum())

    vocab = pd.read_parquet(f"{out}/_token_vocab.parquet")
    assert man["vocab_size"] == len(vocab)
    id_of = dict(zip(vocab["piece"], vocab["token_id"]))
    assert id_of["<eos>"] == 0

    # ---- sequential oracle ----
    import hashlib
    import re

    src = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}') ORDER BY doc_id"
    ).df()
    bpe = BpeModel(merges=[tuple(p) for p in model.merges])
    tok = re.compile(r"[a-z0-9]+")
    pieces_of, nlen = {}, {}
    for i, text in zip(src["doc_id"], src["text"]):
        ps = []
        for w in tok.findall((text or "").lower()):
            ps.extend(bpe.encode_word(w))
        pieces_of[i] = ps
        nlen[i] = len(ps) + 1
    # pack: bucket by hash64(doc_id), next-fit in doc_id order
    from temporal_knowledge_graphs_ray.functions.hashing import hash64_vec

    ids_sorted = sorted(pieces_of)
    buckets = {i: int(hash64_vec([i])[0] % np.uint64(64))
               for i in ids_sorted}
    seq_of = {}
    for b in sorted(set(buckets.values())):
        members = [i for i in ids_sorted if buckets[i] == b]
        seq, fill = 0, 0
        for i in members:
            t = nlen[i]
            if fill > 0 and fill + t > 256:
                seq += 1
                fill = t
            else:
                fill += t
            seq_of[i] = f"{b}:{seq}"
    # md5 order + shard
    def rank(key):
        return hashlib.md5(f"{SEED}|{key}".encode()).hexdigest()

    seqs = {}
    for i in ids_sorted:
        seqs.setdefault(seq_of[i], []).append(i)
    want_rows = []
    for key in sorted(seqs, key=lambda k: (rank(k), k)):
        ids = []
        for i in sorted(seqs[key]):
            ids.extend(id_of[p] for p in pieces_of[i])
            ids.append(0)
        want_rows.append((key, ids,
                          int(rank(key)[:4], 16) * 4 >> 16))
    # compare within each shard in rank order
    got_by_shard = {}
    for _, r in got.iterrows():
        got_by_shard.setdefault(int(r["shard"]), []).append(
            (r["seq_key"], list(r["ids"])))
    want_by_shard = {}
    for key, ids, shard in want_rows:
        want_by_shard.setdefault(shard, []).append((key, ids))
    assert set(got_by_shard) == set(want_by_shard)
    for s in want_by_shard:
        assert got_by_shard[s] == want_by_shard[s], f"shard {s}"


@pytest.mark.usefixtures("ray_session")
def test_tokenized_vocab_is_model_derived_not_corpus_derived(tmp_path):
    """Two different corpora exported with the SAME BPE model get
    identical piece->id tables (a trainer consuming both must see
    consistent ids), and every emitted id is within the model
    universe."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.export import (
        export_tokenized,
    )
    from temporal_knowledge_graphs_ray.stages.bpe import train_bpe

    docs = rd.read_parquet(SF, columns=["doc_id", "text"])
    model = train_bpe(docs, num_merges=40)
    # corpus B: different text (slice + mangled) — different observed
    # piece set than corpus A
    import pyarrow as pa

    half = docs.limit(100).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array([("zz " + (x or ""))[:50]
                              for x in t["text"].to_pylist()])}),
        batch_format="pyarrow")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = export_tokenized(docs, model.merges, a, seq_budget=256,
                          num_shards=2)
    mb = export_tokenized(half, model.merges, b, seq_budget=256,
                          num_shards=2)
    va = pd.read_parquet(f"{a}/_token_vocab.parquet")
    vb = pd.read_parquet(f"{b}/_token_vocab.parquet")
    assert va.equals(vb)
    assert ma["vocab_size"] == mb["vocab_size"] == len(va)
    assert ma["oversized_sequences"] >= 0  # manifest carries the flag
