"""WARC/WET source: spec-conformant round-trips (plain, whole-file
gzip, CommonCrawl's per-record gzip members), warcinfo filtering,
malformed-shard policy, and the documents-shape bridge."""

from __future__ import annotations

import gzip

import pytest

from temporal_knowledge_graphs_ray.sources.wet import (
    parse_wet_bytes,
    write_wet,
)


def _records(n: int = 6) -> list[dict]:
    recs = [{
        "warc_type": "warcinfo",
        "url": "",
        "warc_date": "2020-06-01T00:00:00Z",
        "record_id": "info-0",
        "text": "software: test-writer\r\nformat: WARC File Format 1.0",
    }]
    for i in range(n):
        recs.append({
            "warc_type": "conversion",
            "url": f"https://example.org/page/{i}",
            "warc_date": f"2020-06-0{i % 9 + 1}T12:00:00Z",
            "record_id": f"rec-{i}",
            # multi-byte UTF-8: Content-Length counts bytes, not chars
            "text": f"Seite {i} — café text body\nline two",
        })
    return recs


class TestParseKernel:
    def test_roundtrip_all_framings(self, tmp_path):
        recs = _records()
        for name, kw in (("plain.wet", {}),
                         ("whole.wet.gz", {"compress": True}),
                         ("members.wet.gz", {"per_record_members": True})):
            p = str(tmp_path / name)
            write_wet(p, recs, **kw)
            got = parse_wet_bytes(open(p, "rb").read(), source=name)
            assert len(got) == len(recs)
            for r, g in zip(recs, got):
                assert g["url"] == r["url"]
                assert g["warc_date"] == r["warc_date"]
                assert g["warc_type"] == r["warc_type"]
                assert g["text"] == r["text"]
                assert g["content_length"] == len(r["text"].encode())
                assert g["truncated"] is False

    def test_lf_only_headers(self):
        body = "hello world".encode()
        raw = (b"WARC/1.0\nWARC-Type: conversion\n"
               b"WARC-Target-URI: http://x/\n"
               b"Content-Length: " + str(len(body)).encode() + b"\n\n"
               + body + b"\n\n")
        got = parse_wet_bytes(raw)
        assert len(got) == 1 and got[0]["text"] == "hello world"

    def test_truncated_payload_policy(self, tmp_path):
        recs = _records(3)
        p = str(tmp_path / "t.wet")
        write_wet(p, recs)
        raw = open(p, "rb").read()[:-30]  # cut into the last body
        got = parse_wet_bytes(raw, source="t.wet")
        assert len(got) == len(recs) - 1
        assert all(g["truncated"] for g in got)
        with pytest.raises(ValueError, match="malformed"):
            parse_wet_bytes(raw, strict=True)

    def test_garbage_header_policy(self):
        assert parse_wet_bytes(b"NOT-A-WARC\r\n\r\nstuff") == []
        raw = b"WARC/1.0\r\nContent-Length: banana\r\n\r\n"
        assert parse_wet_bytes(raw) == []
        with pytest.raises(ValueError):
            parse_wet_bytes(raw, strict=True)

    def test_corrupt_gzip_salvages_prefix_members(self, tmp_path):
        """A truncated/corrupt .gz shard must follow the truncation
        policy (salvage whole members, mark truncated; strict raises)
        instead of crash-looping the parse task."""
        recs = _records(3)
        p = str(tmp_path / "m.wet.gz")
        write_wet(p, recs, per_record_members=True)
        raw = open(p, "rb").read()
        cut = raw[:-20]  # cut into the LAST gzip member
        got = parse_wet_bytes(cut, source="m.wet.gz")
        assert len(got) == len(recs) - 1
        assert all(g["truncated"] for g in got)
        assert [g["url"] for g in got] == [r["url"] for r in recs[:-1]]
        with pytest.raises(ValueError, match="malformed"):
            parse_wet_bytes(cut, strict=True)
        # mid-stream corruption (bad deflate bytes, framing intact)
        bad = bytearray(raw)
        bad[len(raw) // 2] ^= 0xFF
        got2 = parse_wet_bytes(bytes(bad), source="m.wet.gz")
        assert all(g["truncated"] for g in got2)
        assert len(got2) < len(recs)


@pytest.mark.usefixtures("ray_session")
class TestRayRead:
    def test_read_wet_multi_shard(self, tmp_path):
        from temporal_knowledge_graphs_ray.sources.wet import read_wet

        recs = _records(6)
        paths = []
        for s in range(3):
            p = str(tmp_path / f"shard-{s}.wet.gz")
            write_wet(p, recs, per_record_members=(s % 2 == 0),
                      compress=True)
            paths.append(p)
        df = read_wet(paths).to_pandas()
        # warcinfo filtered by default; 6 conversion rows per shard
        assert len(df) == 18
        assert set(df["warc_type"]) == {"conversion"}
        assert sorted(set(df["url"])) == sorted(
            r["url"] for r in recs if r["warc_type"] == "conversion")
        # keep_types=None keeps the warcinfo preamble too
        df_all = read_wet(paths, keep_types=None).to_pandas()
        assert len(df_all) == 21

    def test_wet_to_documents_deterministic(self, tmp_path):
        from temporal_knowledge_graphs_ray.sources.wet import (
            read_wet,
            wet_to_documents,
        )

        p = str(tmp_path / "docs.wet")
        write_wet(p, _records(8))
        a = (wet_to_documents(read_wet(p)).to_pandas()
             .sort_values("url", ignore_index=True))
        b = (wet_to_documents(read_wet([p, p]))  # re-read, 2 shards
             .to_pandas().drop_duplicates("doc_id")
             .sort_values("url", ignore_index=True))
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert a["doc_id"].is_unique
        assert set(a.columns) == {"doc_id", "url", "ts", "text"}
        assert (a["ts"] == a["ts"].str.slice(0, 20)).all()

    def test_wet_feeds_curation(self, tmp_path):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.pipelines.curate import (
            curate_corpus,
        )
        from temporal_knowledge_graphs_ray.sources.wet import (
            read_wet,
            wet_to_documents,
        )

        recs = []
        for i in range(20):
            recs.append({
                "warc_type": "conversion",
                "url": f"https://example.org/{i}",
                "warc_date": "2020-06-01T00:00:00Z",
                "record_id": f"r{i}",
                "text": (f"unique page {i} discussing topic t{i} "
                         + " ".join(f"w{i}x{j}" for j in range(10))),
            })
        # an exact duplicate page under a different record id
        recs.append(dict(recs[5], record_id="dup", url="https://dup/"))
        p = str(tmp_path / "c.wet.gz")
        write_wet(p, recs, compress=True)
        out = str(tmp_path / "curated")
        report = curate_corpus(
            wet_to_documents(read_wet(p)), out, min_words=3,
            max_punct_ratio=1.0)
        assert report["input_docs"] == 21
        assert report["after_exact_dedup"] == 20
        assert rd.read_parquet(out).count() == report["curated_docs"]


@pytest.mark.usefixtures("ray_session")
def test_web_to_training_tokens_end_to_end(tmp_path):
    """The COMPLETE story in one pipeline: raw WET shards -> curation
    funnel (paragraph dedup + ExactSubstr removal + filters + exact +
    near-dup) -> BPE train -> packed token-id shards. Every stage is
    the real operator; the final artifact parses and covers every
    surviving doc exactly once."""
    import glob

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import (
        curate_corpus,
    )
    from temporal_knowledge_graphs_ray.pipelines.export import (
        export_tokenized,
    )
    from temporal_knowledge_graphs_ray.sources.wet import (
        read_wet,
        wet_to_documents,
        write_wet,
    )
    from temporal_knowledge_graphs_ray.stages.bpe import train_bpe

    rng = np.random.default_rng(3)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima").split()
    boiler = "subscribe to the newsletter now"
    recs = [{"warc_type": "warcinfo", "url": "",
             "warc_date": "2020-06-01T00:00:00Z", "record_id": "i0",
             "text": "software: writer"}]
    for i in range(40):
        body = " ".join(rng.choice(words, size=30))
        recs.append({
            "warc_type": "conversion",
            "url": f"https://ex.org/p/{i}",
            "warc_date": "2020-06-02T00:00:00Z",
            "record_id": f"r-{i}",
            "text": boiler + "\n" + body})
    # a pure duplicate of page 0's body (near-dup leg fodder)
    recs.append(dict(recs[1], url="https://ex.org/dup",
                     record_id="r-dup"))
    shard = str(tmp_path / "crawl.wet.gz")
    write_wet(shard, recs, per_record_members=True)

    curated_dir = str(tmp_path / "curated")
    report = curate_corpus(
        wet_to_documents(read_wet(shard)), curated_dir,
        min_words=3, max_punct_ratio=1.0,
        paragraph_dedup_sep="\n", substring_removal_window=8)
    assert report["input_docs"] == 41  # warcinfo dropped by the bridge
    assert report["curated_docs"] > 0
    curated = rd.read_parquet(curated_dir)

    model = train_bpe(curated, num_merges=30)
    tok_dir = str(tmp_path / "tokens")
    man = export_tokenized(curated, model.merges, tok_dir,
                           seq_budget=128, num_shards=2)
    assert man["docs"] == report["curated_docs"]
    frames = [pd.read_parquet(p)
              for p in glob.glob(f"{tok_dir}/shard=*/*.parquet")]
    got = pd.concat(frames)
    assert man["sequences"] == len(got)
    assert (got["ids"].map(len) == got["n_ids"]).all()
    assert int(got["n_ids"].sum()) == man["total_tokens"]
    # the boilerplate paragraph was deduped before tokenization: its
    # pieces appear far fewer times than 40x
    vocab = pd.read_parquet(f"{tok_dir}/_token_vocab.parquet")
    assert len(vocab) == man["vocab_size"]
