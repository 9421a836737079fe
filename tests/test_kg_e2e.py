"""End-to-end: Ray pipeline output vs sequential oracle on synthetic pages.

Gates (BASELINE.md / north_rule):
- byte-identical extracted text per url,
- chunk-for-chunk equality,
- triple P/R >= 0.95 (expected 1.0 — same kernels),
- node stats match,
- partition-granular resume.
"""

from __future__ import annotations

import pyarrow.dataset as pads
import pytest

from temporal_knowledge_graphs_ray.oracle.kg_oracle import (
    precision_recall,
    run_oracle,
    triple_set,
)
from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
from temporal_knowledge_graphs_ray.sources.synth import (
    alias_table,
    pages_table,
)

N_PAGES = 120


@pytest.fixture(scope="module")
def oracle_result():
    pages = pages_table(list(range(N_PAGES))).to_pylist()
    aliases = {
        (t, a.lower()): c
        for a, c, t in zip(
            alias_table()["alias"].to_pylist(),
            alias_table()["canonical"].to_pylist(),
            alias_table()["type"].to_pylist(),
        )
    }
    return run_oracle(pages, aliases=aliases)


@pytest.fixture(scope="module")
def ray_result(ray_session, tmp_path_factory):
    import ray.data as rd

    out_dir = str(tmp_path_factory.mktemp("kg_out"))
    pages_ds = rd.from_arrow(pages_table(list(range(N_PAGES))))
    return build_kg(pages_ds, out_dir, alias_table=alias_table())


def _read(path: str) -> list[dict]:
    return pads.dataset(path, format="parquet", partitioning="hive").to_table().to_pylist()


class TestE2E:
    def test_extracted_text_byte_identical(self, ray_result, oracle_result):
        got = {
            r["url"]: r["text"]
            for r in _read(ray_result["chunk_ents"])
            if r["chunk_index"] == 0
        }
        # chunk 0 text == full text here only if 1 chunk per page; compare
        # via chunks instead: reconstruct from oracle texts
        oracle_chunks = {}
        for c in oracle_result["chunks"]:
            oracle_chunks.setdefault(c["url"], {})[c["chunk_index"]] = c["text"]
        for url, text in got.items():
            assert text == oracle_chunks[url][0], url

    def test_chunks_match(self, ray_result, oracle_result):
        got = {
            (r["url"], r["chunk_index"]): (r["text"], r["token_count"])
            for r in _read(ray_result["chunk_ents"])
        }
        want = {
            (c["url"], c["chunk_index"]): (c["text"], c["token_count"])
            for c in oracle_result["chunks"]
        }
        assert got == want

    def test_mentions_match(self, ray_result, oracle_result):
        got = {
            (r["chunk_id"], r["surface"], r["type"], r["position"],
             r["entity_key"])
            for r in _read(ray_result["mentions"])
        }
        want = {
            (m["chunk_id"], m["surface"], m["type"], m["position"],
             m["entity_key"])
            for m in oracle_result["mentions"]
        }
        assert got == want

    def test_triples_pr(self, ray_result, oracle_result):
        ours = {
            (r["subj"], r["pred"].lower(), r["obj"])
            for r in _read(ray_result["edges"])
        }
        oracle = triple_set(oracle_result["edges"])
        p, r = precision_recall(ours, oracle)
        assert p >= 0.95, f"precision {p}: extra {list(ours - oracle)[:5]}"
        assert r >= 0.95, f"recall {r}: missing {list(oracle - ours)[:5]}"

    def test_edges_merge_key_unique(self, ray_result):
        """The global merge must leave exactly one row per
        (subj_id, lower(pred), obj_id) — duplicate keys mean partials
        escaped the final merge (the round-3 hash_array NUL bug)."""
        rows = _read(ray_result["edges"])
        keys = [(r["subj_id"], r["pred"].lower(), r["obj_id"])
                for r in rows]
        assert len(keys) == len(set(keys))

    def test_edges_full_match(self, ray_result, oracle_result):
        got = {
            (r["subj_id"], r["pred"].lower(), r["obj_id"]):
                (r["valid_from"], round(float(r["confidence"]), 4),
                 tuple(r["source_chunks"]), r["description"])
            for r in _read(ray_result["edges"])
        }
        want = {
            (e["subj_id"], e["relationship"].lower(), e["obj_id"]):
                (e["valid_from"], round(float(e["confidence"]), 4),
                 tuple(e["source_chunks"]), e["description"])
            for e in oracle_result["edges"]
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == want[k], k

    def test_nodes_match(self, ray_result, oracle_result):
        got = {
            r["entity_id"]: (r["name"], r["type"], r["mention_count"],
                             tuple(r["aliases"]))
            for r in _read(ray_result["nodes"])
        }
        want = {
            n["entity_id"]: (n["name"], n["type"], n["mention_count"],
                             tuple(n["aliases"]))
            for n in oracle_result["nodes"]
        }
        assert got == want

    def test_alias_linking_unified_acronyms(self, ray_result):
        nodes = _read(ray_result["nodes"])
        names = {n["name"] for n in nodes}
        # acronym surfaces must not survive as separate nodes
        assert "MIT" not in names
        assert "Open AI" not in names  # spacing variant linked to OpenAI
        # acronym mentions flow into the full-name node
        assert any(n["name"] == "Massachusetts Institute of Technology"
                   for n in nodes)

    def test_valid_from_is_warc_ts_or_fact_date(self, ray_result):
        edges = _read(ray_result["edges"])
        assert all(e["valid_from"] is not None for e in edges)
        assert all(e["valid_to"] is None for e in edges)


class TestResume:
    def test_resume_skips_completed_partitions(self, ray_session, tmp_path):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.state.manifests import (
            completed_parts,
            read_manifest,
        )

        out_dir = str(tmp_path / "kg_resume")
        pages = pages_table(list(range(40)))
        r1 = build_kg(rd.from_arrow(pages), out_dir, alias_table=alias_table())
        parts1 = completed_parts(out_dir, "chunk_ents")
        assert parts1
        m = read_manifest(out_dir, "chunk_ents", sorted(parts1)[0])
        assert m["rows"] > 0

        # re-run with resume: all parts complete -> extraction skipped, and
        # the result is unchanged (idempotent re-run; the reference would
        # have duplicated nodes here, operations.py:42-45)
        r2 = build_kg(rd.from_arrow(pages), out_dir,
                      alias_table=alias_table(), resume=True)
        assert r2["edge_rows"] == r1["edge_rows"]
        assert r2["node_rows"] == r1["node_rows"]

        e1 = {
            (r["subj_id"], r["pred"], r["obj_id"])
            for r in _read(r1["edges"])
        }
        e2 = {
            (r["subj_id"], r["pred"], r["obj_id"])
            for r in _read(r2["edges"])
        }
        assert e1 == e2


def test_batch_size_invariance(ray_session, tmp_path):
    """The bench raises stage batch sizes to 256 above 100k pages; output
    must be bit-identical at ANY batch size (the partial merges are
    associative/commutative and keyed on everything that distinguishes
    outputs — this is the guard for that claim)."""
    import dataclasses

    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG

    pages = pages_table(list(range(80)))
    r64 = build_kg(rd.from_arrow(pages), str(tmp_path / "b64"),
                   alias_table=alias_table())
    cfg256 = dataclasses.replace(
        DEFAULT_CONFIG, extract_batch_size=256, chunk_batch_size=256,
        ner_batch_size=256, relation_batch_size=256)
    r256 = build_kg(rd.from_arrow(pages), str(tmp_path / "b256"),
                    alias_table=alias_table(), cfg=cfg256)

    def table(path):
        rows = _read(path)
        key = ("subj_id", "pred", "obj_id") if "edges" in path else None
        return sorted(
            [tuple(sorted(r.items(), key=lambda kv: kv[0])) for r in rows])

    assert table(r64["edges"]) == table(r256["edges"])
    assert table(r64["nodes"]) == table(r256["nodes"])


@pytest.mark.usefixtures("ray_session")
def test_skew_probe_auto_buckets_output_identical(tmp_path):
    """probe_skew=True runs the one-pass sketch probe on entity_key,
    widens the canonicalization bucket count for a planted hub entity,
    and the KG output is bit-identical to the unprobed default
    (VERDICT r4 ask #8 — bucket count shapes task balance only)."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _buckets_from_skew,
    )

    # deterministic rule, unit-pinned
    assert _buckets_from_skew({"distinct": 100, "skew_factor": 1.0}) == 64
    assert _buckets_from_skew({"distinct": 2_000_000,
                               "skew_factor": 1.0}) == 512
    assert _buckets_from_skew({"distinct": 1000,
                               "skew_factor": 500.0}) == 128

    hub = "Hub Corp announced a new partnership with Hub Corp."
    pages = pages_table(list(range(150)), extra_texts=[hub] * 150)
    base = build_kg(rd.from_arrow(pages), str(tmp_path / "plain"),
                    alias_table=alias_table())
    probed = build_kg(rd.from_arrow(pages), str(tmp_path / "probed"),
                      alias_table=alias_table(), probe_skew=True)
    assert base["skew_probe"] is None
    sp = probed["skew_probe"]
    assert sp is not None and sp["chosen_buckets"] != 64
    assert sp["skew_factor"] > 16  # the planted hub drove the widening
    def _rows(path):
        t = (pads.dataset(path, format="parquet", partitioning="hive")
             .to_table())
        rows = []
        for r in t.to_pylist():
            rows.append(tuple(
                tuple(v) if isinstance(v, list) else v
                for _, v in sorted(r.items())))
        return sorted(rows, key=repr)

    for key in ("nodes", "edges"):
        assert _rows(base[key]) == _rows(probed[key]), (
            f"{key} differ between probed/unprobed")
