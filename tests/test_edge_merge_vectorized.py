"""merge_edges_vectorized (the hot Arrow kernel in pipelines/kg.py) must be
bit-equal to the dict-keyed oracle kernel merge_duplicate_relations
(functions/relations.py — reference G3 semantics,
relation_extractor.py:430-467) on every field it merges."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from temporal_knowledge_graphs_ray.config import (
    EngineConfig,
    effective_partitions,
)
from temporal_knowledge_graphs_ray.functions.relations import (
    merge_duplicate_relations,
)
from temporal_knowledge_graphs_ray.pipelines.kg import merge_edges_vectorized

BASE_TS = datetime(2020, 1, 1)


def _rows_strategy():
    # a handful of entity ids / preds so groups collide; descriptions with
    # deliberate length ties to exercise the lexicographic tiebreak
    ids = st.sampled_from(["e1", "e2", "e3", "e4"])
    preds = st.sampled_from(["acquired", "founded", "CEO of"])
    descs = st.sampled_from(["aa", "ab", "ba", "longer one", "longest desc!",
                             "zz"])
    chunk = st.sampled_from([f"c{i}" for i in range(8)])
    row = st.fixed_dictionaries({
        "subj_id": ids, "obj_id": ids, "pred": preds,
        "description": descs,
        "confidence": st.sampled_from([0.5, 0.85, 0.9]),
        "ts_off": st.integers(min_value=0, max_value=10),
        "chunks": st.lists(chunk, min_size=1, max_size=3),
    })
    return st.lists(row, min_size=0, max_size=40)


def _to_table(rows) -> pa.Table:
    return pa.Table.from_pydict({
        "subj": pa.array([f"N{r['subj_id']}" for r in rows], pa.string()),
        "subj_id": pa.array([r["subj_id"] for r in rows], pa.string()),
        "pred": pa.array([r["pred"] for r in rows], pa.string()),
        "obj": pa.array([f"N{r['obj_id']}" for r in rows], pa.string()),
        "obj_id": pa.array([r["obj_id"] for r in rows], pa.string()),
        "valid_from": pa.array(
            [BASE_TS + timedelta(days=r["ts_off"]) for r in rows],
            pa.timestamp("us")),
        "description": pa.array([r["description"] for r in rows],
                                pa.large_string()),
        "confidence": pa.array([r["confidence"] for r in rows],
                               pa.float32()),
        "source_chunks": pa.array([r["chunks"] for r in rows],
                                  pa.list_(pa.string())),
    })


def _oracle(rows, cfg):
    dict_rows = [{
        "source": f"N{r['subj_id']}", "subj_id": r["subj_id"],
        "target": f"N{r['obj_id']}", "obj_id": r["obj_id"],
        "relationship": r["pred"],
        "valid_from": BASE_TS + timedelta(days=r["ts_off"]),
        # float32 round-trip so confidence compares exactly
        "confidence": float(pa.scalar(r["confidence"], pa.float32()).as_py()),
        "description": r["description"], "source_chunks": list(r["chunks"]),
    } for r in rows]
    return merge_duplicate_relations(
        dict_rows, key_fields=("subj_id", "obj_id"),
        max_source_chunks=cfg.max_source_chunks)


@settings(max_examples=60, deadline=None)
@given(rows=_rows_strategy())
def test_matches_dict_kernel(rows):
    cfg = EngineConfig(max_source_chunks=4)
    got = merge_edges_vectorized(_to_table(rows), cfg).to_pylist()
    want = _oracle(rows, cfg)
    assert len(got) == len(want)
    # output order must equal the dict kernel's insertion order
    for g, w in zip(got, want):
        assert g["subj"] == w["source"]
        assert g["subj_id"] == w["subj_id"]
        assert g["pred"] == w["relationship"]
        assert g["obj"] == w["target"]
        assert g["obj_id"] == w["obj_id"]
        assert g["valid_from"] == w["valid_from"]
        assert g["description"] == w["description"]
        assert g["confidence"] == pytest.approx(w["confidence"], abs=0)
        assert g["source_chunks"] == w["source_chunks"]


def test_empty_and_buckets():
    cfg = EngineConfig()
    out = merge_edges_vectorized(_to_table([]), cfg)
    assert out.num_rows == 0
    assert "ekey_bucket" in out.column_names
    out2 = merge_edges_vectorized(_to_table([]), cfg, with_bucket=False)
    assert "ekey_bucket" not in out2.column_names

    rows = [{"subj_id": "e1", "obj_id": "e2", "pred": "acquired",
             "description": "d", "confidence": 0.85, "ts_off": 0,
             "chunks": ["c1"]}] * 3
    out3 = merge_edges_vectorized(_to_table(rows), cfg)
    assert out3.num_rows == 1
    row = out3.to_pylist()[0]
    assert 0 <= row["part"] < effective_partitions(cfg)
    assert 0 <= row["ekey_bucket"] < 64

    # bucket/part assignment must be a pure function of the key strings
    out4 = merge_edges_vectorized(_to_table(rows), cfg)
    assert out4.to_pylist()[0]["ekey_bucket"] == row["ekey_bucket"]
    assert out4.to_pylist()[0]["part"] == row["part"]


def test_vec_bucket64_nul_keys_order_and_value_exact():
    """Root cause of the round-3 cross-session nondeterminism: pandas
    hash_array(categorize=True) factorizes object strings through a
    C-string hash table that treats an embedded NUL as a terminator —
    strings sharing the pre-NUL prefix collapse into one category whose
    representative (and hash) depends on ARRAY ORDER. The merge keys are
    NUL-joined (subj_id \\x00 pred \\x00 obj_id), so the same key could
    land in different ekey_buckets in different batches and the global
    merge silently failed to merge (~1400 duplicate triples at sf0.1).
    categorize=False hashes each value directly."""
    import pyarrow as pa

    from temporal_knowledge_graphs_ray.pipelines.kg import _vec_bucket64

    s1 = "AAAA\x00pred one\x00BBBB"
    s2 = "AAAA\x00pred two\x00CCCC"  # same pre-NUL prefix, different key
    b12 = _vec_bucket64(pa.array([s1, s2]), 64)
    b21 = _vec_bucket64(pa.array([s2, s1]), 64)
    # order-invariant per value
    assert b12[0] == b21[1] and b12[1] == b21[0]
    # value-exact: equal to hashing each alone
    assert b12[0] == _vec_bucket64(pa.array([s1]), 64)[0]
    assert b12[1] == _vec_bucket64(pa.array([s2]), 64)[0]


def test_cross_batch_partials_globally_merged(ray_session):
    """Partial-merge outputs of the SAME key from different batches must
    collapse to one row in the final merge regardless of batching."""
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG
    from temporal_knowledge_graphs_ray.pipelines.kg import (
        merge_edges_vectorized,
    )

    def raw(vf, desc, chunk):
        return pa.table({
            "subj": ["Alice"], "subj_id": ["id_a"], "pred": ["joined"],
            "obj": ["OpenAI"], "obj_id": ["id_b"],
            "valid_from": pa.array([vf], pa.timestamp("us")),
            "description": pa.array([desc], pa.large_string()),
            "confidence": pa.array([0.8], pa.float32()),
            "source_chunks": pa.array([[chunk]], pa.list_(pa.string())),
        })

    cfg = DEFAULT_CONFIG
    partials = [merge_edges_vectorized(raw(1000 * i, f"d{i}", f"c{i}"), cfg)
                for i in range(5)]
    buckets = {p["ekey_bucket"][0].as_py() for p in partials}
    assert len(buckets) == 1  # same key -> same bucket in every batch
    merged = merge_edges_vectorized(
        pa.concat_tables(p.drop_columns(["ekey_bucket"]) for p in partials),
        cfg, with_bucket=False)
    assert merged.num_rows == 1
    assert merged["valid_from"][0].as_py().year == 1970  # min vf
    assert sorted(merged["source_chunks"][0].as_py()) == [
        f"c{i}" for i in range(5)]
