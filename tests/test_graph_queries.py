"""Tests for the graph query layer: PPR, co-mentions, entity match,
validity filter, context expansion — over a small hand-built graph."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from temporal_knowledge_graphs_ray.pipelines.graph import (
    comention_pairs,
    edges_valid_at,
    entity_match_chunks,
    expand_context,
    ppr,
)


@pytest.fixture(scope="module")
def graph_data(ray_session):
    import pyarrow as pa
    import ray.data as rd

    edges_schema = pa.schema([
        ("subj_id", pa.string()), ("obj_id", pa.string()),
        ("valid_from", pa.timestamp("us")), ("valid_to", pa.timestamp("us")),
    ])
    edges = rd.from_arrow(pa.Table.from_pylist([
        {"subj_id": "a", "obj_id": "b",
         "valid_from": datetime(2020, 1, 1), "valid_to": None},
        {"subj_id": "b", "obj_id": "c",
         "valid_from": datetime(2021, 1, 1), "valid_to": None},
        {"subj_id": "a", "obj_id": "c",
         "valid_from": datetime(2022, 1, 1),
         "valid_to": datetime(2023, 1, 1)},
        {"subj_id": "d", "obj_id": "e",
         "valid_from": datetime(2020, 6, 1), "valid_to": None},
    ], schema=edges_schema))
    mentions = rd.from_items([
        {"chunk_id": "c1", "entity_key": "acme"},
        {"chunk_id": "c1", "entity_key": "berlin"},
        {"chunk_id": "c2", "entity_key": "acme"},
        {"chunk_id": "c2", "entity_key": "berlin"},
        {"chunk_id": "c3", "entity_key": "acme"},
        {"chunk_id": "c3", "entity_key": "openai"},
    ])
    chunks = rd.from_items([
        {"url": "u1", "chunk_id": "c1", "chunk_index": 0},
        {"url": "u1", "chunk_id": "c2", "chunk_index": 1},
        {"url": "u1", "chunk_id": "c3", "chunk_index": 2},
        {"url": "u2", "chunk_id": "c4", "chunk_index": 0},
    ])
    return edges, mentions, chunks


class TestPPR:
    def test_scores_concentrate_near_seed(self, graph_data):
        edges, _, _ = graph_data
        out = ppr(edges, ["a"], max_iters=20)
        scores = dict(zip(out["entity_id"], out["score"]))
        # seed component gets all mass; disconnected d/e get none
        assert scores["a"] > scores["c"] > 0
        assert scores.get("d", 0.0) == 0.0
        assert abs(sum(scores.values()) - 1.0) < 1e-6

    def test_deterministic(self, graph_data):
        edges, _, _ = graph_data
        a = ppr(edges, ["a"])
        b = ppr(edges, ["a"])
        pd.testing.assert_frame_equal(a, b)

    def test_asof_filters_edges(self, graph_data):
        edges, _, _ = graph_data
        out = ppr(edges, ["a"], asof=datetime(2020, 6, 30))
        # only a-b existed then; c unreachable
        scores = dict(zip(out["entity_id"], out["score"]))
        assert "c" not in scores or scores["c"] == 0.0


class TestComentions:
    def test_pairs(self, graph_data):
        _, mentions, _ = graph_data
        out = comention_pairs(mentions, min_count=2)
        assert out.iloc[0][["a", "b"]].tolist() == ["acme", "berlin"]
        assert out.iloc[0]["n_chunks"] == 2


class TestEntityMatch:
    def test_any_match_scoring(self, graph_data):
        _, mentions, _ = graph_data
        out = entity_match_chunks(mentions, ["Acme Inc.", "Berlin"], k=10)
        scores = dict(zip(out["chunk_id"], out["score"]))
        assert scores["c1"] == 1.0 and scores["c2"] == 1.0
        assert scores["c3"] == 0.5

    def test_all_match(self, graph_data):
        _, mentions, _ = graph_data
        out = entity_match_chunks(mentions, ["Acme Inc.", "Berlin"],
                                  match_all=True)
        assert set(out["chunk_id"]) == {"c1", "c2"}


class TestValidity:
    def test_edges_valid_at(self, graph_data):
        edges, _, _ = graph_data
        out = edges_valid_at(edges, datetime(2022, 6, 1)).to_pandas()
        keys = set(zip(out["subj_id"], out["obj_id"]))
        assert ("a", "c") in keys  # within [2022, 2023)
        out2 = edges_valid_at(edges, datetime(2023, 6, 1)).to_pandas()
        keys2 = set(zip(out2["subj_id"], out2["obj_id"]))
        assert ("a", "c") not in keys2  # expired


class TestContextExpansion:
    def test_neighbors_and_shared_entities(self, graph_data):
        _, mentions, chunks = graph_data
        out = expand_context(chunks, mentions, ["c2"], window=1)
        rows = set(zip(out["seed_chunk_id"], out["related_chunk_id"],
                       out["how"]))
        assert ("c2", "c1", "neighbor") in rows
        assert ("c2", "c3", "neighbor") in rows
        assert ("c2", "c1", "shared_entity") in rows
        assert ("c2", "c3", "shared_entity") in rows  # shares "acme"
        assert not any(r[1] == "c4" for r in rows)

    def test_empty_seed(self, graph_data):
        _, mentions, chunks = graph_data
        out = expand_context(chunks, mentions, ["nope"])
        assert out.empty


class TestPPRDistributedPath:
    def test_distributed_matches_local(self, ray_session, graph_data):
        """Forcing the distributed contribution-pass path (cutoff=0) must
        reproduce the local numpy path bit-for-bit at round-8."""
        edges, _, _ = graph_data
        local = ppr(edges, ["a"])
        dist = ppr(edges, ["a"], local_edge_cutoff=0)
        pd.testing.assert_frame_equal(local, dist)

    def test_distributed_matches_local_on_kg(self, ray_session, tmp_path):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
        from temporal_knowledge_graphs_ray.sources.synth import (
            alias_table,
            pages_table,
        )

        res = build_kg(rd.from_arrow(pages_table(list(range(60)))),
                       str(tmp_path / "kg"), alias_table=alias_table())
        edges = rd.read_parquet(res["edges"])
        nodes = rd.read_parquet(res["nodes"]).to_pandas()
        hubs = nodes.sort_values(["mention_count", "entity_id"],
                                 ascending=[False, True]).head(2)
        seeds = hubs["entity_id"].tolist()
        local = ppr(rd.read_parquet(res["edges"]), seeds)
        dist = ppr(edges, seeds, local_edge_cutoff=0)
        pd.testing.assert_frame_equal(local, dist)
