"""Tests for Q2 (PPR chunk scoring), Q3 (BFS), Q6 (full-text), hybrid RRF."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from temporal_knowledge_graphs_ray.pipelines.graph import (
    bfs_related_entities,
    fulltext_search,
    hybrid_search,
    ppr,
    score_chunks_by_ppr,
)
from temporal_knowledge_graphs_ray.stages.entities import entity_id_for


@pytest.fixture(scope="module")
def retrieval_data(ray_session):
    import pyarrow as pa
    import ray.data as rd

    acme = entity_id_for("ORGANIZATION", "acme")
    berlin = entity_id_for("LOCATION", "berlin")
    openai = entity_id_for("ORGANIZATION", "openai")

    edges = rd.from_arrow(pa.Table.from_pylist([
        {"subj_id": acme, "obj_id": berlin,
         "valid_from": datetime(2021, 1, 1), "valid_to": None},
        {"subj_id": acme, "obj_id": openai,
         "valid_from": datetime(2022, 1, 1), "valid_to": None},
    ], schema=pa.schema([
        ("subj_id", pa.string()), ("obj_id", pa.string()),
        ("valid_from", pa.timestamp("us")), ("valid_to", pa.timestamp("us")),
    ])))
    mentions = rd.from_arrow(pa.Table.from_pylist([
        {"chunk_id": "c1", "type": "ORGANIZATION", "entity_key": "acme",
         "confidence": 0.8, "valid_from": datetime(2023, 1, 1)},
        {"chunk_id": "c1", "type": "LOCATION", "entity_key": "berlin",
         "confidence": 0.8, "valid_from": datetime(2023, 1, 1)},
        {"chunk_id": "c2", "type": "ORGANIZATION", "entity_key": "openai",
         "confidence": 0.8, "valid_from": datetime(2019, 1, 1)},
    ], schema=pa.schema([
        ("chunk_id", pa.string()), ("type", pa.string()),
        ("entity_key", pa.string()), ("confidence", pa.float32()),
        ("valid_from", pa.timestamp("us")),
    ])))
    chunks = rd.from_items([
        {"chunk_id": "c1", "text": "Acme Inc. is headquartered in Berlin."},
        {"chunk_id": "c2", "text": "OpenAI partnered with Acme Inc."},
        {"chunk_id": "c3", "text": "Unrelated filler text."},
    ])
    return edges, mentions, chunks, (acme, berlin, openai)


class TestPprChunkScoring:
    def test_scores_and_decay(self, retrieval_data):
        edges, mentions, _, (acme, _, _) = retrieval_data
        scores = ppr(edges, [acme])
        out = score_chunks_by_ppr(mentions, scores, k=5, ref_year=2024)
        s = dict(zip(out["chunk_id"], out["score"]))
        # c1 mentions two scored entities (incl. the seed); c2 one, heavily
        # decayed (5 years old)
        assert s["c1"] > s["c2"] > 0


class TestBfs:
    def test_distances(self, retrieval_data):
        edges, _, _, (acme, berlin, openai) = retrieval_data
        out = bfs_related_entities(edges, [berlin], max_depth=2)
        d = dict(zip(out["entity_id"], out["distance"]))
        assert d[berlin] == 0
        assert d[acme] == 1
        assert d[openai] == 2

    def test_depth_limit(self, retrieval_data):
        edges, _, _, (_, berlin, openai) = retrieval_data
        out = bfs_related_entities(edges, [berlin], max_depth=1)
        assert openai not in set(out["entity_id"])


class TestFulltext:
    def test_term_scoring(self, retrieval_data):
        _, _, chunks, _ = retrieval_data
        out = fulltext_search(chunks, ["acme", "berlin"], k=5)
        s = dict(zip(out["chunk_id"], out["n_terms"]))
        assert s["c1"] == 2 and s["c2"] == 1
        assert "c3" not in s


class TestHybrid:
    def test_fusion_ranks_relevant_first(self, retrieval_data):
        _, mentions, chunks, _ = retrieval_data
        out = hybrid_search(chunks, mentions,
                            "Acme Inc. headquartered Berlin",
                            ["Acme Inc.", "Berlin"], k=3)
        assert out.iloc[0]["chunk_id"] == "c1"
        assert isinstance(out, pd.DataFrame)
