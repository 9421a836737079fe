"""Dataset-resident (sharded) PageRank/PPR above DRIVER_NODE_CUTOFF:
forcing the cutoffs to 0 must reproduce the broadcast-path output to
1e-9 on a fixture graph — the scale path changes WHERE the node vector
lives (a node-grain Dataset vs driver numpy), never the numbers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from temporal_knowledge_graphs_ray.pipelines.graph import pagerank, ppr


def _edges(pairs):
    return rd.from_arrow(pa.table({
        "subj_id": pa.array([a for a, _ in pairs], pa.string()),
        "obj_id": pa.array([b for _, b in pairs], pa.string()),
    }))


# a graph with every interesting regime: a hub, a cycle, a dangling
# node (no out-edges), a pendant chain and a disconnected pair
FIXTURE = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"),  # chain into dangling f
    ("g", "h"),              # disconnected pair
    ("b", "a"), ("c", "d"),
]


# few iterations: equality is per-update math, not convergence, and the
# dataset-resident path costs several Ray jobs per iteration at test scale
ITERS = 6


@pytest.mark.usefixtures("ray_session")
def test_pagerank_sharded_equals_broadcast():
    base = pagerank(_edges(FIXTURE), max_iters=ITERS)
    sharded = pagerank(_edges(FIXTURE), max_iters=ITERS,
                       local_edge_cutoff=0, driver_node_cutoff=0)
    assert list(base["entity_id"]) == list(sharded["entity_id"])
    np.testing.assert_allclose(base["score"].to_numpy(),
                               sharded["score"].to_numpy(), atol=1e-9)
    # scores still sum to ~1 (dangling mass redistributed)
    assert abs(sharded["score"].sum() - 1.0) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_ppr_sharded_equals_broadcast():
    seeds = ["a", "g"]
    base = ppr(_edges(FIXTURE), seeds, max_iters=ITERS)
    sharded = ppr(_edges(FIXTURE), seeds, max_iters=ITERS,
                  local_edge_cutoff=0, driver_node_cutoff=0)
    assert list(base["entity_id"]) == list(sharded["entity_id"])
    np.testing.assert_allclose(base["score"].to_numpy(),
                               sharded["score"].to_numpy(), atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_ppr_sharded_missing_seeds_fallback():
    # no seed present -> both paths fall back to the smallest node id
    base = ppr(_edges(FIXTURE), ["zz-not-there"], max_iters=ITERS)
    sharded = ppr(_edges(FIXTURE), ["zz-not-there"], max_iters=ITERS,
                  local_edge_cutoff=0, driver_node_cutoff=0)
    assert list(base["entity_id"]) == list(sharded["entity_id"])
    np.testing.assert_allclose(base["score"].to_numpy(),
                               sharded["score"].to_numpy(), atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_as_dataset_return_equals_pandas_everywhere():
    """as_dataset=True returns the same (entity_id, score) rows as a
    Dataset in EVERY size regime — incl. the dataset-resident path,
    whose full result then never lands on the driver."""
    for forced in ({}, {"local_edge_cutoff": 0, "driver_node_cutoff": 0}):
        pg_df = pagerank(_edges(FIXTURE), max_iters=ITERS, **forced)
        pg_ds = pagerank(_edges(FIXTURE), max_iters=ITERS,
                         as_dataset=True, **forced)
        got = pg_ds.to_pandas()
        assert list(got["entity_id"]) == list(pg_df["entity_id"])
        np.testing.assert_allclose(got["score"].to_numpy(),
                                   pg_df["score"].to_numpy(), atol=1e-9)

        pp_df = ppr(_edges(FIXTURE), ["a"], max_iters=ITERS, **forced)
        pp_ds = ppr(_edges(FIXTURE), ["a"], max_iters=ITERS,
                    as_dataset=True, **forced)
        got = pp_ds.to_pandas()
        assert list(got["entity_id"]) == list(pp_df["entity_id"])
        np.testing.assert_allclose(got["score"].to_numpy(),
                                   pp_df["score"].to_numpy(), atol=1e-9)
