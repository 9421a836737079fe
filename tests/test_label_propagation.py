"""Label-propagation communities: sequential-oracle equality, planted
community recovery, forced-distributed == local, layout invariance."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _edge_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "subj_id": pa.array([a for a, _ in pairs], pa.string()),
        "obj_id": pa.array([b for _, b in pairs], pa.string()),
    }))


def _oracle_lpa(pairs, rounds):
    """Independent sequential synchronous LPA with min-label tie-break."""
    adj: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        any_change = False
        for n in adj:
            c = Counter(labels[m] for m in adj[n])
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
            any_change |= best != labels[n]
        labels = new
        if not any_change:
            break
    return labels


def _two_cliques():
    left = [f"a{i}" for i in range(6)]
    right = [f"b{i}" for i in range(6)]
    pairs = [(left[i], left[j]) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(right[i], right[j])
              for i in range(6) for j in range(i + 1, 6)]
    pairs.append((left[0], right[0]))  # one bridge
    return pairs


def _messy(seed=3, n_nodes=80, n_edges=300):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    pairs = [(f"n{x:03d}", f"n{y:03d}") for x, y in zip(a, b)]
    pairs += [(y, x) for x, y in pairs[:40]]
    pairs += pairs[:20]
    pairs += [(f"n{i:03d}", f"n{i:03d}") for i in range(4)]
    return pairs


@pytest.mark.usefixtures("ray_session")
def test_planted_communities_recovered():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        label_propagation,
    )

    pairs = _two_cliques()
    out = label_propagation(_edge_ds(pairs), rounds=10).to_pandas()
    lab = dict(zip(out["node"], out["community"]))
    left_labels = {lab[f"a{i}"] for i in range(6)}
    right_labels = {lab[f"b{i}"] for i in range(1, 6)}  # b0 borders a0
    assert len(left_labels) == 1
    assert len(right_labels) == 1
    assert left_labels != right_labels


@pytest.mark.usefixtures("ray_session")
def test_matches_sequential_oracle():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        label_propagation,
    )

    for seed in (3, 9):
        pairs = _messy(seed=seed)
        for rounds in (1, 2, 5):
            out = label_propagation(
                _edge_ds(pairs), rounds=rounds).to_pandas()
            got = dict(zip(out["node"], out["community"]))
            assert got == _oracle_lpa(pairs, rounds), (seed, rounds)


@pytest.mark.usefixtures("ray_session")
def test_forced_distributed_equals_local():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        label_propagation,
    )

    pairs = _messy(seed=7)
    loc = (label_propagation(_edge_ds(pairs), rounds=4)
           .to_pandas().sort_values("node", ignore_index=True))
    dist = (label_propagation(_edge_ds(pairs), rounds=4,
                              local_edge_cutoff=0, num_partitions=8)
            .to_pandas().sort_values("node", ignore_index=True))
    pd.testing.assert_frame_equal(loc, dist)


@pytest.mark.usefixtures("ray_session")
def test_layout_invariance_distributed():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        label_propagation,
    )

    pairs = _messy(seed=5)
    a = (label_propagation(_edge_ds(pairs).repartition(2), rounds=3,
                           local_edge_cutoff=0, num_partitions=4)
         .to_pandas().sort_values("node", ignore_index=True))
    b = (label_propagation(_edge_ds(pairs).repartition(11), rounds=3,
                           local_edge_cutoff=0, num_partitions=16)
         .to_pandas().sort_values("node", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_empty_graph():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        label_propagation,
    )

    ds = label_propagation(_edge_ds([]), rounds=3)
    assert ds.count() == 0
    assert ds.schema().names == ["node", "community"]
