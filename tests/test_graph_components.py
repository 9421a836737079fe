"""Connected components (distributed hash-min) and global PageRank
(directed power iteration): both must agree with independent sequential
oracles, and the distributed paths must match the bounded local paths
exactly on the same input."""

from __future__ import annotations

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


def _random_graph(n_nodes=400, n_edges=700, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    return [(f"n{x:04d}", f"n{y:04d}") for x, y in zip(a[keep], b[keep])]


def _uf_components(pairs):
    from temporal_knowledge_graphs_ray.functions.unionfind import UnionFind

    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    comp_min = {}
    for n in uf.parent:
        r = uf.find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[uf.find(n)] for n in uf.parent}


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_matches_union_find_oracle(self):
        from temporal_knowledge_graphs_ray.pipelines.graph import (
            connected_components,
        )

        pairs = _random_graph()
        got = connected_components(_edge_ds(pairs)).to_pandas()
        want = _uf_components(pairs)
        assert dict(zip(got["entity_id"], got["component"])) == want

    def test_distributed_path_matches_local(self):
        """Force the hash-min iteration (cutoff=0) — must equal both the
        local union-find path and the oracle, including on a long chain
        that needs many propagation rounds."""
        from temporal_knowledge_graphs_ray.pipelines.graph import (
            connected_components,
        )

        # chain wired high-to-low: the min label must travel the whole
        # chain (one hop per round — proves multi-round propagation);
        # plus a disjoint random blob and a self-contained triangle
        chain = [(f"z{i + 1:02d}", f"z{i:02d}") for i in range(12)]
        pairs = _random_graph(60, 90, seed=3) + chain + [
            ("t1", "t2"), ("t2", "t3"), ("t3", "t1")]
        want = _uf_components(pairs)

        local = connected_components(_edge_ds(pairs)).to_pandas()
        dist = connected_components(_edge_ds(pairs),
                                    local_edge_cutoff=0).to_pandas()
        assert dict(zip(local["entity_id"], local["component"])) == want
        assert dict(zip(dist["entity_id"], dist["component"])) == want

    def test_empty(self):
        from temporal_knowledge_graphs_ray.pipelines.graph import (
            connected_components,
        )

        got = connected_components(_edge_ds([]))
        assert got.count() == 0
        assert got.schema().names == ["entity_id", "component"]


def _numpy_pagerank(pairs, damping=0.85, max_iters=30, tol=1e-9):
    nodes = sorted({x for p in pairs for x in p})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    s = np.array([ix[a] for a, _ in pairs])
    o = np.array([ix[b] for _, b in pairs])
    deg = np.bincount(s, minlength=n).astype(float)
    dangling = deg == 0
    score = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        contrib = np.zeros(n)
        np.add.at(contrib, o, score[s] / deg[s])
        new = ((1 - damping) / n
               + damping * (contrib + score[dangling].sum() / n))
        if np.abs(new - score).sum() < tol:
            score = new
            break
        score = new
    return pd.Series(score, index=nodes)


@pytest.mark.usefixtures("ray_session")
class TestPagerank:
    def test_matches_numpy_oracle_and_sums_to_one(self):
        from temporal_knowledge_graphs_ray.pipelines.graph import pagerank

        # star + chain + dangling sink: deterministic structure where the
        # hub must outrank leaves and the dangling node's mass recycles
        pairs = ([("hub", f"leaf{i}") for i in range(10)]
                 + [(f"leaf{i}", "hub") for i in range(5)]
                 + [("a", "b"), ("b", "c"), ("c", "sink")])
        got = pagerank(_edge_ds(pairs))
        want = _numpy_pagerank(pairs)
        got_s = pd.Series(got["score"].values,
                          index=got["entity_id"].values)
        assert abs(got_s.sum() - 1.0) < 1e-6
        for node in want.index:
            assert got_s[node] == pytest.approx(want[node], abs=1e-7)
        # hub beats every leaf
        assert got_s["hub"] > max(got_s[f"leaf{i}"] for i in range(10))

    def test_distributed_path_matches_local(self):
        from temporal_knowledge_graphs_ray.pipelines.graph import pagerank

        pairs = _random_graph(120, 300, seed=11)
        local = pagerank(_edge_ds(pairs))
        dist = pagerank(_edge_ds(pairs), local_edge_cutoff=0)
        lm = dict(zip(local["entity_id"], local["score"]))
        dm = dict(zip(dist["entity_id"], dist["score"]))
        assert lm.keys() == dm.keys()
        for k in lm:
            assert dm[k] == pytest.approx(lm[k], abs=1e-6)
