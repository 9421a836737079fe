"""Graph analytics (degree distribution, triangle count, k-core): the
distributed bucketed plans must equal a DuckDB SQL oracle (degrees,
triangles) / an independent sequential peel (k-core), and the forced
distributed paths must match the bounded local paths exactly."""

from __future__ import annotations

import duckdb
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


def _messy_graph(n_nodes=120, n_edges=500, seed=11):
    """Random graph WITH self-loops, duplicates and reciprocal edges —
    the normalization (simple undirected graph) is part of the test."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    pairs = [(f"n{x:03d}", f"n{y:03d}") for x, y in zip(a, b)]
    pairs += [(y, x) for x, y in pairs[:50]]          # reciprocals
    pairs += pairs[:30]                                # duplicates
    pairs += [(f"n{i:03d}", f"n{i:03d}") for i in range(5)]  # self-loops
    # a planted 5-clique and 4-clique guarantee triangles and a 4-core
    clique = [f"c{i}" for i in range(5)]
    pairs += [(clique[i], clique[j])
              for i in range(5) for j in range(i + 1, 5)]
    quad = [f"q{i}" for i in range(4)]
    pairs += [(quad[i], quad[j]) for i in range(4) for j in range(i + 1, 4)]
    return pairs


def _register(con, pairs):
    df = pd.DataFrame(pairs, columns=["subj_id", "obj_id"])
    con.register("edges", df)
    return df


_UND = """
  WITH und AS (
    SELECT DISTINCT least(subj_id, obj_id) AS u,
                    greatest(subj_id, obj_id) AS v
    FROM edges WHERE subj_id <> obj_id)
"""


@pytest.mark.usefixtures("ray_session")
def test_degree_distribution_matches_duckdb():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        degree_distribution,
    )

    pairs = _messy_graph()
    got = degree_distribution(_edge_ds(pairs)).to_pandas()

    con = duckdb.connect()
    _register(con, pairs)
    want = con.execute(_UND + """
        , nodes AS (SELECT u AS node FROM und
                    UNION ALL SELECT v FROM und)
        , deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY node)
        SELECT degree, count(*) AS n_nodes FROM deg
        GROUP BY degree ORDER BY degree
    """).df()
    assert list(got["degree"]) == list(want["degree"])
    assert list(got["n_nodes"]) == list(want["n_nodes"])
    # histogram mass = node count
    n_nodes = con.execute(_UND + """
        SELECT count(DISTINCT node) FROM (
          SELECT u AS node FROM und UNION ALL SELECT v FROM und)
    """).fetchone()[0]
    assert int(got["n_nodes"].sum()) == n_nodes


@pytest.mark.usefixtures("ray_session")
def test_degree_distribution_empty():
    from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
        degree_distribution,
    )

    got = degree_distribution(_edge_ds([("a", "a")]))  # only a self-loop
    assert got.count() == 0
    assert got.schema().names == ["degree", "n_nodes"]


def _duckdb_triangles(pairs) -> int:
    con = duckdb.connect()
    _register(con, pairs)
    return con.execute(_UND + """
        SELECT count(*) FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    """).fetchone()[0]


@pytest.mark.usefixtures("ray_session")
class TestTriangles:
    def test_local_matches_duckdb(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            triangle_count,
        )

        pairs = _messy_graph()
        want = _duckdb_triangles(pairs)
        assert want >= 10 + 4  # 5-clique + 4-clique planted
        assert triangle_count(_edge_ds(pairs)) == want

    def test_distributed_matches_local(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            triangle_count,
        )

        pairs = _messy_graph(seed=13)
        want = _duckdb_triangles(pairs)
        got = triangle_count(_edge_ds(pairs), num_partitions=8,
                             local_edge_cutoff=0)
        assert got == want

    def test_edge_cases(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            triangle_count,
        )

        assert triangle_count(_edge_ds([])) == 0
        assert triangle_count(_edge_ds([("a", "b"), ("b", "c")])) == 0
        tri = [("a", "b"), ("b", "c"), ("c", "a")]
        assert triangle_count(_edge_ds(tri)) == 1
        assert triangle_count(_edge_ds(tri), local_edge_cutoff=0,
                              num_partitions=4) == 1


def _duckdb_node_triangles(pairs):
    con = duckdb.connect()
    _register(con, pairs)
    return dict(con.execute(_UND + """
        , tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT node, count(*) FROM (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        GROUP BY node
    """).fetchall())


@pytest.mark.usefixtures("ray_session")
class TestLocalClustering:
    def _check(self, pairs, **kw):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            local_clustering,
        )

        got = local_clustering(_edge_ds(pairs), **kw).to_pandas()
        want_tri = _duckdb_node_triangles(pairs)
        con = duckdb.connect()
        _register(con, pairs)
        want_deg = dict(con.execute(_UND + """
            SELECT node, count(*) FROM (
              SELECT u AS node FROM und UNION ALL SELECT v FROM und)
            GROUP BY node
        """).fetchall())
        assert len(got) == len(want_deg)
        for _, r in got.iterrows():
            assert r["degree"] == want_deg[r["node"]], r["node"]
            assert r["triangles"] == want_tri.get(r["node"], 0), r["node"]
            d, t = r["degree"], r["triangles"]
            want_c = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
            assert r["clustering"] == pytest.approx(want_c)

    def test_local_matches_duckdb(self):
        self._check(_messy_graph())

    def test_distributed_matches_duckdb(self):
        self._check(_messy_graph(seed=13), num_partitions=8,
                    local_edge_cutoff=0)

    def test_clique_coefficient_is_one(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            local_clustering,
        )

        clique = [(f"c{i}", f"c{j}")
                  for i in range(5) for j in range(i + 1, 5)]
        for kw in ({}, {"local_edge_cutoff": 0, "num_partitions": 4}):
            got = local_clustering(_edge_ds(clique), **kw).to_pandas()
            assert (got["clustering"] == 1.0).all()
            assert (got["triangles"] == 6).all()


def _peel_oracle(pairs, k):
    """Independent sequential k-core peel (one node at a time, queue
    based — different order than the engine's drop-all-per-round)."""
    adj: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    queue = [n for n, s in adj.items() if len(s) < k]
    while queue:
        n = queue.pop()
        if n not in adj:
            continue
        for m in adj[n]:
            s = adj[m]
            s.discard(n)
            if len(s) < k:
                queue.append(m)
        del adj[n]
    return {n: len(s) for n, s in adj.items()}


@pytest.mark.usefixtures("ray_session")
class TestKCore:
    def test_matches_peel_oracle(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            k_core,
        )

        pairs = _messy_graph()
        for k in (2, 3, 4):
            want = _peel_oracle(pairs, k)
            got = k_core(_edge_ds(pairs), k).to_pandas()
            assert dict(zip(got["node"], got["degree"])) == want, k

    def test_distributed_matches_local(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            k_core,
        )

        # chain + cliques: peeling the chain takes multiple rounds
        chain = [(f"z{i:02d}", f"z{i + 1:02d}") for i in range(15)]
        pairs = _messy_graph(60, 150, seed=5) + chain
        for k in (2, 4):
            want = _peel_oracle(pairs, k)
            got = k_core(_edge_ds(pairs), k, num_partitions=8,
                         local_edge_cutoff=0).to_pandas()
            assert dict(zip(got["node"], got["degree"])) == want, k

    def test_no_core(self):
        from temporal_knowledge_graphs_ray.pipelines.graph_analytics import (
            k_core,
        )

        star = [("hub", f"s{i}") for i in range(6)]
        got = k_core(_edge_ds(star), 2)
        assert got.count() == 0
        got_d = k_core(_edge_ds(star), 2, local_edge_cutoff=0,
                       num_partitions=4)
        assert got_d.count() == 0
        assert got_d.schema().names == ["node", "degree"]
