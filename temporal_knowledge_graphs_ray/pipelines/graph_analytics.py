"""Whole-graph structure analytics: degree distribution, triangle count,
k-core (scale additions — the reference's graph lives in Neo4j where
these are GDS calls, graph/neo4j_client.py; this engine computes them as
batch dataflows over the (subj_id, obj_id) edge table).

Shared graph semantics (pinned for the oracles in
tests/test_graph_analytics.py): the UNDIRECTED SIMPLE graph — self-loops
dropped, parallel/reciprocal edges collapsed, degree = number of DISTINCT
neighbors.

Physical plans follow the house pattern (see ``connected_components``):
every wide step is a hash-bucketed ``groupby(bucket).map_groups`` (never
a per-key group, never a ``Dataset.join`` inside a loop), vectorized
pandas/numpy inside each bucket task; graphs under ``local_edge_cutoff``
edges short-circuit to an in-process path with identical output. The
triangle plan orients each edge from its lower (degree, id) endpoint, so
per-node wedge fan-out is bounded by O(sqrt(2m)) regardless of hub skew —
the standard distributed-triangle partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_np(values: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_array(values.to_numpy(dtype=object), categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def _norm_pairs(edges_ds):
    """(subj_id, obj_id) -> batch-local distinct (u, v) with u < v, no
    self-loops. Global dedup happens inside the first bucketed group (all
    copies of a pair share min-endpoint, hence bucket)."""

    def norm(t: pa.Table) -> pa.Table:
        # null endpoints (pluggable extractors can emit them; the store's
        # edge merge drops them, raw edge feeds may not) are dropped, not
        # crashed on
        t = t.drop_null()
        a = t["subj_id"].cast(pa.string()).to_pandas()
        b = t["obj_id"].cast(pa.string()).to_pandas()
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        df = pd.DataFrame({"u": u, "v": v})
        df = df[df["u"] != df["v"]].drop_duplicates()
        # typed construction: an empty object-dtype frame would infer
        # null-type columns and break block schema unification
        return pa.table({"u": pa.array(df["u"], pa.string()),
                         "v": pa.array(df["v"], pa.string())})

    return edges_ds.select_columns(["subj_id", "obj_id"]).map_batches(
        norm, batch_format="pyarrow")


def _both_directions(num_partitions: int):
    """Batch fn: (u, v) pairs -> both (node, nbr) directions, bucketed
    by node — the shared expansion under adjacency and degree counting."""

    def both(t: pa.Table) -> pa.Table:
        u = t["u"].to_pandas()
        v = t["v"].to_pandas()
        node = pd.concat([u, v], ignore_index=True)
        nbr = pd.concat([v, u], ignore_index=True)
        return pa.table({
            "node": pa.array(node, pa.string()),
            "nbr": pa.array(nbr, pa.string()),
            "bucket": pa.array(_bucket_np(node, num_partitions),
                               pa.int32())})

    return both


def _adjacency(pairs_ds, num_partitions: int):
    """Distinct directed adjacency (node, nbr) bucketed by node — both
    directions of each undirected pair; globally distinct within each
    node-bucket group."""

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["node", "nbr"])

    return (pairs_ds.map_batches(_both_directions(num_partitions),
                                 batch_format="pyarrow")
            .groupby("bucket").map_groups(dedup, batch_format="pandas"))


def _degree_from_pairs(pairs_ds, num_partitions: int):
    """Normalized distinct (u, v) pairs -> (node, degree) Dataset.

    One bucketed shuffle: both directions of each pair land in the
    endpoint's bucket, the group task dedups and counts — distinct
    neighbors per node, never per-key groups."""

    def count_deg(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates(subset=["node", "nbr"])
             .groupby("node", as_index=False).size()
             .rename(columns={"size": "degree"}))
        d["degree"] = d["degree"].astype(np.int64)
        return d[["node", "degree"]]

    return (pairs_ds.map_batches(_both_directions(num_partitions),
                                 batch_format="pyarrow")
            .groupby("bucket").map_groups(count_deg, batch_format="pandas"))


def degree_table(edges_ds, num_partitions: int = 64):
    """Per-node distinct-neighbor degree: (node, degree) Dataset."""
    return _degree_from_pairs(_norm_pairs(edges_ds), num_partitions)


def degree_distribution(edges_ds, num_partitions: int = 64):
    """Degree histogram of the undirected simple graph: (degree, n_nodes)
    — the first diagnostic of web-graph skew (hub detection). The final
    histogram groupby is over DISTINCT DEGREE VALUES (tiny), with Ray's
    native map-side-combined count."""
    import ray.data as rd

    pairs = _norm_pairs(edges_ds).materialize()
    if pairs.count() == 0:
        return rd.from_arrow(pa.table({
            "degree": pa.array([], pa.int64()),
            "n_nodes": pa.array([], pa.int64())}))

    deg = _degree_from_pairs(pairs, num_partitions)
    out = deg.groupby("degree").count()

    # rename + type in one projection (Dataset.rename_columns chokes on
    # the pandas-format blocks map_groups emits upstream)
    def typed(t: pa.Table) -> pa.Table:
        return pa.table({
            "degree": t["degree"].cast(pa.int64()),
            "n_nodes": t["count()"].cast(pa.int64())})

    return out.map_batches(typed, batch_format="pyarrow").sort("degree")


def _oriented_edges(pairs, deg, num_partitions: int):
    """Each distinct (u, v) pair oriented from its lower (degree, id)
    endpoint: (src, dst, bucket-by-src) Dataset. Two mixed-union
    co-location shuffles (house pattern: edge rows + degree rows share a
    schema; degree rows have null "other") attach both endpoint degrees
    without a Dataset.join. Orienting by (deg, id) rank caps oriented
    out-degree at O(sqrt(2m)) — no hub explodes the wedge step."""

    def edge_rows_u(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"node": t["u"].astype(object),
                           "other": t["v"].astype(object)})
        df["degree"] = np.int64(-1)
        df["bucket"] = _bucket_np(df["node"], num_partitions)
        return df

    def deg_rows(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"node": t["node"].astype(object),
                           "other": pd.Series([None] * len(t),
                                              dtype=object),
                           "degree": t["degree"].astype(np.int64)})
        df["bucket"] = _bucket_np(df["node"], num_partitions)
        return df

    def attach_u(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["other"].isna()].set_index("node")["degree"]
        e = g[g["other"].notna()]
        # global edge dedup: all copies of (u,v) land in u's bucket
        e = e.drop_duplicates(subset=["node", "other"])
        out = pd.DataFrame({
            "u": e["node"], "v": e["other"],
            "deg_u": lut.reindex(e["node"]).to_numpy(dtype=np.int64),
        })
        out["bucket"] = _bucket_np(out["v"], num_partitions)
        return out

    mixed_u = (pairs.map_batches(edge_rows_u, batch_format="pandas")
               .union(deg.map_batches(deg_rows, batch_format="pandas")))
    with_u = mixed_u.groupby("bucket").map_groups(
        attach_u, batch_format="pandas")

    def edge_rows_v(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u", "v", "deg_u"]].copy()
        out["degree"] = np.int64(-1)
        out = out.rename(columns={"v": "node", "u": "other"})
        out["bucket"] = _bucket_np(out["node"], num_partitions)
        return out[["node", "other", "deg_u", "degree", "bucket"]]

    def deg_rows_v(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"node": t["node"].astype(object),
                           "other": pd.Series([None] * len(t),
                                              dtype=object),
                           "deg_u": np.int64(-1),
                           "degree": t["degree"].astype(np.int64)})
        df["bucket"] = _bucket_np(df["node"], num_partitions)
        return df

    def orient(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["other"].isna()].set_index("node")["degree"]
        e = g[g["other"].notna()]
        deg_v = lut.reindex(e["node"]).to_numpy(dtype=np.int64)
        u = e["other"].to_numpy(dtype=object)
        v = e["node"].to_numpy(dtype=object)
        deg_u = e["deg_u"].to_numpy(dtype=np.int64)
        # orient lower (deg, id) -> higher; (u, v) already id-ordered so
        # ties (equal degrees) fall back to id order
        u_first = (deg_u < deg_v) | ((deg_u == deg_v) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        out = pd.DataFrame({"src": src, "dst": dst})
        out["bucket"] = _bucket_np(out["src"], num_partitions)
        return out

    mixed_v = (with_u.map_batches(edge_rows_v, batch_format="pandas")
               .union(deg.map_batches(deg_rows_v, batch_format="pandas")))
    return mixed_v.groupby("bucket").map_groups(
        orient, batch_format="pandas")


def triangle_count(edges_ds, num_partitions: int = 64,
                   local_edge_cutoff: int = 500_000) -> int:
    """Total triangles in the undirected simple graph.

    Distributed plan (all bucketed map_groups, 5 shuffles total):

    1. distinct degree per node (``degree_table``'s adjacency),
    2. attach deg to each edge's u endpoint (u-bucket co-location),
    3. attach deg to v and ORIENT each edge from its lower (deg, id)
       endpoint — caps oriented out-degree at O(sqrt(2m)), so no hub
       explodes the wedge step,
    4. wedges: per src, all out-neighbor pairs (id-ordered),
    5. match wedges against the distinct edge set on the (a, b) pair key;
       every triangle is counted exactly once (at its min-rank vertex).
    """
    pairs = _norm_pairs(edges_ds).materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return 0

    if n_edges <= local_edge_cutoff:
        tab = pairs.take_all()
        edge_set = {(r["u"], r["v"]) for r in tab}
        adj: dict = {}
        for a, b in edge_set:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rank = {n: (len(s), n) for n, s in adj.items()}
        total = 0
        for a, nbrs in adj.items():
            out = sorted(n for n in nbrs if rank[n] > rank[a])
            for i in range(len(out)):
                for j in range(i + 1, len(out)):
                    x, y = out[i], out[j]
                    if (min(x, y), max(x, y)) in edge_set:
                        total += 1
        return total

    deg = _degree_from_pairs(pairs, num_partitions).materialize()
    oriented = _oriented_edges(pairs, deg, num_partitions)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs: list[pd.DataFrame] = []
        for _, grp in g.groupby("src", sort=False):
            d = np.sort(grp["dst"].to_numpy(dtype=object))
            n = len(d)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"a": d[i], "b": d[j]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "is_edge": pd.Series(dtype=np.int8),
                                 "bucket": pd.Series(dtype=np.int32)})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.int8(0)
        out["bucket"] = _bucket_np(out["a"] + "\x00" + out["b"],
                                   num_partitions)
        return out

    wedge_rows = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pandas")

    def edge_keys(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"a": t["u"].astype(object),
                           "b": t["v"].astype(object)})
        df["is_edge"] = np.int8(1)
        df["bucket"] = _bucket_np(df["a"] + "\x00" + df["b"], num_partitions)
        return df

    def match(g: pd.DataFrame) -> pd.DataFrame:
        edges = g[g["is_edge"] == 1].drop_duplicates(subset=["a", "b"])
        wed = g[g["is_edge"] == 0]
        key_e = edges["a"] + "\x00" + edges["b"]
        key_w = wed["a"] + "\x00" + wed["b"]
        return pd.DataFrame({
            "n": [np.int64(key_w.isin(set(key_e)).sum())]})

    matched = (wedge_rows.union(
        pairs.map_batches(edge_keys, batch_format="pandas"))
        .groupby("bucket").map_groups(match, batch_format="pandas"))
    return int(matched.sum(on="n") or 0)


def local_clustering(edges_ds, num_partitions: int = 64,
                     local_edge_cutoff: int = 500_000):
    """Per-node triangle count and local clustering coefficient:
    Dataset of (node, degree, triangles, clustering) for EVERY node,
    clustering = 2T / (d(d-1)) (0.0 when d < 2).

    Same oriented-wedge plan as ``triangle_count``, but each matched
    wedge (src, a, b) credits ALL THREE vertices (one credit row each —
    a triangle credits each corner exactly once since it is generated
    only at its min-rank vertex), then a bucketed groupby sums credits
    and a mixed-union co-location attaches the degree table for the
    coefficient — no Dataset.join anywhere."""
    import ray.data as rd

    empty = pa.table({"node": pa.array([], pa.string()),
                      "degree": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64()),
                      "clustering": pa.array([], pa.float64())})
    pairs = _norm_pairs(edges_ds).materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= local_edge_cutoff:
        tab = pairs.take_all()
        edge_set = {(r["u"], r["v"]) for r in tab}
        adj: dict = {}
        for a, b in edge_set:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rank = {n: (len(s), n) for n, s in adj.items()}
        tri = {n: 0 for n in adj}
        for a, nbrs in adj.items():
            out = sorted(n for n in nbrs if rank[n] > rank[a])
            for i in range(len(out)):
                for j in range(i + 1, len(out)):
                    x, y = out[i], out[j]
                    if (min(x, y), max(x, y)) in edge_set:
                        tri[a] += 1
                        tri[x] += 1
                        tri[y] += 1
        nodes = sorted(adj)
        degs = np.array([len(adj[n]) for n in nodes], dtype=np.int64)
        tris = np.array([tri[n] for n in nodes], dtype=np.int64)
        denom = degs * (degs - 1)
        coef = np.where(denom > 0, 2.0 * tris / np.maximum(denom, 1), 0.0)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "degree": pa.array(degs),
            "triangles": pa.array(tris),
            "clustering": pa.array(coef, pa.float64())}))

    deg = _degree_from_pairs(pairs, num_partitions).materialize()
    oriented = _oriented_edges(pairs, deg, num_partitions)

    def wedges_src(g: pd.DataFrame) -> pd.DataFrame:
        outs: list[pd.DataFrame] = []
        for src, grp in g.groupby("src", sort=False):
            d = np.sort(grp["dst"].to_numpy(dtype=object))
            n = len(d)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"a": d[i], "b": d[j],
                                      "src": src}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "src": pd.Series(dtype=object),
                                 "is_edge": pd.Series(dtype=np.int8),
                                 "bucket": pd.Series(dtype=np.int32)})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.int8(0)
        out["bucket"] = _bucket_np(out["a"] + "\x00" + out["b"],
                                   num_partitions)
        return out

    def edge_keys(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"a": t["u"].astype(object),
                           "b": t["v"].astype(object)})
        df["src"] = pd.Series([None] * len(df), dtype=object)
        df["is_edge"] = np.int8(1)
        df["bucket"] = _bucket_np(df["a"] + "\x00" + df["b"],
                                  num_partitions)
        return df

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        edges = g[g["is_edge"] == 1].drop_duplicates(subset=["a", "b"])
        wed = g[g["is_edge"] == 0]
        key_e = set(edges["a"] + "\x00" + edges["b"])
        hit = wed[(wed["a"] + "\x00" + wed["b"]).isin(key_e)]
        if not len(hit):
            return pd.DataFrame({"node": pd.Series(dtype=object),
                                 "t": pd.Series(dtype=np.int64),
                                 "bucket": pd.Series(dtype=np.int32)})
        nodes = pd.concat([hit["src"], hit["a"], hit["b"]],
                          ignore_index=True)
        out = (pd.DataFrame({"node": nodes})
               .groupby("node", as_index=False).size()
               .rename(columns={"size": "t"}))
        out["t"] = out["t"].astype(np.int64)
        out["bucket"] = _bucket_np(out["node"], num_partitions)
        return out

    credits = (oriented.groupby("bucket")
               .map_groups(wedges_src, batch_format="pandas")
               .union(pairs.map_batches(edge_keys, batch_format="pandas"))
               .groupby("bucket")
               .map_groups(credit, batch_format="pandas"))

    # coefficient: co-locate per-node credit partials with the degree
    # rows (shared schema; degree rows carry t = -1 marker)
    def deg_side(t: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"node": t["node"].astype(object),
                           "t": np.int64(-1),
                           "degree": t["degree"].astype(np.int64)})
        df["bucket"] = _bucket_np(df["node"], num_partitions)
        return df

    def credit_side(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["node", "t", "bucket"]].copy()
        out["degree"] = np.int64(-1)
        return out[["node", "t", "degree", "bucket"]]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        degs = g[g["t"] < 0].set_index("node")["degree"]
        tris = (g[g["t"] >= 0].groupby("node")["t"].sum())
        nodes = degs.index.to_numpy(dtype=object)
        d = degs.to_numpy(dtype=np.int64)
        t = tris.reindex(degs.index).fillna(0).to_numpy(dtype=np.int64)
        denom = d * (d - 1)
        coef = np.where(denom > 0, 2.0 * t / np.maximum(denom, 1), 0.0)
        return pd.DataFrame({"node": nodes, "degree": d,
                             "triangles": t, "clustering": coef})

    return (credits.map_batches(credit_side, batch_format="pandas")
            .union(deg.map_batches(deg_side, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(finish, batch_format="pandas"))


def k_core(edges_ds, k: int, num_partitions: int = 64,
           max_iters: int = 100, local_edge_cutoff: int = 500_000):
    """Nodes of the k-core (maximal subgraph where every node has >= k
    distinct neighbors WITHIN the subgraph): Dataset of (node, degree)
    with the node's final in-core degree.

    Iterative peeling: each round drops ALL nodes below k at once, so
    round count is the graph's peel depth (small for web graphs; capped
    at ``max_iters`` — a hit on the cap raises, never silently returns a
    non-core). Per round: one bucketed degree count + one two-sided
    membership filter (node side co-located, nbr side one rebucket) —
    adjacency and the dropped-node set stay distributed throughout.
    """
    import ray.data as rd

    pairs = _norm_pairs(edges_ds).materialize()
    n_edges = pairs.count()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "degree": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= local_edge_cutoff:
        adj: dict = {}
        for r in pairs.take_all():
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        changed = True
        while changed:
            drop = [n for n, s in adj.items() if len(s) < k]
            changed = bool(drop)
            for n in drop:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        nodes = sorted(adj)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "degree": pa.array([len(adj[n]) for n in nodes], pa.int64())}))

    adj_ds = _adjacency(pairs, num_partitions).materialize()

    def deg_of(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.groupby("node", as_index=False).size()
             .rename(columns={"size": "degree"}))
        d["degree"] = d["degree"].astype(np.int64)
        return d[["node", "degree"]]

    def below_k(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.less(t["degree"], pa.scalar(k, pa.int64())))

    for _ in range(max_iters):
        deg = adj_ds.groupby("bucket").map_groups(
            deg_of, batch_format="pandas").materialize()
        dropped = deg.map_batches(below_k,
                                  batch_format="pyarrow").materialize()
        if dropped.count() == 0:
            return deg.map_batches(
                lambda t: pa.table({
                    "node": t["node"].cast(pa.string()),
                    "degree": t["degree"].cast(pa.int64())}),
                batch_format="pyarrow")

        # filter adjacency: drop rows whose node OR nbr was dropped.
        # shared schema (node, nbr): drop rows have null nbr.
        def drop_rows(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": df["node"].astype(object),
                "nbr": pd.Series([None] * len(df), dtype=object)})
            out["bucket"] = _bucket_np(out["node"], num_partitions)
            return out

        def filter_side(g: pd.DataFrame) -> pd.DataFrame:
            gone = set(g.loc[g["nbr"].isna(), "node"])
            e = g[g["nbr"].notna()]
            if gone:
                e = e[~e["node"].isin(gone) & ~e["nbr"].isin(gone)]
            return e[["node", "nbr", "bucket"]]

        def rebucket_by_nbr(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["nbr", "node"]].rename(
                columns={"nbr": "node", "node": "nbr"})
            out["bucket"] = _bucket_np(out["node"], num_partitions)
            return out

        drops = dropped.map_batches(drop_rows, batch_format="pandas")
        # node side (co-located with adj buckets), then nbr side after a
        # rebucket — both endpoints checked against the full dropped set
        adj_ds = (adj_ds.union(drops)
                  .groupby("bucket")
                  .map_groups(filter_side, batch_format="pandas")
                  .map_batches(rebucket_by_nbr, batch_format="pandas")
                  .union(drops)
                  .groupby("bucket")
                  .map_groups(filter_side, batch_format="pandas")
                  .map_batches(rebucket_by_nbr, batch_format="pandas")
                  .materialize())
        # union+groupby emits ~(input blocks) output blocks, so without a
        # cap the block count TRIPLES per round (3^rounds tiny blocks →
        # exponential per-round wall time). Re-coalesce to the bucket
        # grain whenever the round's output exceeds it.
        if adj_ds.num_blocks() > num_partitions:
            adj_ds = adj_ds.repartition(num_partitions).materialize()
        if adj_ds.count() == 0:
            return rd.from_arrow(empty)  # fully peeled: no k-core

    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def _lpa_local(adj: dict, rounds: int) -> dict:
    """Sequential synchronous LPA (the oracle semantics): every node
    adopts the most frequent label among its distinct neighbors'
    PREVIOUS-round labels, ties -> lexicographically smallest label."""
    from collections import Counter

    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        changed = False
        for n, nbrs in adj.items():
            c = Counter(labels[m] for m in nbrs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
            changed |= best != labels[n]
        labels = new
        if not changed:
            break
    return labels


def label_propagation(edges_ds, rounds: int = 10,
                      num_partitions: int = 64,
                      local_edge_cutoff: int = 500_000):
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) over the undirected simple graph. Returns a
    Dataset of (node, community).

    Semantics pinned for the oracle (tests/test_graph_analytics.py):
    labels start as node ids; each SYNCHRONOUS round every node adopts
    the most frequent label among its distinct neighbors'
    previous-round labels, ties broken by the lexicographically
    smallest label; early-stop when a round changes nothing, else stop
    after ``rounds`` (synchronous LPA can 2-cycle on bipartite
    structures — a bounded round count makes the output a pure function
    of (graph, rounds)). Deterministic by construction: synchronous
    update + total-order tie-break, so retries and any partition layout
    give identical communities.

    Physical plan = the ``connected_components`` shape: labels live in a
    node-grain Dataset (never on the driver) and each round is exactly
    two bucketed ``groupby(bucket).map_groups`` shuffles — (1) co-locate
    each node's label with its adjacency rows (same bucket by
    construction: both are bucketed by the owning node) and emit the
    label to every neighbor, (2) per receiving node take the weighted
    mode of incoming labels. No ``Dataset.join`` in the loop; block
    growth from union+groupby is re-coalesced to the bucket grain per
    round (the k_core cap).
    """
    import ray.data as rd

    pairs = _norm_pairs(edges_ds).materialize()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "community": pa.array([], pa.string())})
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    if pairs.count() <= local_edge_cutoff:
        adj: dict = {}
        for r in pairs.take_all():
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        labels = _lpa_local(adj, rounds)
        nodes = sorted(labels)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "community": pa.array([labels[n] for n in nodes],
                                  pa.string())}))

    adj_ds = _adjacency(pairs, num_partitions).materialize()

    # label rows share the adjacency schema: (node, nbr=None, label,
    # bucket) — adj rows carry null label
    def init_labels(t: pa.Table) -> pa.Table:
        # .to_numpy(): a drop_duplicates frame has a non-contiguous
        # index, and mixing its columns with fresh RangeIndex Series in
        # a DataFrame literal would align-join to NaN holes
        nodes = (t.to_pandas().drop_duplicates(subset=["node"])
                 ["node"].to_numpy(dtype=object))
        # explicit Arrow types: an all-None column would infer the null
        # type and every union with the string-typed adjacency blocks
        # would need schema promotion
        return pa.table({
            "node": pa.array(nodes, pa.string()),
            "nbr": pa.array([None] * len(nodes), pa.string()),
            "label": pa.array(nodes, pa.string()),
            "bucket": pa.array(
                _bucket_np(pd.Series(nodes), num_partitions), pa.int32()),
        })

    def dedup_nodes(g: pd.DataFrame) -> pa.Table:
        # Arrow output with pinned types: the union below requires every
        # block on the path to share one block type AND one schema
        g = g.drop_duplicates(subset=["node"])
        return pa.table({
            "node": pa.array(g["node"].to_numpy(dtype=object),
                             pa.string()),
            "nbr": pa.array([None] * len(g), pa.string()),
            "label": pa.array(g["label"].to_numpy(dtype=object),
                              pa.string()),
            "bucket": pa.array(g["bucket"].to_numpy(dtype=np.int32),
                               pa.int32()),
        })

    labels = (adj_ds.map_batches(init_labels, batch_format="pyarrow")
              .groupby("bucket").map_groups(dedup_nodes,
                                            batch_format="pandas")
              .materialize())

    def adj_with_label_col(df: pd.DataFrame) -> pa.Table:
        # explicit Arrow types (see init_labels): label is all-None here
        return pa.table({
            "node": pa.array(df["node"].to_numpy(dtype=object),
                             pa.string()),
            "nbr": pa.array(df["nbr"].to_numpy(dtype=object),
                            pa.string()),
            "label": pa.array([None] * len(df), pa.string()),
            "bucket": pa.array(
                df["bucket"].to_numpy(dtype=np.int32), pa.int32()),
        })

    adj_mixed = adj_ds.map_batches(adj_with_label_col,
                                   batch_format="pandas").materialize()

    for _ in range(rounds):
        # stage 1: in each owner bucket, join label rows to adjacency
        # rows and send (label -> neighbor) messages; forward the
        # owner's old label for change detection
        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["nbr"].isna()][["node", "label"]]
            ar = g[g["nbr"].notna()][["node", "nbr"]]
            m = ar.merge(lab, on="node")
            out = pd.DataFrame({
                "node": pd.concat([m["nbr"], lab["node"]],
                                  ignore_index=True).astype(object),
                "label": pd.concat([m["label"], lab["label"]],
                                   ignore_index=True).astype(object),
                "is_old": np.concatenate([
                    np.zeros(len(m), dtype=bool),
                    np.ones(len(lab), dtype=bool)]),
            })
            out["bucket"] = _bucket_np(out["node"], num_partitions)
            return out

        mixed = adj_mixed.union(labels)
        msgs = mixed.groupby("bucket").map_groups(propagate,
                                                  batch_format="pandas")

        # stage 2: weighted mode per node with (count desc, label asc)
        def reduce_mode(g: pd.DataFrame) -> pd.DataFrame:
            m = g[~g["is_old"]]
            counts = (m.groupby(["node", "label"], as_index=False)
                      .size())
            counts = counts.sort_values(
                ["node", "size", "label"],
                ascending=[True, False, True], kind="mergesort")
            newl = counts.groupby("node", as_index=False).head(1)
            oldl = g[g["is_old"]].set_index("node")["label"]
            out = pd.DataFrame({
                "node": newl["node"].to_numpy(dtype=object),
                "nbr": pd.Series([None] * len(newl), dtype=object),
                "label": newl["label"].to_numpy(dtype=object),
            })
            out["changed"] = (
                out["label"].to_numpy()
                != oldl.reindex(out["node"]).to_numpy()).astype(np.int32)
            out["bucket"] = _bucket_np(out["node"], num_partitions)
            return out

        new_labels = (msgs.groupby("bucket")
                      .map_groups(reduce_mode, batch_format="pandas")
                      .materialize())
        if new_labels.num_blocks() > num_partitions:
            new_labels = new_labels.repartition(
                num_partitions).materialize()
        n_changed = new_labels.sum(on="changed")

        def strip_changed(df: pd.DataFrame) -> pa.Table:
            # explicit Arrow types (see init_labels): nbr is all-None
            return pa.table({
                "node": pa.array(df["node"].to_numpy(dtype=object),
                                 pa.string()),
                "nbr": pa.array([None] * len(df), pa.string()),
                "label": pa.array(df["label"].to_numpy(dtype=object),
                                  pa.string()),
                "bucket": pa.array(
                    df["bucket"].to_numpy(dtype=np.int32), pa.int32()),
            })

        labels = new_labels.map_batches(
            strip_changed, batch_format="pandas").materialize()
        if not n_changed:
            break

    return labels.map_batches(
        lambda t: pa.table({
            "node": t["node"].cast(pa.string()),
            "community": t["label"].cast(pa.string())}),
        batch_format="pyarrow")
