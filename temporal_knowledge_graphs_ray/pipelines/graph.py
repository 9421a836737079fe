"""Graph-algorithm batch jobs over the materialized nodes/edges tables.

Query-side analogues of the reference's retrieval layer (SURVEY.md §2.9):

- Personalized PageRank (Q1): the reference extracts a bounded subgraph
  and power-iterates locally (ppr_traversal.py:29-259, damping 0.85,
  converge 1e-6 / 20 iters). Here: per-iteration distributed contribution
  pass (map_batches over the edges Dataset with the current score vector
  broadcast) + groupby(target).sum, scores collected to the driver between
  iterations. The score vector is O(#entities) — small relative to edges;
  for graphs where it is not, shard the broadcast by entity-hash.
- entity co-mention counts (G6) over the mentions table.
- entity-match chunk search (Q5): chunks mentioning ANY of a name set,
  scored by matched/|set|.
- temporal validity filter on edges (V8): valid_from <= t < valid_to.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import round_half_away

# above this many nodes the driver stops holding the score/degree
# vectors (O(#nodes) floats) and the power iteration runs with
# DATASET-RESIDENT state instead — see _power_iteration_dataset
DRIVER_NODE_CUTOFF = 5_000_000


def _maybe_dataset(df: pd.DataFrame, as_dataset: bool):
    """Wrap a (entity_id, score) frame as a Dataset when asked — the
    small-graph paths stay pandas-shaped internally, but as_dataset
    callers get ONE return type across all three size regimes."""
    if not as_dataset:
        return df
    import ray.data as rd

    if df.empty:
        return rd.from_arrow(pa.table({
            "entity_id": pa.array([], pa.string()),
            "score": pa.array([], pa.float64())}))
    return rd.from_pandas(df.reset_index(drop=True))


def _round_score_dataset(final, drop_zero: bool):
    """(node, ..., score) iteration state -> (entity_id, score) rounded
    to 8 — the shared distributed tail of the dataset-resident
    PageRank/PPR paths. PPR drops zero scores (unreached nodes);
    pagerank keeps every node like its pandas path."""

    def proj(t: pa.Table) -> pa.Table:
        s = round_half_away(
            np.asarray(t["score"].to_numpy(zero_copy_only=False),
                       dtype=np.float64), 8)
        out = pa.table({"entity_id": t["node"].cast(pa.string()),
                        "score": pa.array(s)})
        if drop_zero:
            out = out.filter(pc.greater(out["score"], pa.scalar(0.0)))
        return out

    return final.map_batches(proj, batch_format="pyarrow")


def _power_iteration_dataset(edges2, state, *, damping: float,
                             max_iters: int, tol: float,
                             normalize: bool, uniform_teleport: float = 0.0,
                             redistribute_dangling: bool = False,
                             num_partitions: int | None = None):
    """Power iteration with NO O(#nodes) driver state: the score vector
    lives as a node-grain Dataset and every update is a join/shuffle.

    ``edges2``: (src, dst) message edges (both directions already
    emitted for undirected traversal). ``state``: (node, deg, tele,
    score) with deg > 0 for every node that appears as a src. Per
    iteration: one edges×state join (the unavoidable cost of not
    broadcasting), a groupby(dst) sum, a state join to apply the
    update, and scalar-only aggregates for dangling mass, the
    normalizer and the convergence delta — the driver never holds more
    than a scalar. This is the billion-node path; the broadcast path
    stays the default below DRIVER_NODE_CUTOFF because joins per
    iteration cost far more than one ray.put at sane sizes.
    """

    import ray
    from ray.data.aggregate import Sum

    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(64, ncpu // 2))
    n_nodes = state.count()
    state = state.materialize()
    for _ in range(max_iters):
        if redistribute_dangling:
            dangling = state.filter(expr="deg <= 0").sum("score")
            dmass = float(dangling or 0.0)
        else:
            dmass = 0.0

        src_state = state.map_batches(
            lambda t: pa.table({"src": t["node"], "s_deg": t["deg"],
                                "s_score": t["score"]}),
            batch_format="pyarrow",
        ).filter(expr="s_score > 0")
        msgs = edges2.join(src_state, "inner", num_partitions,
                           on=("src",))

        def contrib(t: pa.Table) -> pa.Table:
            c = (np.asarray(t["s_score"].to_numpy(zero_copy_only=False),
                            dtype=np.float64)
                 / np.asarray(t["s_deg"].to_numpy(zero_copy_only=False),
                              dtype=np.float64))
            # map-side combine before the wide aggregate
            tbl = pa.table({"node": t["dst"], "c": pa.array(c)})
            return tbl.group_by("node").aggregate([("c", "sum")]) \
                .rename_columns(["node", "c"])

        contribs = (msgs.map_batches(contrib, batch_format="pyarrow")
                    .groupby("node").aggregate(Sum("c", alias_name="c")))

        joined = state.join(contribs, "left_outer", num_partitions,
                            on=("node",))

        extra = damping * dmass / n_nodes if redistribute_dangling else 0.0

        def update(t: pa.Table, _extra=extra) -> pa.Table:
            c = np.nan_to_num(np.asarray(
                t["c"].to_numpy(zero_copy_only=False), dtype=np.float64))
            tele = np.asarray(t["tele"].to_numpy(zero_copy_only=False),
                              dtype=np.float64)
            raw = (1.0 - damping) * (tele + uniform_teleport) \
                + damping * c + _extra
            return pa.table({
                "node": t["node"], "deg": t["deg"], "tele": t["tele"],
                "score": t["score"], "raw": pa.array(raw),
            })

        staged = joined.map_batches(update,
                                    batch_format="pyarrow").materialize()
        denom = float(staged.sum("raw") or 0.0) if normalize else 1.0
        if denom <= 0:
            denom = 1.0

        def finish(t: pa.Table, _denom=denom) -> pa.Table:
            raw = np.asarray(t["raw"].to_numpy(zero_copy_only=False),
                             dtype=np.float64) / _denom
            old = np.asarray(t["score"].to_numpy(zero_copy_only=False),
                             dtype=np.float64)
            return pa.table({
                "node": t["node"], "deg": t["deg"], "tele": t["tele"],
                "score": pa.array(raw),
                "delta": pa.array(np.abs(raw - old)),
            })

        staged = staged.map_batches(finish,
                                    batch_format="pyarrow").materialize()
        delta = float(staged.sum("delta") or 0.0)
        state = staged.drop_columns(["delta"])
        if delta < tol:
            break
    return state


def _ppr_dataset_resident(edges_ds, deg_ds, seed_ids: list[str], *,
                          damping: float, max_iters: int,
                          tol: float, as_dataset: bool = False):
    """PPR above DRIVER_NODE_CUTOFF: score/teleport/degree live as a
    node-grain Dataset; the driver holds seeds + scalars only. Equality
    with the broadcast path is pinned by tests/test_graph_sharded.py
    (forced-sharded run, 1e-9)."""
    # seed membership without a node-grain driver pull (vectorized
    # is_in probe; result is at most |seed_ids| rows)
    seed_arr = pa.array(sorted(set(seed_ids)), pa.string())
    present = (deg_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["node"], value_set=seed_arr)),
        batch_format="pyarrow").take_all() if len(seed_arr) else [])
    seeds = sorted({r["node"] for r in present})
    if not seeds:
        # fallback mirrors the broadcast path: the smallest node id
        seeds = [deg_ds.select_columns(["node"])
                 .sort("node").limit(1).take_all()[0]["node"]]
    w = 1.0 / len(seeds)
    seed_frozen = frozenset(seeds)

    def init_state(t: pa.Table) -> pa.Table:
        node = t["node"].to_pylist()
        tele = np.fromiter((w if n in seed_frozen else 0.0 for n in node),
                           dtype=np.float64, count=len(node))
        return pa.table({
            "node": t["node"],
            "deg": pc.cast(t["deg"], pa.float64()),
            "tele": pa.array(tele),
            "score": pa.array(tele),  # start at the teleport vector
        })

    state = deg_ds.map_batches(init_state, batch_format="pyarrow")

    # undirected: each edge contributes both directions
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["subj_id"].cast(pa.string()).combine_chunks()
        b = t["obj_id"].cast(pa.string()).combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges2 = edges_ds.map_batches(both_dirs,
                                  batch_format="pyarrow").materialize()
    final = _power_iteration_dataset(
        edges2, state, damping=damping, max_iters=max_iters, tol=tol,
        normalize=True)
    scored = _round_score_dataset(final, drop_zero=True)
    if as_dataset:
        # billion-node return: the full node-grain result never lands
        # on the driver — distributed sort keeps the ordering contract
        return scored.sort(["score", "entity_id"],
                           descending=[True, False])
    out = scored.to_pandas()
    return out.sort_values(["score", "entity_id"],
                           ascending=[False, True], ignore_index=True)


def ppr(edges_ds, seed_ids: list[str], damping: float = 0.85,
        max_iters: int = 20, tol: float = 1e-6,
        asof=None, local_edge_cutoff: int = 500_000,
        driver_node_cutoff: int = DRIVER_NODE_CUTOFF,
        as_dataset: bool = False):
    """Personalized PageRank over (subj_id, obj_id[, valid_from]) edges.

    Returns (entity_id, score) sorted desc, rounded to 8. Edges are
    treated as undirected for traversal like the reference's
    ``-[r:RELATES_TO]-`` pattern (ppr_traversal.py:281-299); an ``asof``
    timestamp applies the V8 validity filter first.

    Three regimes by size: bounded graphs iterate locally in numpy;
    mid-size graphs iterate distributed with the score vector broadcast
    per round (driver holds O(#nodes) floats); above
    ``driver_node_cutoff`` nodes the state goes DATASET-RESIDENT
    (_power_iteration_dataset) and the driver holds only scalars.

    ``as_dataset=True`` returns the same (entity_id, score) result as a
    node-grain ``ray.data.Dataset`` (distributed sort, same ordering) —
    the billion-node companion to the dataset-resident iteration, so the
    FULL result never lands on the driver; the default pandas return
    stays for the reference-parity callers.
    """
    import ray
    from ray.data.aggregate import Sum

    cols = ["subj_id", "obj_id"]
    if asof is not None:
        edges_ds = edges_ds.map_batches(
            lambda t: t.filter(pc.less_equal(t["valid_from"],
                                             pa.scalar(asof))),
            batch_format="pyarrow",
        )
    edges_ds = edges_ds.select_columns(cols).materialize()

    # undirected adjacency: each edge contributes both directions
    deg_ds = (
        edges_ds.map_batches(
            lambda t: pa.Table.from_pydict({
                "node": t["subj_id"].to_pylist() + t["obj_id"].to_pylist(),
                "one": [1] * (2 * len(t)),
            }),
            batch_format="pyarrow",
        )
        .groupby("node").aggregate(Sum("one", alias_name="deg"))
        .materialize()
    )
    node_count = deg_ds.count()
    if node_count == 0:
        return _maybe_dataset(
                pd.DataFrame({"entity_id": [], "score": []}), as_dataset)

    if node_count > driver_node_cutoff and \
            edges_ds.count() > local_edge_cutoff:
        return _ppr_dataset_resident(edges_ds, deg_ds, seed_ids,
                                     damping=damping, max_iters=max_iters,
                                     tol=tol, as_dataset=as_dataset)

    out_deg_df = deg_ds.to_pandas()
    degree = dict(zip(out_deg_df["node"], out_deg_df["deg"]))

    seeds = [s for s in seed_ids if s in degree] or sorted(degree)[:1]
    scores = {s: 1.0 / len(seeds) for s in seeds}
    teleport = dict(scores)

    # adaptive: a bounded graph iterates locally in numpy (the reference's
    # own shape — it extracts an induced subgraph and iterates in-process,
    # ppr_traversal.py:179-259); the distributed contribution passes below
    # are the path for graphs that exceed driver memory
    if edges_ds.count() <= local_edge_cutoff:
        import numpy as _np

        etab = edges_ds.to_pandas()
        node_ix = {n: i for i, n in enumerate(sorted(degree))}
        a_ix = etab["subj_id"].map(node_ix).to_numpy()
        b_ix = etab["obj_id"].map(node_ix).to_numpy()
        deg_arr = _np.array([degree[n] for n in sorted(degree)], dtype=float)
        vec = _np.zeros(len(node_ix))
        tele = _np.zeros(len(node_ix))
        for s, w in teleport.items():
            vec[node_ix[s]] = w
            tele[node_ix[s]] = w
        for _ in range(max_iters):
            contrib = _np.zeros(len(node_ix))
            _np.add.at(contrib, b_ix, damping * vec[a_ix] / deg_arr[a_ix])
            _np.add.at(contrib, a_ix, damping * vec[b_ix] / deg_arr[b_ix])
            contrib += (1 - damping) * tele
            total = contrib.sum()
            if total > 0:
                contrib /= total
            delta = float(_np.abs(contrib - vec).sum())
            vec = contrib
            if delta < tol:
                break
        names = sorted(degree)
        out = pd.DataFrame({
            "entity_id": names,
            "score": round_half_away(vec, 8),
        })
        out = out[out["score"] > 0]
        out = out.sort_values(["score", "entity_id"],
                              ascending=[False, True], ignore_index=True)
        return _maybe_dataset(out, as_dataset)

    # ---- distributed path: vectorized contribution passes ----
    # node ids are mapped to dense ints ONCE (broadcast key array + degree
    # vector via a single ray.put); per iteration only the compact float
    # score VECTOR is re-broadcast, and the shuffle key is the int node
    # index — no per-row Python, no string-keyed groupby, no per-iteration
    # dict shipping.
    names_sorted = sorted(degree)
    node_count = len(names_sorted)
    key_arr = pa.array(names_sorted, pa.string())
    deg_np = np.array([degree[n] for n in names_sorted], dtype=np.float64)
    static_ref = ray.put((key_arr, deg_np))

    score_np = np.zeros(node_count)
    tele_np = np.zeros(node_count)
    node_ix_of = {n: i for i, n in enumerate(names_sorted)}
    for s, w in teleport.items():
        score_np[node_ix_of[s]] = w
        tele_np[node_ix_of[s]] = w

    for _ in range(max_iters):
        scores_ref = ray.put(score_np)

        def contribute(t: pa.Table, _d=damping, _sref=scores_ref) -> pa.Table:
            import ray as _ray

            keys, deg = _ray.get(static_ref)
            sc = _ray.get(_sref)
            six = pc.index_in(t["subj_id"], value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            oix = pc.index_in(t["obj_id"], value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            sa, sb = sc[six], sc[oix]
            m1, m2 = sa > 0, sb > 0
            node_ix = np.concatenate([oix[m1], six[m2]])
            contrib = np.concatenate([_d * sa[m1] / deg[six[m1]],
                                      _d * sb[m2] / deg[oix[m2]]])
            # map-side combine before the shuffle
            uniq, inv = np.unique(node_ix, return_inverse=True)
            summed = np.zeros(len(uniq))
            np.add.at(summed, inv, contrib)
            return pa.Table.from_pydict({"node_ix": uniq,
                                         "contrib": summed})

        agg = (
            edges_ds.map_batches(contribute, batch_format="pyarrow")
            .groupby("node_ix").aggregate(Sum("contrib", alias_name="s"))
            .to_pandas()
        )
        new_np = np.zeros(node_count)
        new_np[agg["node_ix"].to_numpy()] = agg["s"].to_numpy()
        new_np += (1 - damping) * tele_np
        total = new_np.sum()
        if total > 0:
            new_np /= total
        delta = float(np.abs(new_np - score_np).sum())
        score_np = new_np
        if delta < tol:
            break

    out = pd.DataFrame({
        "entity_id": names_sorted,
        "score": round_half_away(score_np, 8),
    })
    out = out[out["score"] > 0]
    return out.sort_values(["score", "entity_id"],
                           ascending=[False, True], ignore_index=True)


def comention_pairs(mentions_ds, min_count: int = 2) -> pd.DataFrame:
    """Entity co-mention counts per chunk (G6) with pair-key groupby."""
    from ray.data.aggregate import Count

    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized hash — bucket is a within-run shuffle key only
        h = pd.util.hash_array(
            np.asarray(t["chunk_id"].to_pylist(), dtype=object), categorize=False) % 64
        return t.append_column("bucket", pa.array(h.astype("int32")))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["chunk_id", "entity_key"]].drop_duplicates()
        m = df.merge(df, on="chunk_id", suffixes=("_a", "_b"))
        m = m[m["entity_key_a"] < m["entity_key_b"]]
        out = m[["chunk_id", "entity_key_a", "entity_key_b"]].drop_duplicates()
        return out.rename(columns={"entity_key_a": "a", "entity_key_b": "b"})[
            ["a", "b"]]

    out = (
        mentions_ds.select_columns(["chunk_id", "entity_key"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_chunks"))
        .to_pandas()
    )
    out = out[out["n_chunks"] >= min_count]
    return out.sort_values(["n_chunks", "a", "b"],
                           ascending=[False, True, True], ignore_index=True)


def entity_match_chunks(mentions_ds, names: list[str],
                        match_all: bool = False, k: int = 10) -> pd.DataFrame:
    """Entity-match chunk search (Q5): score = matched / |name set|."""
    from ..functions.normalize import surface_key

    want = {surface_key(n) for n in names}
    want_arr = pa.array(sorted(want))

    def match(t: pa.Table) -> pa.Table:
        # map-side distinct: repeated (chunk, key) mentions collapse
        # before the driver collect, not after
        hit = t.filter(pc.is_in(t["entity_key"], value_set=want_arr))
        return hit.group_by(["chunk_id", "entity_key"]).aggregate([])

    hits = (
        mentions_ds.select_columns(["chunk_id", "entity_key"])
        .map_batches(match, batch_format="pyarrow")
        .to_pandas().drop_duplicates()
    )
    if hits.empty:
        return pd.DataFrame({"chunk_id": [], "score": []})
    counts = hits.groupby("chunk_id")["entity_key"].nunique()
    scores = (counts / len(want)).rename("score").reset_index()
    if match_all:
        scores = scores[scores["score"] >= 1.0]
    scores["score"] = round_half_away(scores["score"].to_numpy(), 6)
    return (scores.sort_values(["score", "chunk_id"],
                               ascending=[False, True], ignore_index=True)
            .head(k))


def edges_valid_at(edges_ds, t):
    """Relationship validity filter (V8): valid_from <= t < valid_to."""
    ts = pa.scalar(t)

    def valid(tbl: pa.Table) -> pa.Table:
        # Kleene logic: plain and_/or_ propagate the NULL of an open-ended
        # valid_to and the filter would silently drop those rows
        open_ended = pc.is_null(tbl["valid_to"])
        in_range = pc.and_kleene(
            pc.less_equal(tbl["valid_from"], ts),
            pc.or_kleene(open_ended, pc.greater(tbl["valid_to"], ts)),
        )
        return tbl.filter(in_range)

    return edges_ds.map_batches(valid, batch_format="pyarrow")


def expand_context(chunks_ds, mentions_ds, chunk_ids: list[str],
                   window: int = 1) -> pd.DataFrame:
    """Context expansion (Q8, reference retrieval/context_expansion.py:23-275):
    for each seed chunk, gather (a) neighbor chunks within
    ``chunk_index +- window`` of the same url and (b) chunks sharing an
    entity with the seed. Returns (seed_chunk_id, related_chunk_id, how).

    Seeds are few (a query's top-k), so seed metadata is collected to the
    driver and broadcast into the batch filters — no shuffle.
    """
    import pyarrow.compute as pcc

    seed_arr = pa.array(chunk_ids)
    seeds = (
        chunks_ds.select_columns(["url", "chunk_id", "chunk_index"])
        .map_batches(lambda t: t.filter(pc.is_in(t["chunk_id"],
                                                 value_set=seed_arr)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    _ = pcc
    if seeds.empty:
        return pd.DataFrame({"seed_chunk_id": [], "related_chunk_id": [],
                             "how": []})

    seed_urls = pa.array(sorted(set(seeds["url"])))
    neighbor_rows = (
        chunks_ds.select_columns(["url", "chunk_id", "chunk_index"])
        .map_batches(lambda t: t.filter(pc.is_in(t["url"],
                                                 value_set=seed_urls)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    out = []
    for seed in seeds.itertuples():
        same_url = neighbor_rows[neighbor_rows["url"] == seed.url]
        near = same_url[
            (same_url["chunk_index"] - seed.chunk_index).abs().le(window)
            & (same_url["chunk_id"] != seed.chunk_id)
        ]
        for cid in near["chunk_id"]:
            out.append({"seed_chunk_id": seed.chunk_id,
                        "related_chunk_id": cid, "how": "neighbor"})

    seed_ment = (
        mentions_ds.select_columns(["chunk_id", "entity_key"])
        .map_batches(lambda t: t.filter(pc.is_in(t["chunk_id"],
                                                 value_set=seed_arr)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    if not seed_ment.empty:
        want_keys = pa.array(sorted(set(seed_ment["entity_key"])))
        related = (
            mentions_ds.select_columns(["chunk_id", "entity_key"])
            .map_batches(lambda t: t.filter(pc.is_in(t["entity_key"],
                                                     value_set=want_keys)),
                         batch_format="pyarrow")
            .to_pandas().drop_duplicates()
        )
        m = seed_ment.merge(related, on="entity_key",
                            suffixes=("_seed", "_rel"))
        m = m[m["chunk_id_seed"] != m["chunk_id_rel"]]
        for r in m[["chunk_id_seed", "chunk_id_rel"]].drop_duplicates().itertuples():
            out.append({"seed_chunk_id": r.chunk_id_seed,
                        "related_chunk_id": r.chunk_id_rel,
                        "how": "shared_entity"})
    df = pd.DataFrame(out, columns=["seed_chunk_id", "related_chunk_id",
                                    "how"])
    return (df.drop_duplicates()
            .sort_values(["seed_chunk_id", "how", "related_chunk_id"],
                         ignore_index=True))


def score_chunks_by_ppr(mentions_ds, ppr_scores: pd.DataFrame,
                        k: int = 10, decay: float = 0.95,
                        ref_year: int = 2024) -> pd.DataFrame:
    """Chunk scoring from PPR (Q2, reference ppr_traversal.py:337-448):
    chunk score = sum over mentioned entities of ppr * confidence, then
    per-year temporal decay from valid_from, then top-k."""
    import ray

    score_ref = ray.put(dict(zip(ppr_scores["entity_id"],
                                 ppr_scores["score"])))

    def contrib(t: pa.Table) -> pa.Table:
        sc = __import__("ray").get(score_ref)
        from ..stages.entities import entity_id_for

        vals, chunk_ids, years = [], [], []
        for cid, etype, key, conf, vf in zip(
            t["chunk_id"].to_pylist(), t["type"].to_pylist(),
            t["entity_key"].to_pylist(), t["confidence"].to_pylist(),
            t["valid_from"].to_pylist(),
        ):
            p = sc.get(entity_id_for(etype, key))
            if p:
                chunk_ids.append(cid)
                vals.append(p * float(conf))
                years.append(vf.year if vf is not None else ref_year)
        return pa.Table.from_pydict({
            "chunk_id": chunk_ids, "contrib": vals, "year": years,
        })

    from ray.data.aggregate import Max, Sum

    agg = (
        mentions_ds.select_columns(
            ["chunk_id", "type", "entity_key", "confidence", "valid_from"])
        .map_batches(contrib, batch_format="pyarrow")
        .groupby("chunk_id")
        .aggregate(Sum("contrib", alias_name="raw_score"),
                   Max("year", alias_name="year"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"chunk_id": [], "score": []})
    age = (ref_year - agg["year"]).clip(lower=0)
    agg["score"] = round_half_away(
        (agg["raw_score"] * np.power(decay, age)).to_numpy(), 8)
    return (agg[["chunk_id", "score"]]
            .sort_values(["score", "chunk_id"], ascending=[False, True],
                         ignore_index=True).head(k))


def bfs_related_entities(edges_ds, seed_ids: list[str],
                         max_depth: int = 2) -> pd.DataFrame:
    """BFS related entities (Q3, reference queries.py:23-57): k rounds of
    frontier expansion over the (undirected) edges; returns
    (entity_id, distance) with minimum distance per entity.

    Each round is a broadcast-frontier semi-join: only edges touching the
    current frontier leave the workers, so the driver holds the visited
    set (O(reachable entities)), never the edge list — the scale-correct
    shape for k rounds of hash join on edges (SURVEY.md Q3 mapping).
    """
    edges_small = edges_ds.select_columns(["subj_id", "obj_id"]).materialize()
    dist = {s: 0 for s in seed_ids}
    frontier = set(seed_ids)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        want = pa.array(sorted(frontier))

        def neighbors(t: pa.Table, _w=want) -> pa.Table:
            # project to the neighbor ids and dedup WORKER-side: on a hub
            # frontier the touching-edge set is nearly the whole edge list,
            # so shipping full rows to the driver would be O(edges)
            a_in = t.filter(pc.is_in(t["subj_id"], value_set=_w))
            b_in = t.filter(pc.is_in(t["obj_id"], value_set=_w))
            nodes = pa.concat_arrays([
                a_in["obj_id"].combine_chunks(),
                b_in["subj_id"].combine_chunks(),
            ])
            return pa.Table.from_arrays([pc.unique(nodes)], names=["node"])

        hits = (edges_small.map_batches(neighbors, batch_format="pyarrow")
                .to_pandas())
        nxt = set(hits["node"]) - set(dist)
        for n in nxt:
            dist[n] = depth
        frontier = nxt
    out = pd.DataFrame({"entity_id": list(dist),
                        "distance": list(dist.values())})
    return out.sort_values(["distance", "entity_id"], ignore_index=True)


def shortest_path(edges_ds, src: str, dst: str,
                  max_hops: int = 6) -> pd.DataFrame:
    """Shortest path between two entities (Q4, reference
    operations.py:532-567 ``shortestPath((a)-[:RELATES_TO*1..h]-(b))``).

    Distributed BFS with predecessor tracking: each round is a
    broadcast-frontier semi-join that emits (node, candidate-pred) pairs
    worker-side and reduces them with a distributed ``Min`` — the
    predecessor of every newly-reached node is the lexicographically
    smallest frontier neighbor, which makes the reconstructed path unique
    and deterministic regardless of block order. Returns (step, entity_id)
    rows; empty frame if unreachable within ``max_hops``.
    """
    from ray.data.aggregate import Min

    if src == dst:
        return pd.DataFrame({"step": [0], "entity_id": [src]})
    edges_small = edges_ds.select_columns(["subj_id", "obj_id"]).materialize()
    dist = {src: 0}
    pred: dict[str, str] = {}
    frontier = {src}
    for _depth in range(1, max_hops + 1):
        if not frontier:
            break
        want = pa.array(sorted(frontier))

        def pred_edges(t: pa.Table, _w=want) -> pa.Table:
            a_in = t.filter(pc.is_in(t["subj_id"], value_set=_w))
            b_in = t.filter(pc.is_in(t["obj_id"], value_set=_w))
            node = pa.concat_arrays([a_in["obj_id"].combine_chunks(),
                                     b_in["subj_id"].combine_chunks()])
            p = pa.concat_arrays([a_in["subj_id"].combine_chunks(),
                                  b_in["obj_id"].combine_chunks()])
            return pa.Table.from_arrays([node, p], names=["node", "pred"])

        cand = (
            edges_small.map_batches(pred_edges, batch_format="pyarrow")
            .groupby("node").aggregate(Min("pred", alias_name="min_pred"))
            .to_pandas()
        )
        nxt = set()
        for node, p in zip(cand["node"], cand["min_pred"]):
            if node not in dist:
                nxt.add(node)
                pred[node] = p
        for n in nxt:
            dist[n] = _depth
        if dst in dist:
            break
        frontier = nxt
    if dst not in dist:
        return pd.DataFrame({"step": pd.Series([], dtype="int64"),
                             "entity_id": pd.Series([], dtype="object")})
    path = [dst]
    while path[-1] != src:
        path.append(pred[path[-1]])
    path.reverse()
    return pd.DataFrame({"step": range(len(path)), "entity_id": path})


def fulltext_search(chunks_ds, query_terms: list[str],
                    k: int = 10) -> pd.DataFrame:
    """Full-text fallback search (Q6, reference graph_search.py:557-597):
    score = number of distinct query terms present (case-insensitive),
    top-k with chunk_id tiebreak. A regex scan stands in for the Neo4j
    full-text index; at scale an inverted index actor would back this."""
    import re as _re

    patterns = [(term, _re.compile(_re.escape(term.lower())))
                for term in query_terms]

    def score(t: pa.Table) -> pa.Table:
        cids, scores = [], []
        for cid, text in zip(t["chunk_id"].to_pylist(),
                             t["text"].to_pylist()):
            lowered = text.lower()
            n = sum(1 for _, rx in patterns if rx.search(lowered))
            if n:
                cids.append(cid)
                scores.append(n)
        return pa.Table.from_pydict({"chunk_id": cids, "n_terms": scores})

    out = (chunks_ds.select_columns(["chunk_id", "text"])
           .map_batches(score, batch_format="pyarrow").to_pandas())
    return (out.sort_values(["n_terms", "chunk_id"],
                            ascending=[False, True], ignore_index=True)
            .head(k))


def hybrid_search(chunks_ds, mentions_ds, query_text: str,
                  entity_names: list[str], k: int = 10,
                  rrf_c: int = 60) -> pd.DataFrame:
    """Hybrid retrieval (reference hybrid_search.py:34-163): fuse a
    vector-similarity ranking (deterministic hash embeddings of chunk
    texts vs the query) with an entity-match ranking via RRF."""
    import numpy as np_

    from ..functions.embed import embed_text
    from ..stages.similarity import cosine_scores

    q = embed_text(query_text).astype(np_.float64)

    from ..stages.embed import EmbeddingStage

    embedded = chunks_ds.select_columns(["chunk_id", "text"]).map_batches(
        EmbeddingStage(text_col="text"), batch_format="pyarrow",
        batch_size=512,
    )
    vec_rank = (
        cosine_scores(embedded, q, id_col="chunk_id", emb_col="embedding")
        .to_pandas()
        .sort_values(["cosine", "chunk_id"], ascending=[False, True],
                     ignore_index=True).head(100)
    )
    ent_rank = entity_match_chunks(mentions_ds, entity_names, k=100)

    scores: dict[str, float] = {}
    for rank, cid in enumerate(vec_rank["chunk_id"], start=1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
    for rank, cid in enumerate(ent_rank["chunk_id"], start=1):
        scores[cid] = scores.get(cid, 0.0) + 1.0 / (rrf_c + rank)
    out = pd.DataFrame({"chunk_id": list(scores),
                        "rrf_score": round_half_away(
                            np.array(list(scores.values())), 8)})
    return (out.sort_values(["rrf_score", "chunk_id"],
                            ascending=[False, True], ignore_index=True)
            .head(k))


def diff_graphs(old_edges_ds, new_edges_ds, num_partitions: int = 16):
    """Graph-version diff (T6 at graph grain): classify every triple as
    added / removed / unchanged between two edge tables — the audit step
    after an incremental ingest or supersede run.

    Ray-native: both sides project to a triple key and meet in two
    ``left_anti`` hash joins plus a ``left_semi`` for the intersection —
    no driver-side sets, scales with the edge tables.
    Returns {"added": Dataset, "removed": Dataset, "unchanged": Dataset},
    each carrying (subj_id, pred, obj_id).
    """
    import pyarrow.compute as pcc

    def keyed(ds):
        def fn(t: pa.Table) -> pa.Table:
            k = pcc.binary_join_element_wise(
                t["subj_id"].cast(pa.string()),
                pcc.utf8_lower(t["pred"].cast(pa.string())),
                t["obj_id"].cast(pa.string()), "\x00")
            return pa.Table.from_arrays(
                [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                 else k,
                 t["subj_id"].cast(pa.string()).combine_chunks(),
                 t["pred"].cast(pa.string()).combine_chunks(),
                 t["obj_id"].cast(pa.string()).combine_chunks()],
                names=["tkey", "subj_id", "pred", "obj_id"])

        return ds.map_batches(fn, batch_format="pyarrow")

    old_k = keyed(old_edges_ds)
    new_k = keyed(new_edges_ds)
    return {
        "added": new_k.join(old_k, "left_anti", num_partitions,
                            on=("tkey",)).drop_columns(["tkey"]),
        "removed": old_k.join(new_k, "left_anti", num_partitions,
                              on=("tkey",)).drop_columns(["tkey"]),
        "unchanged": new_k.join(old_k, "left_semi", num_partitions,
                                on=("tkey",)).drop_columns(["tkey"]),
    }

def connected_components(edges_ds, num_partitions: int = 64,
                         max_iters: int = 50,
                         local_edge_cutoff: int = 500_000):
    """Connected components over the undirected (subj_id, obj_id) graph.

    Returns a Dataset of (entity_id, component) where ``component`` is the
    lexicographically smallest entity_id in the node's component — the KG
    analogue of "which facts form one connected story" (the reference has
    no batch equivalent; its graph lives in Neo4j where this is a GDS
    call, graph/neo4j_client.py).

    Distributed hash-min label propagation: labels live in a node-grain
    Dataset (NEVER on the driver) and each round is exactly two bucketed
    ``groupby(bucket).map_groups`` shuffles — (1) co-locate each node's
    label with its adjacency rows and emit the label to every neighbor,
    (2) co-locate each node's incoming messages with its old label and
    take the min, flagging changes. O(diameter) rounds, small for web-KG
    graphs with hub entities. No ``Dataset.join`` in the loop: iterated
    join operators accumulate per-join shuffle actor pools and starve the
    streaming executor, while bucketed groupbys reuse the one pattern the
    rest of the engine runs (queries.py ``_bucketed_by_key``). The
    adjacency is materialized once (both directions); the node-grain
    label table is re-materialized per round (the algorithm's bounded
    state — one row per node, distributed). Graphs under
    ``local_edge_cutoff`` edges short-circuit to an in-process union-find
    (same output; the cutoff mirrors ``ppr``'s bounded local path).
    """
    import ray.data as rd

    from ..functions.unionfind import UnionFind

    # materialize ONCE before counting: count() on the lazy lineage would
    # execute the whole upstream pipeline, and the local/distributed paths
    # below would then re-execute it (the waste class commit 2e4121e
    # removed from partition auto-sizing)
    pairs = edges_ds.select_columns(["subj_id", "obj_id"]).materialize()

    def undirected(t: pa.Table) -> pa.Table:
        a = t["subj_id"].cast(pa.string()).combine_chunks()
        b = t["obj_id"].cast(pa.string()).combine_chunks()
        node = pa.concat_arrays([a, b])
        nbr = pa.concat_arrays([b, a])
        out = pa.table({"node": node, "nbr": nbr})
        # batch-local dedup (exact dedup happens implicitly in the min
        # aggregates — duplicate messages cannot change a min)
        return out.group_by(["node", "nbr"]).aggregate([]).rename_columns(
            ["node", "nbr"])

    n_edges = pairs.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "entity_id": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))

    if n_edges <= local_edge_cutoff:
        tab = pairs.take_all()
        uf = UnionFind()
        for r in tab:
            uf.union(str(r["subj_id"]), str(r["obj_id"]))
        nodes = sorted(uf.parent)
        comp_min: dict = {}
        for nd in nodes:
            root = uf.find(nd)
            if root not in comp_min or nd < comp_min[root]:
                comp_min[root] = nd
        return rd.from_arrow(pa.table({
            "entity_id": pa.array(nodes, pa.string()),
            "component": pa.array([comp_min[uf.find(nd)] for nd in nodes],
                                  pa.string())}))

    def _bucket_np(values: pd.Series) -> np.ndarray:
        h = pd.util.hash_array(values.to_numpy(dtype=object),
                               categorize=False)
        return (h % np.uint64(num_partitions)).astype(np.int32)

    # one shared schema for the union: (node, nbr, label, bucket) — adj
    # rows carry null label, label rows carry null nbr
    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": df["node"].astype(object),
            "nbr": df["nbr"].astype(object),
            "label": pd.Series([None] * len(df), dtype=object),
        })
        out["bucket"] = _bucket_np(out["node"])
        return out

    adj = (pairs.map_batches(undirected, batch_format="pyarrow")
           .map_batches(with_bucket, batch_format="pandas")
           .materialize())

    # round 0: label(node) = min(node, min neighbor) — one reduce over
    # the adjacency, already bucketed by node
    def init_label(g: pd.DataFrame) -> pd.DataFrame:
        lab = np.minimum(g["node"], g["nbr"])
        out = (pd.DataFrame({"node": g["node"], "label": lab})
               .groupby("node", as_index=False)["label"].min())
        out["bucket"] = _bucket_np(out["node"])
        out["changed"] = np.int32(1)
        return out

    labels = (adj.groupby("bucket").map_groups(init_label,
                                               batch_format="pandas")
              .materialize())

    for _ in range(max_iters):
        # stage 1: co-locate each node's label row with its adjacency
        # rows (same bucket by construction) and emit the label to every
        # neighbor, plus the node's own old-label record
        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["nbr"].isna()][["node", "label"]]
            ar = g[g["nbr"].notna()][["node", "nbr"]]
            m = ar.merge(lab, on="node")
            out = pd.DataFrame({
                "node": pd.concat([m["nbr"], lab["node"]],
                                  ignore_index=True),
                "label": pd.concat([m["label"], lab["label"]],
                                   ignore_index=True),
                "is_old": np.concatenate([
                    np.zeros(len(m), dtype=bool),
                    np.ones(len(lab), dtype=bool)]),
            })
            out["bucket"] = _bucket_np(out["node"])
            return out

        def as_label_rows(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": d["node"].astype(object),
                "nbr": pd.Series([None] * len(d), dtype=object),
                "label": d["label"].astype(object),
                "bucket": d["bucket"].to_numpy(),
            })

        mixed = adj.union(
            labels.map_batches(as_label_rows, batch_format="pandas"))
        msgs = mixed.groupby("bucket").map_groups(propagate,
                                                  batch_format="pandas")

        # stage 2: per node take the min of old label + incoming messages
        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            newl = g.groupby("node", as_index=False)["label"].min()
            oldl = g[g["is_old"]].set_index("node")["label"]
            out = newl
            out["changed"] = (
                out["label"].to_numpy()
                != oldl.reindex(out["node"]).to_numpy()
            ).astype(np.int32)
            out["bucket"] = _bucket_np(out["node"])
            return out[["node", "label", "bucket", "changed"]]

        labels = (msgs.groupby("bucket")
                  .map_groups(reduce_min, batch_format="pandas")
                  .materialize())
        # union+groupby emits ~(input blocks) output blocks, so labels
        # would gain ~adj.num_blocks() tiny blocks EVERY round (linear
        # block growth → quadratic total scheduling cost over the loop,
        # the same failure class graph_analytics.k_core caps). Coalesce
        # back to the bucket grain whenever the round's output exceeds it.
        if labels.num_blocks() > num_partitions:
            labels = labels.repartition(num_partitions).materialize()
        if labels.sum(on="changed") == 0:
            break

    # rename via an Arrow projection (rename_columns can't project the
    # pandas-format blocks map_groups emits)
    return labels.map_batches(
        lambda t: pa.table({
            "entity_id": t["node"].cast(pa.string()),
            "component": t["label"].cast(pa.string())}),
        batch_format="pyarrow")


def _pagerank_dataset_resident(pairs, deg_ds, *, damping: float,
                               max_iters: int, tol: float,
                               as_dataset: bool = False):
    """Directed PageRank above DRIVER_NODE_CUTOFF: dataset-resident
    state, dangling mass redistributed via a per-iteration scalar
    aggregate — the driver never holds the node vector."""
    n_nodes = deg_ds.count()
    inv_n = 1.0 / n_nodes

    def init_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["node"],
            "deg": pc.cast(t["outdeg"], pa.float64()),
            # uniform teleport folds in via uniform_teleport= below, so
            # the tele COLUMN is zero; score starts uniform
            "tele": pa.array(np.zeros(n)),
            "score": pa.array(np.full(n, inv_n)),
        })

    state = deg_ds.map_batches(init_state, batch_format="pyarrow")

    edges2 = pairs.map_batches(
        lambda t: pa.table({"src": t["subj_id"].cast(pa.string()),
                            "dst": t["obj_id"].cast(pa.string())}),
        batch_format="pyarrow").materialize()
    final = _power_iteration_dataset(
        edges2, state, damping=damping, max_iters=max_iters, tol=tol,
        normalize=False, uniform_teleport=inv_n,
        redistribute_dangling=True)
    scored = _round_score_dataset(final, drop_zero=False)
    if as_dataset:
        # billion-node return: the full node-grain result never lands
        # on the driver — distributed sort keeps the ordering contract
        return scored.sort(["score", "entity_id"],
                           descending=[True, False])
    out = scored.to_pandas()
    return out.sort_values(["score", "entity_id"],
                           ascending=[False, True], ignore_index=True)


def pagerank(edges_ds, damping: float = 0.85, max_iters: int = 30,
             tol: float = 1e-9,
             local_edge_cutoff: int = 500_000,
             driver_node_cutoff: int = DRIVER_NODE_CUTOFF,
             as_dataset: bool = False):
    """Global DIRECTED PageRank over (subj_id -> obj_id) edges.

    Complements ``ppr`` (seeded, undirected): uniform teleport over ALL
    nodes, directed out-degree normalization, dangling mass (nodes with
    no out-edges) redistributed uniformly — the textbook power iteration.
    Returns (entity_id, score) sorted desc, scores rounded to 8 and
    summing to ~1.

    Same scale shape as ``ppr``: node ids map to dense ints once
    (broadcast key array + out-degree vector via one ``ray.put``); per
    iteration only the float score vector is re-broadcast and the shuffle
    carries compact (int node index, partial sum) rows with a map-side
    combine. Driver state is O(#nodes) floats — for graphs whose node
    vector exceeds driver memory, shard the broadcast by entity hash (the
    documented ppr caveat applies verbatim).

    ``as_dataset=True`` returns (entity_id, score) as a node-grain
    ``ray.data.Dataset`` (distributed sort, same ordering) so the full
    result never lands on the driver — pair it with the dataset-resident
    iteration for the billion-node path.
    """
    import ray
    from ray.data.aggregate import Sum

    pairs = edges_ds.select_columns(["subj_id", "obj_id"]).materialize()

    local = pairs.count() <= local_edge_cutoff
    if local:
        # bounded graph: node universe + out-degree straight in numpy —
        # a distributed degree aggregate would cost a full shuffle just
        # to feed an in-process iteration
        etab = pairs.to_pandas()
        if etab.empty:
            return _maybe_dataset(
                pd.DataFrame({"entity_id": [], "score": []}), as_dataset)
        names_sorted = sorted(set(etab["subj_id"]) | set(etab["obj_id"]))
        node_ix_of = {n: i for i, n in enumerate(names_sorted)}
        n_nodes = len(names_sorted)
        s_ix = etab["subj_id"].map(node_ix_of).to_numpy()
        outdeg = np.bincount(s_ix, minlength=n_nodes).astype(np.float64)
    else:
        # node universe + out-degree (directed: subj only), map-side
        # combined before the one wide aggregate
        def endpoints(t: pa.Table) -> pa.Table:
            a = t["subj_id"].cast(pa.string()).combine_chunks()
            b = t["obj_id"].cast(pa.string()).combine_chunks()
            node = pa.concat_arrays([a, b])
            out1 = np.zeros(len(node), dtype=np.int64)
            out1[:len(a)] = 1
            tbl = pa.table({"node": node, "out1": pa.array(out1)})
            return tbl.group_by("node").aggregate([("out1", "sum")]) \
                .rename_columns(["node", "out1"])

        deg_ds = (pairs.map_batches(endpoints, batch_format="pyarrow")
                  .groupby("node")
                  .aggregate(Sum("out1", alias_name="outdeg"))
                  .materialize())
        node_count = deg_ds.count()
        if node_count == 0:
            return _maybe_dataset(
                pd.DataFrame({"entity_id": [], "score": []}), as_dataset)
        if node_count > driver_node_cutoff:
            return _pagerank_dataset_resident(
                pairs, deg_ds, damping=damping, max_iters=max_iters,
                tol=tol, as_dataset=as_dataset)
        deg_df = deg_ds.to_pandas()
        names_sorted = sorted(deg_df["node"])
        node_ix_of = {n: i for i, n in enumerate(names_sorted)}
        n_nodes = len(names_sorted)
        outdeg = np.zeros(n_nodes, dtype=np.float64)
        outdeg[deg_df["node"].map(node_ix_of).to_numpy()] = \
            deg_df["outdeg"].to_numpy().astype(np.float64)

    dangling = outdeg == 0
    score = np.full(n_nodes, 1.0 / n_nodes)

    if local:
        o_ix = etab["obj_id"].map(node_ix_of).to_numpy()
        for _ in range(max_iters):
            contrib = np.zeros(n_nodes)
            np.add.at(contrib, o_ix, score[s_ix] / outdeg[s_ix])
            dmass = float(score[dangling].sum())
            new = ((1 - damping) / n_nodes
                   + damping * (contrib + dmass / n_nodes))
            delta = float(np.abs(new - score).sum())
            score = new
            if delta < tol:
                break
    else:
        key_arr = pa.array(names_sorted, pa.string())
        static_ref = ray.put((key_arr, outdeg))
        for _ in range(max_iters):
            scores_ref = ray.put(score)

            def contribute(t: pa.Table, _sref=scores_ref) -> pa.Table:
                import ray as _ray

                keys, deg = _ray.get(static_ref)
                sc = _ray.get(_sref)
                six = pc.index_in(t["subj_id"], value_set=keys).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                oix = pc.index_in(t["obj_id"], value_set=keys).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                contrib = sc[six] / deg[six]
                uniq, inv = np.unique(oix, return_inverse=True)
                summed = np.zeros(len(uniq))
                np.add.at(summed, inv, contrib)
                return pa.Table.from_pydict({"node_ix": uniq,
                                             "contrib": summed})

            agg = (pairs.map_batches(contribute, batch_format="pyarrow")
                   .groupby("node_ix")
                   .aggregate(Sum("contrib", alias_name="s"))
                   .to_pandas())
            contrib = np.zeros(n_nodes)
            contrib[agg["node_ix"].to_numpy()] = agg["s"].to_numpy()
            dmass = float(score[dangling].sum())
            new = ((1 - damping) / n_nodes
                   + damping * (contrib + dmass / n_nodes))
            delta = float(np.abs(new - score).sum())
            score = new
            if delta < tol:
                break

    out = pd.DataFrame({
        "entity_id": names_sorted,
        "score": round_half_away(score, 8),
    })
    out = out.sort_values(["score", "entity_id"],
                          ascending=[False, True], ignore_index=True)
    return _maybe_dataset(out, as_dataset)
