"""BM25 ranking over the bucketed inverted index (retrieval scale path).

The reference ranks keyword matches with Neo4j's Lucene full-text
scoring (retrieval/graph_search.py:557-597 — Lucene's BM25 since
Lucene 6). ``FulltextIndex`` (stages/fulltext.py) covers the boolean
"how many query terms match" fallback; THIS is the ranked analogue: a
persisted posting list with term frequencies and Lucene-style
denormalized document lengths, scored with the standard Okapi/Lucene
BM25 formula

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Dataflow (everything prunes to the query terms' hash buckets — a query
never scans the corpus):

1. build: one ``map_batches`` pass explodes chunks into distinct
   (term, id, tf, dl) postings, bucketed by term hash; N and avgdl are
   two scalars kept in the index meta.
2. df pass: the pruned posting scan emits per-batch partial df counts;
   the per-QUERY-term df vector (<= |query| values) merges on the
   driver.
3. score pass: a second pruned scan computes each posting's BM25
   contribution vectorized against the broadcast {term: idf} map,
   per-id partials combine map-side, a bucketed groupby sums them, and
   the house partial top-k bounds the final sort.

Exact oracle: tokenization is ``[a-z0-9]+`` on the lowercased text —
the same extraction DuckDB's ``regexp_extract_all`` computes — and the
score is a deterministic arithmetic expression over integer tf/df/dl,
so a DuckDB CTE reproduces scores bit-identically up to float-sum
order (tests round to 6 decimals, the house float-determinism rule).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_vec

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _bucket_of(terms, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(np.asarray(list(terms), dtype=object),
                               categorize=False)
            % num_buckets).astype("int32")


class Bm25Index:
    """Bucketed (term, id, tf, dl) postings + (N, avgdl) scalars."""

    def __init__(self, chunks_ds=None, text_col: str = "text",
                 id_col: str = "chunk_id", num_buckets: int = 64,
                 k1: float = 1.2, b: float = 0.75):
        self.id_col = id_col
        self.num_buckets = num_buckets
        self.k1 = float(k1)
        self.b = float(b)
        if chunks_ds is None:
            self.postings = None
            self.n_docs = 0
            self.avgdl = 0.0
            return

        def explode(t: pa.Table) -> pa.Table:
            from collections import Counter

            terms: list[str] = []
            ids: list = []
            tfs: list[int] = []
            dls: list[int] = []
            # one NULL-term sentinel row per DOC carries (1, dl) so
            # N/avgdl come from a tiny filtered aggregate of THIS table
            # — no second full scan of the corpus text. Lookups filter
            # the sentinels out (is_in never matches NULL).
            for cid, text in zip(t[id_col].to_pylist(),
                                 t[text_col].to_pylist()):
                toks = _TOKEN_RE.findall((text or "").lower())
                dl = len(toks)
                terms.append(None)
                ids.append(cid)
                tfs.append(0)
                dls.append(dl)
                for term, tf in Counter(toks).items():
                    terms.append(term)
                    ids.append(cid)
                    tfs.append(tf)
                    dls.append(dl)
            has = [x for x in terms if x is not None]
            buckets = np.full(len(terms), -1, dtype="int32")
            if has:
                buckets[[i for i, x in enumerate(terms)
                         if x is not None]] = _bucket_of(
                    has, num_buckets)
            return pa.Table.from_arrays(
                [pa.array(terms, pa.string()),
                 pa.array(ids, t.schema.field(id_col).type),
                 pa.array(tfs, pa.int64()),
                 pa.array(dls, pa.int64()),
                 pa.array(buckets)],
                names=["term", id_col, "tf", "dl", "bucket"])

        self.postings = (
            chunks_ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow",
                         batch_size=1024)
            .materialize())

        def stat_partial(t: pa.Table) -> pa.Table:
            s = t.filter(pc.is_null(t["term"]))
            return pa.table({
                "n": pa.array([s.num_rows], pa.int64()),
                "dl": pa.array([pc.sum(s["dl"]).as_py() or 0,
                                ], pa.int64())})

        stats = (self.postings
                 .map_batches(stat_partial, batch_format="pyarrow")
                 .to_pandas())
        self.n_docs = int(stats["n"].sum())
        total = int(stats["dl"].sum())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    # ------------------------------------------------------------ persist
    def save(self, path: str) -> None:
        import shutil as _sh

        from .blocks import coalesce_blocks

        _sh.rmtree(path, ignore_errors=True)
        coalesce_blocks(self.postings).write_parquet(
            path, partition_cols=["bucket"])
        with open(os.path.join(path, "_index_meta.json"), "w") as f:
            json.dump({"num_buckets": self.num_buckets,
                       "id_col": self.id_col, "k1": self.k1,
                       "b": self.b, "n_docs": self.n_docs,
                       "avgdl": self.avgdl}, f)

    @classmethod
    def load(cls, path: str) -> "Bm25Index":
        import ray.data as rd

        with open(os.path.join(path, "_index_meta.json")) as f:
            meta = json.load(f)
        idx = cls(None, id_col=meta["id_col"],
                  num_buckets=meta["num_buckets"], k1=meta["k1"],
                  b=meta["b"])
        idx.n_docs = meta["n_docs"]
        idx.avgdl = meta["avgdl"]
        idx.postings = rd.read_parquet(path)
        return idx

    # -------------------------------------------------------------- query
    def _pruned(self, want: list[str]):
        want_arr = pa.array(want, pa.string())
        want_buckets = pa.array(
            sorted(set(_bucket_of(want, self.num_buckets).tolist())),
            pa.int32())

        def lookup(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["bucket"].cast(pa.int32()),
                                  value_set=want_buckets))
            return t.filter(pc.is_in(t["term"], value_set=want_arr))

        return self.postings.map_batches(lookup, batch_format="pyarrow")

    def score(self, query_terms: list[str], k: int = 10,
              num_partitions: int = 64) -> pd.DataFrame:
        """Top-k (id, score) by BM25, score-desc / id-asc tiebreak."""
        from .topk import topk_rows

        want = sorted({w for term in query_terms
                       for w in _TOKEN_RE.findall(term.lower())})
        empty = pd.DataFrame({self.id_col: pd.Series([], dtype="object"),
                              "score": pd.Series([], dtype="float64")})
        if not want or not self.n_docs:
            return empty
        matched = self._pruned(want)

        # ---- df pass: per-term partials -> tiny driver merge ----
        def df_partial(t: pa.Table) -> pa.Table:
            u, c = np.unique(t["term"].to_numpy(zero_copy_only=False),
                             return_counts=True)
            return pa.table({"term": pa.array(u.astype(object),
                                              pa.string()),
                             "df": pa.array(c.astype(np.int64))})

        dfs: dict[str, int] = {}
        for bt in matched.map_batches(
                df_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for term, df in zip(bt["term"].to_pylist(),
                                bt["df"].to_pylist()):
                dfs[term] = dfs.get(term, 0) + df
        if not dfs:
            return empty
        n = float(self.n_docs)
        idf = {t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
               for t, df in dfs.items()}

        import ray

        idf_ref = ray.put(idf)
        k1, b, avgdl = self.k1, self.b, (self.avgdl or 1.0)
        id_col = self.id_col

        # ---- score pass: vectorized posting contributions, map-side
        # per-id combine, bucketed sum ----
        def score_partial(t: pa.Table) -> pa.Table:
            import ray as _ray

            w = _ray.get(idf_ref)
            tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
            iv = (t["term"].to_pandas().map(w).fillna(0.0)
                  .to_numpy(dtype=np.float64))
            s = iv * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            ids = t[id_col]
            # combine within the batch (deterministic first-seen order)
            df_ = pd.DataFrame({"id": ids.to_pandas(), "s": s})
            g = df_.groupby("id", sort=True)["s"].sum().reset_index()
            out = pa.table({
                id_col: pa.array(g["id"], ids.type),
                "score": pa.array(g["s"].to_numpy(), pa.float64())})
            bkt = (hash64_vec(g["id"].astype(str).to_list())
                   % np.uint64(num_partitions)).astype(np.int32)
            return out.append_column("pbucket", pa.array(bkt))

        def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # sort partials so the float summation order is a pure
            # function of the values, not of block arrival order
            g = g.sort_values([id_col, "score"])
            out = (g.groupby(id_col, sort=True)["score"].sum()
                   .reset_index())
            return out[[id_col, "score"]]

        scored = (matched.map_batches(score_partial,
                                      batch_format="pyarrow")
                  .groupby("pbucket")
                  .map_groups(sum_bucket, batch_format="pandas"))
        top = topk_rows(scored, keys=["score", id_col],
                        descending=[True, False], k=k).to_pandas()
        return top.reset_index(drop=True)

    def score_many(self, queries: list[str], k: int = 10,
                   num_partitions: int = 64) -> pd.DataFrame:
        """Per-query top-k for a BATCH of queries in ONE pruned scan —
        the serving-at-scale path (the AnnIndex.topk_many analogue).
        Returns (qi, id, score) rows, <= k per query, ordered
        (qi asc, score desc, id asc); queries with no matching terms
        contribute no rows.

        Dataflow: the scan prunes to the UNION of all queries' term
        buckets; a broadcast (term -> query indices) table fans each
        posting's contribution out to its queries inside the batch
        (vectorized pandas merge), partials combine map-side per
        (qi, id), one bucketed groupby sums, and the per-GROUP partial
        top-k bounds the final selection at k x queries x blocks."""
        import ray

        from .topk import group_topk_rows

        toks = [sorted(set(_TOKEN_RE.findall(q.lower())))
                for q in queries]
        want = sorted({t for ts in toks for t in ts})
        empty = pd.DataFrame({
            "qi": pd.Series([], dtype="int64"),
            self.id_col: pd.Series([], dtype="object"),
            "score": pd.Series([], dtype="float64")})
        if not want or not self.n_docs:
            return empty
        matched = self._pruned(want)

        def df_partial(t: pa.Table) -> pa.Table:
            u, c = np.unique(t["term"].to_numpy(zero_copy_only=False),
                             return_counts=True)
            return pa.table({"term": pa.array(u.astype(object),
                                              pa.string()),
                             "df": pa.array(c.astype(np.int64))})

        dfs: dict[str, int] = {}
        for bt in matched.map_batches(
                df_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for term, df in zip(bt["term"].to_pylist(),
                                bt["df"].to_pylist()):
                dfs[term] = dfs.get(term, 0) + df
        if not dfs:
            return empty
        n = float(self.n_docs)
        idf = {t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
               for t, df in dfs.items()}
        # broadcast (term, qi, idf) fan-out table
        tq = pd.DataFrame(
            [(t, qi, idf.get(t, 0.0))
             for qi, ts in enumerate(toks) for t in ts if t in idf],
            columns=["term", "qi", "idf"])
        tq_ref = ray.put(tq)
        k1, b, avgdl = self.k1, self.b, (self.avgdl or 1.0)
        id_col = self.id_col

        def score_partial(t: pa.Table) -> pa.Table:
            import ray as _ray

            fan = _ray.get(tq_ref)
            tf = t["tf"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            dl = t["dl"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            base = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            df_ = pd.DataFrame({"term": t["term"].to_pandas(),
                                "id": t[id_col].to_pandas(),
                                "base": base})
            m = df_.merge(fan, on="term", how="inner")
            m["s"] = m["base"] * m["idf"]
            g = (m.groupby(["qi", "id"], sort=True)["s"].sum()
                 .reset_index())
            out = pa.table({
                "qi": pa.array(g["qi"].to_numpy(np.int64)),
                id_col: pa.array(g["id"], t[id_col].type),
                "score": pa.array(g["s"].to_numpy(), pa.float64())})
            key = [f"{q}|{i}" for q, i in zip(g["qi"], g["id"])]
            bkt = (hash64_vec(key) % np.uint64(num_partitions)) \
                .astype(np.int32)
            return out.append_column("pbucket", pa.array(bkt))

        def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["qi", id_col, "score"])
            out = (g.groupby(["qi", id_col], sort=True)["score"].sum()
                   .reset_index())
            return out[["qi", id_col, "score"]]

        scored = (matched.map_batches(score_partial,
                                      batch_format="pyarrow")
                  .groupby("pbucket")
                  .map_groups(sum_bucket, batch_format="pandas"))
        top = group_topk_rows(scored, "qi", ["score", id_col],
                              [True, False], k).to_pandas()
        return (top.sort_values(["qi", "score", id_col],
                                ascending=[True, False, True],
                                ignore_index=True)
                [["qi", id_col, "score"]])
