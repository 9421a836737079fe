"""Inverted-index full-text backend (Q6 scale path).

The reference's fallback search queries a Lucene-style full-text index
inside Neo4j (/root/reference — retrieval/graph_search.py:557-597). The
regex scan in pipelines/graph.py:fulltext_search reproduces the scoring
for small corpora; THIS is the scale backend: a word-level inverted
index built ONCE over the chunks table (one map_batches pass to distinct
(term, chunk_id) postings, bucketed by term hash), persisted to
partitioned Parquet, and queried by pruned posting lookups — a query
touches only its terms' buckets, never the corpus.

Note on semantics: like Lucene (and unlike the regex stand-in), matching
is word-level — "acquired" does not match "reacquired". The
tests assert equality with a word-tokenized scan.
"""

from __future__ import annotations

import re

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _bucket_of(terms: list[str], num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(np.asarray(terms, dtype=object),
                               categorize=False)
            % num_buckets).astype("int32")


class FulltextIndex:
    """Distinct (term, chunk_id) postings, bucketed by term hash."""

    def __init__(self, chunks_ds=None, text_col: str = "text",
                 id_col: str = "chunk_id", num_buckets: int = 64):
        self.id_col = id_col
        self.num_buckets = num_buckets
        if chunks_ds is None:
            self.postings = None
            return

        def explode(t: pa.Table) -> pa.Table:
            terms, ids = [], []
            for cid, text in zip(t[id_col].to_pylist(),
                                 t[text_col].to_pylist()):
                if not text:  # null/empty text: nothing to index
                    continue
                for term in set(_TOKEN_RE.findall(text.lower())):
                    terms.append(term)
                    ids.append(cid)
            return pa.Table.from_arrays(
                [pa.array(terms, pa.string()), pa.array(ids, pa.string()),
                 pa.array(_bucket_of(terms, num_buckets) if terms
                          else np.array([], dtype="int32"))],
                names=["term", id_col, "bucket"],
            )

        self.postings = (
            chunks_ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow",
                         batch_size=1024)
            .materialize()
        )

    def save(self, path: str) -> None:
        import json
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)
        # partitioned by term-hash bucket: a query reads only its buckets
        from .blocks import coalesce_blocks

        coalesce_blocks(self.postings).write_parquet(
            path, partition_cols=["bucket"])
        # the bucket layout is addressable only with the num_buckets it
        # was hashed with — persist it so load() cannot silently prune
        # with a different modulus and drop matches
        with open(os.path.join(path, "_index_meta.json"), "w") as f:
            json.dump({"num_buckets": self.num_buckets,
                       "id_col": self.id_col}, f)

    @classmethod
    def load(cls, path: str, id_col: str | None = None,
             num_buckets: int | None = None) -> "FulltextIndex":
        import json

        import ray.data as rd

        meta_path = os.path.join(path, "_index_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        idx = cls(None,
                  id_col=id_col or meta.get("id_col", "chunk_id"),
                  num_buckets=num_buckets or meta.get("num_buckets", 64))
        # _index_meta.json is skipped by the reader (underscore-prefixed
        # files are treated as hidden, like _SUCCESS markers)
        idx.postings = rd.read_parquet(path)
        return idx

    def search(self, query_terms: list[str], k: int = 10) -> pd.DataFrame:
        """Top-k chunks by number of DISTINCT query terms present
        (word-level), chunk_id tiebreak — the reference's fallback
        scoring over an index lookup instead of a corpus scan."""
        import pyarrow.compute as pc

        want = sorted({t.lower() for t in query_terms})
        if not want:
            return pd.DataFrame({self.id_col: [], "n_terms": []})
        want_arr = pa.array(want, pa.string())
        want_buckets = pa.array(sorted(set(
            _bucket_of(want, self.num_buckets).tolist())), pa.int32())

        def lookup(t: pa.Table) -> pa.Table:
            # bucket prune first (partition column -> row-group skip on
            # the Parquet path), then exact term filter
            t = t.filter(pc.is_in(t["bucket"].cast(pa.int32()),
                                  value_set=want_buckets))
            return (t.filter(pc.is_in(t["term"], value_set=want_arr))
                    .select([self.id_col]))

        from ray.data.aggregate import Count

        hits = (
            self.postings.map_batches(lookup, batch_format="pyarrow")
            .groupby(self.id_col).aggregate(Count(alias_name="n_terms"))
            .to_pandas()
        )
        if hits.empty:  # zero matches: typed empty frame
            return pd.DataFrame({self.id_col: pd.Series([], dtype="object"),
                                 "n_terms": pd.Series([], dtype="int64")})
        return (hits.sort_values(["n_terms", self.id_col],
                                 ascending=[False, True],
                                 ignore_index=True).head(k))
