"""Benchmark decontamination (scale addition — standard training-data
hygiene, cf. the GPT-3 appendix C / Dolma decontamination recipes: drop
or flag corpus documents sharing any word n-gram with an evaluation set).

Semantics (shared with the test oracle): a document is contaminated iff
any of its distinct word n-grams (lower-cased ``[a-z0-9]+`` tokens,
``functions.hashing.word_shingles``; documents shorter than n words
contribute their single all-words shingle) also occurs in any benchmark
text. Reported per doc: distinct n-gram count, distinct overlapping
count, contaminated flag.

Two physical plans, identical output:

- ``mode="broadcast"`` (default): the benchmark's distinct shingle-hash
  set — eval benchmarks are MBs, corpora are TBs — is hashed to a SORTED
  uint64 array, ``ray.put`` once, and every corpus batch runs a
  vectorized ``searchsorted`` membership probe. No shuffle at all; the
  corpus streams through one map stage.
- ``mode="join"``: for benchmark sets too big to broadcast (e.g.
  decontaminating against another corpus) — corpus (doc, hash) shingle
  rows inner-join the benchmark hash set via Ray's distributed hash
  join, then a per-doc count aggregate; docs with zero hits are restored
  by a left join against the per-doc shingle counts.

Collision note: overlap is tested on 64-bit shingle hashes, not strings
(2^-64 per-pair false-positive rate — the standard trade at corpus
scale; the oracle test pins hash-vs-string equality on real data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_vec, word_shingles

_SEED = 0xDEC0  # decorrelate shingle hashes from other hash64_vec users


def _doc_shingle_hashes(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch texts -> (doc_index, shingle_hash) pairs, distinct per doc.

    One vectorized hash call for the whole batch, then a pandas
    drop_duplicates — no per-row hashing loop.
    """
    idx: list[int] = []
    grams: list[str] = []
    for i, t in enumerate(texts):
        g = word_shingles(t, n) if t else []
        idx.extend([i] * len(g))
        grams.extend(g)
    if not grams:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    df = pd.DataFrame({
        "i": np.asarray(idx, dtype=np.int64),
        "h": hash64_vec(grams, seed=_SEED),
    }).drop_duplicates()
    return df["i"].to_numpy(), df["h"].to_numpy()


def benchmark_hashes(bench_ds, text_col: str = "text",
                     n: int = 13) -> np.ndarray:
    """Distinct sorted shingle-hash array of the benchmark set.

    Distinct-per-batch worker-side, union + final unique on the driver —
    driver state is the benchmark's distinct shingle set only (bounded:
    this is the SMALL side by contract; use mode="join" otherwise).
    """
    def to_hashes(batch: pa.Table) -> pa.Table:
        _, h = _doc_shingle_hashes(batch[text_col].to_pylist(), n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = [b["h"].to_numpy(zero_copy_only=False)
             for b in bench_ds.map_batches(
                 to_hashes, batch_format="pyarrow",
                 batch_size=2048).iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(corpus_ds, bench_ds, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  mode: str = "broadcast", num_partitions: int = 32):
    """Flag corpus docs sharing any word n-gram with the benchmark set.

    Returns a Dataset with (id_col, n_ngrams, n_contaminated,
    contaminated) — one row per corpus doc, including zero-shingle docs.
    """
    if mode == "join":
        return _decontaminate_join(corpus_ds, bench_ds, n, text_col,
                                   id_col, num_partitions)
    import ray

    bench_ref = ray.put(benchmark_hashes(bench_ds, text_col, n))

    def probe(batch: pa.Table, _ref=bench_ref) -> pa.Table:
        import ray as _ray
        bench = _ray.get(_ref)  # zero-copy plasma read, once per task
        texts = batch[text_col].to_pylist()
        di, h = _doc_shingle_hashes(texts, n)
        n_ngrams = np.zeros(len(texts), dtype=np.int64)
        n_cont = np.zeros(len(texts), dtype=np.int64)
        if len(di):
            np.add.at(n_ngrams, di, 1)
            if len(bench):
                pos = np.searchsorted(bench, h)
                pos[pos == len(bench)] = 0
                hit = bench[pos] == h
                np.add.at(n_cont, di[hit], 1)
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.array(n_ngrams, pa.int64()),
             pa.array(n_cont, pa.int64()),
             pa.array(n_cont > 0, pa.bool_())],
            names=[id_col, "n_ngrams", "n_contaminated", "contaminated"],
        )

    return corpus_ds.map_batches(probe, batch_format="pyarrow",
                                 batch_size=1024)


def _decontaminate_join(corpus_ds, bench_ds, n: int, text_col: str,
                        id_col: str, num_partitions: int):
    """Distributed-join plan: same output as broadcast mode, nothing on
    the driver. corpus shingles ⋈ bench hashes (inner, pre-deduped both
    sides so the hit count is the DISTINCT overlap), then hit counts
    rejoin the per-doc shingle counts (left outer) to restore zero-hit
    docs."""
    import ray

    # the hash join spins up num_partitions aggregator actors: more than
    # the cluster's CPUs deadlocks resource scheduling (same sizing rule
    # as pipelines/kg.py's distributed rewrite)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(num_partitions, ncpu // 2))

    def corpus_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        di, h = _doc_shingle_hashes(texts, n)
        return pa.table({
            id_col: pa.array([ids[i] for i in di]),
            # int64 view: Ray's hash join keys on int64 more portably
            "h": pa.array(h.astype(np.int64), pa.int64()),
        })

    def bench_rows(batch: pa.Table) -> pa.Table:
        _, h = _doc_shingle_hashes(batch[text_col].to_pylist(), n)
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64),
                                       pa.int64())})

    shingles = corpus_ds.map_batches(corpus_rows, batch_format="pyarrow",
                                     batch_size=1024)
    # bench side distinct via a native grouped count (distributed; the
    # Dataset.unique() API would collect the values onto the driver)
    bench = (bench_ds.map_batches(bench_rows, batch_format="pyarrow",
                                  batch_size=2048)
             .groupby("h").count().select_columns(["h"]))

    hits = shingles.join(bench, "inner", num_partitions, on=("h",))

    # native grouped counts (map-side combined) instead of per-key
    # map_groups: one row per doc either way, no Python group loop
    hit_counts = (hits.groupby(id_col).count()
                  .rename_columns({"count()": "n_contaminated"}))
    per_doc = (shingles.groupby(id_col).count()
               .rename_columns({"count()": "n_ngrams"}))
    # restore zero-shingle docs (empty text) with n_ngrams = 0
    all_docs = corpus_ds.select_columns([id_col])
    per_doc = all_docs.join(per_doc, "left_outer", num_partitions,
                            on=(id_col,))
    out = per_doc.join(hit_counts, "left_outer", num_partitions,
                       on=(id_col,))

    def finalize(t: pa.Table) -> pa.Table:
        ng = t["n_ngrams"].to_pandas().fillna(0).astype("int64")
        nc = t["n_contaminated"].to_pandas().fillna(0).astype("int64")
        return pa.Table.from_arrays(
            [t[id_col], pa.array(ng, pa.int64()), pa.array(nc, pa.int64()),
             pa.array(nc > 0, pa.bool_())],
            names=[id_col, "n_ngrams", "n_contaminated", "contaminated"],
        )

    return out.map_batches(finalize, batch_format="pyarrow")
