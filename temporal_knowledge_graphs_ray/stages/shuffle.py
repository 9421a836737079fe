"""Deterministic global shuffle for training-data export (scale
addition — the reference has no shuffle surface; training pipelines
need one before sharding a curated corpus into training files).

``ray.data.Dataset.random_shuffle`` is an all-to-all whose output
order depends on the run (seeded variants still depend on block
layout) and whose failure re-runs the whole exchange. This operator
instead defines the shuffled order as a PURE FUNCTION of the rows:

    global order  =  ORDER BY md5(f"{seed}|{key}"), key

md5 is the one hash this engine and DuckDB compute byte-identically
(see stages/sampling.py — same contract), so the shuffle has an exact
SQL oracle, and re-runs / retries / different block layouts reproduce
the identical permutation. Disjoint seeds give independent
permutations (epoch reshuffles are just ``seed=epoch``).

Dataflow: one streaming pass computes the md5 rank and a shard id
from the rank's PREFIX RANGE (shard = md5[:4] scaled to num_shards).
Because shards are contiguous ranges of the md5 space, shard-major /
rank-minor order IS the global order — so one bucketed
``groupby(shard).map_groups`` sort finishes the job with no global
sort and no counting pre-pass. Each group task emits its shard's rows
with a within-shard ``pos``; consumers read rows in ``(shard, pos)``
order (the written layout: one file per shard, internally ordered).

Scale notes (100 TB): shuffle volume is the one unavoidable
all-to-all (every row moves once); md5 uniformity balances shards, so
set ``num_shards`` to the target training-file count (each shard must
fit a group task, e.g. 1–4 GB). The permutation is content-defined,
so a failed shard file is recomputed alone by filtering the corpus to
that shard id and re-sorting — no other shard is touched.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .sampling import _md5_rank

_SHARD_COL = "shard"
_POS_COL = "pos"
_RANK_COL = "_shuf_md5"


def _ranked(ds, key_col: str, seed, num_shards: int):
    if not 1 <= num_shards <= 65536:
        raise ValueError("num_shards must be in [1, 65536] (shard ids "
                         "derive from the 16-bit md5 prefix)")
    taken = {_SHARD_COL, _POS_COL, _RANK_COL} & set(ds.schema().names)
    if taken:
        raise ValueError(f"input already has reserved shuffle "
                         f"column(s) {sorted(taken)}")

    def add_rank(t: pa.Table) -> pa.Table:
        h = _md5_rank(t[key_col].to_pylist(), seed)
        shard = [int(x[:4], 16) * num_shards >> 16 for x in h]
        t = t.append_column(_RANK_COL, pa.array(h, pa.string()))
        return t.append_column(_SHARD_COL, pa.array(shard, pa.int32()))

    return ds.map_batches(add_rank, batch_format="pyarrow")


def deterministic_shuffle(ds, key_col: str, seed: int | str = 0,
                          num_shards: int = 64):
    """Shuffle ``ds`` into the md5(seed|key) order. Returns a Dataset
    with two added columns: ``shard`` (int32) and ``pos`` (int64,
    0-based within shard); reading rows in (shard, pos) order yields
    exactly DuckDB's ``ORDER BY md5(concat(seed, '|', key)), key``."""

    def sort_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([_RANK_COL, key_col], kind="mergesort",
                          ignore_index=True)
        g[_POS_COL] = range(len(g))
        return g.drop(columns=[_RANK_COL])

    return (_ranked(ds, key_col, seed, num_shards)
            .groupby(_SHARD_COL)
            .map_groups(sort_shard, batch_format="pandas"))


def write_shuffled_shards(ds, out_dir: str, key_col: str, seed: int | str = 0,
                          num_shards: int = 64) -> None:
    """Materialize the shuffle as ``out_dir/shard=K/`` Parquet, one
    internally-ordered file per shard (the training-file layout; a
    reader streaming shard dirs in id order and rows in ``pos`` order
    replays the global permutation)."""
    from .blocks import coalesce_blocks

    shuffled = deterministic_shuffle(ds, key_col, seed=seed,
                                     num_shards=num_shards)
    coalesce_blocks(shuffled).write_parquet(
        out_dir, partition_cols=[_SHARD_COL])


def read_shuffled(out_dir: str):
    """Read a ``write_shuffled_shards`` directory back in the global
    shuffled order (small/medium outputs: one bounded sort; at scale,
    consume shard-by-shard instead)."""
    import ray.data as rd

    return rd.read_parquet(out_dir).sort([_SHARD_COL, _POS_COL])
