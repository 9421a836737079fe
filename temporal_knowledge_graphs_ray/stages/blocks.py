"""Block-shape helpers for Parquet-writing Ray Data pipelines."""

from __future__ import annotations


def coalesce_blocks(ds):
    """One Arrow chunk per block before a (hive-partitioned) write.

    Ray's Parquet sink flushes a row group per (record batch x partition
    value), so a block assembled from small task batches (e.g. 64-row NER
    batches) scatters into few-row row groups across every partition dir
    (measured on the KG pipeline: 309 row groups in a 1268-row file) —
    pathological footer metadata, dead compression (2.6 GB -> 333 MB for
    the same chunk_ents table), and a write that starves behind foreground
    phases. Combining chunks first costs one distributed memcpy and
    collapses each written file to a single row group.

    Use before every ``write_parquet`` whose upstream produced small
    batches; harmless (one pass-through copy) when blocks are already
    single-chunk.
    """
    return ds.map_batches(lambda t: t.combine_chunks(),
                          batch_format="pyarrow", batch_size=None)
