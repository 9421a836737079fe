"""Text-extraction and chunking stages (pages -> text -> chunk rows).

Reference parity: text extraction = document_loader.py:169-200 semantics
(see functions/html_text.py); chunking = chunker.py:92-178 semantics (see
functions/chunking.py). The reference runs these per document in one
thread (pipeline.py:157-199); here they are stateless ``map_batches``
tasks streaming Arrow blocks.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig, effective_partitions
from ..functions.chunking import chunk_text
from ..functions.hashing import md5_hex, stable_hash64
from ..functions.html_text import extract_text_from_html

TEXTS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("part", pa.int32()),
    ("text", pa.large_string()),
    ("valid_from", pa.timestamp("us")),
    ("lang", pa.string()),
])

CHUNKS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("part", pa.int32()),
    ("chunk_id", pa.string()),
    ("chunk_index", pa.int32()),
    ("text", pa.large_string()),
    ("token_count", pa.int32()),
    ("valid_from", pa.timestamp("us")),
])


def url_partition(url: str, num_partitions: int) -> int:
    """Stable partition id for the resumable output layout (single-value
    wrapper over the vectorized kernel so all sites share one hash)."""
    from ..functions.hashing import url_parts_vec

    return int(url_parts_vec([url], num_partitions)[0])


def make_extract_text_stage(cfg: EngineConfig = DEFAULT_CONFIG):
    """pages(url, warc_ts, html, lang) -> texts(url, part, text, valid_from, lang).

    Drops the heavy ``html`` binary column immediately (project early —
    SURVEY.md §7.5) and stamps the output partition id so every downstream
    table inherits the same layout. ``valid_from = warc_ts`` (north_star
    temporal mapping).
    """
    num_partitions = effective_partitions(cfg)

    def extract(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = [extract_text_from_html(h) for h in htmls]
        from ..functions.hashing import url_parts_vec

        parts = url_parts_vec(urls, num_partitions)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(parts, pa.int32()),
                pa.array(texts, pa.large_string()),
                batch["warc_ts"].cast(pa.timestamp("us")),
                batch["lang"].cast(pa.string()),
            ],
            schema=TEXTS_SCHEMA,
        )

    return extract


def make_chunk_stage(cfg: EngineConfig = DEFAULT_CONFIG):
    """texts -> chunks: 1 page -> N chunk rows (Arrow fan-out).

    chunk_id = md5(url)[:12] + "#" + index — deterministic, unique, and
    compact enough to carry in edges' source_chunks lists at scale.
    """
    size, overlap, strategy = cfg.chunk_size, cfg.chunk_overlap, cfg.chunk_strategy

    def chunk(batch: pa.Table) -> pa.Table:
        urls, parts, texts, vfs = (
            batch["url"].to_pylist(),
            batch["part"].to_pylist(),
            batch["text"].to_pylist(),
            batch["valid_from"].to_pylist(),
        )
        out = {k: [] for k in ("url", "part", "chunk_id", "chunk_index",
                               "text", "token_count", "valid_from")}
        for url, part, text, vf in zip(urls, parts, texts, vfs):
            url_key = md5_hex(url)[:12]
            for row in chunk_text(text, size, overlap, strategy):
                out["url"].append(url)
                out["part"].append(part)
                out["chunk_id"].append(f"{url_key}#{row.chunk_index}")
                out["chunk_index"].append(row.chunk_index)
                out["text"].append(row.text)
                out["token_count"].append(row.token_count)
                out["valid_from"].append(vf)
        return pa.Table.from_arrays(
            [
                pa.array(out["url"], pa.string()),
                pa.array(out["part"], pa.int32()),
                pa.array(out["chunk_id"], pa.string()),
                pa.array(out["chunk_index"], pa.int32()),
                pa.array(out["text"], pa.large_string()),
                pa.array(out["token_count"], pa.int32()),
                pa.array(out["valid_from"], pa.timestamp("us")),
            ],
            schema=CHUNKS_SCHEMA,
        )

    return chunk


def dedup_recrawls_keep_latest(pages_ds, num_buckets: int = 64):
    """Supersession at the pipeline head (V1, reference versioning.py:26-74):
    Common-Crawl-style inputs carry multiple crawls of the same url; only
    the LATEST (max warc_ts; ties broken by longest html then html bytes)
    contributes to the graph — the older crawl is superseded, exactly the
    reference's is_current=false semantics collapsed to a batch decision.

    Implementation: ONE hash-partitioned exchange on url (bucketed
    map_groups, vectorized keep-last inside each bucket). This is the only
    stage that shuffles raw page bytes; enable it via
    ``build_kg(dedup_recrawls=True)`` only when the input may contain
    re-crawls (the input_hint's synthetic tables use url as a primary key).
    """
    import pandas as pd

    from ..functions.hashing import fast_hash64

    def add_bucket(t: pa.Table) -> pa.Table:
        bucket = pa.array(
            [fast_hash64(u) % num_buckets for u in t["url"].to_pylist()],
            pa.int32(),
        )
        return t.append_column("bucket", bucket)

    def keep_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_len=g["html"].str.len())
        g = g.sort_values(["url", "warc_ts", "_len", "html"],
                          kind="mergesort")
        out = g.groupby("url", sort=True).tail(1)
        return out.drop(columns=["bucket", "_len"])

    return (
        pages_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_latest, batch_format="pandas")
    )
