"""WARC / WET web-archive source (scale addition).

CommonCrawl — the raw material of every web-scale pretraining corpus —
distributes extracted text as WET shards: concatenations of WARC
(ISO 28500) records where each ``conversion`` record carries one page's
plain text with ``WARC-Target-URI`` / ``WARC-Date`` headers and an exact
``Content-Length`` payload. The reference repo has no web-archive
source (its loaders dispatch on file suffix,
/root/reference/src/temporal_kg_rag/ingestion/document_loader.py:20-102);
a 100 TB webtext run starts from WET shards, so this engine reads them
natively.

Ray-Data-first: ``read_wet(paths)`` is
``ray.data.read_binary_files`` (the shard file is the natural
parallelism unit — CommonCrawl writes ~100-400 MB shards, one Ray block
each, tens of thousands of shards per crawl give full-cluster fan-out)
followed by ONE parse kernel per shard inside ``map_batches``. The
driver never opens a file. Gzip — whole-file or the per-record
multi-member framing CommonCrawl actually uses — is handled by reading
all members off the raw bytes.

Malformed input policy: a record whose headers or framing cannot be
parsed ends that shard's scan; in strict mode the task raises, in the
default mode the remainder is skipped and the parsed rows carry a
``truncated`` flag so downstream accounting is honest (never a silent
partial read).
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa

WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_date", pa.string()),
    ("record_id", pa.string()),
    ("warc_type", pa.string()),
    ("content_length", pa.int64()),
    ("text", pa.large_string()),
    ("wet_file", pa.string()),
    ("truncated", pa.bool_()),
])

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(data: bytes) -> tuple[bytes, bool]:
    """Decompress whole-file or multi-member gzip; passthrough plain.
    Returns ``(bytes, ok)`` — on a corrupt/truncated stream ``ok`` is
    False and the bytes are the salvageable prefix (whole members
    decompressed before the bad one), so the non-strict truncation
    policy applies to bad COMPRESSION the same way it applies to bad
    framing instead of crash-looping the task."""
    if data[:2] != _GZIP_MAGIC:
        return data, True
    import zlib

    out: list[bytes] = []
    buf = data
    while buf[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=47)  # 32+15: gzip member
        try:
            out.append(d.decompress(buf))
            out.append(d.flush())
        except zlib.error:
            return b"".join(out), False
        if not d.eof:  # member ended mid-stream (truncated shard)
            return b"".join(out), False
        buf = d.unused_data
    # trailing non-gzip garbage after the last member is malformation
    return b"".join(out), not buf.strip(b"\x00")


def _parse_headers(block: bytes) -> dict[str, str] | None:
    """Parse a WARC header block (first line ``WARC/x.y``); None if the
    version line is missing. Header names are case-insensitive."""
    lines = block.split(b"\n")
    if not lines or not lines[0].strip().startswith(b"WARC/"):
        return None
    out: dict[str, str] = {}
    for ln in lines[1:]:
        ln = ln.strip(b"\r")
        if not ln:
            continue
        k, sep, v = ln.partition(b":")
        if not sep:
            return None
        out[k.strip().lower().decode("ascii", "replace")] = (
            v.strip().decode("utf-8", "replace"))
    return out


def parse_wet_bytes(data: bytes, source: str = "",
                    strict: bool = False) -> list[dict]:
    """All WARC records in one shard's bytes (gunzipped if needed).

    Returns one dict per record (all WARC-Types — filter downstream;
    ``read_wet`` keeps ``conversion`` by default). On malformation the
    strict mode raises ``ValueError``; the default mode stops at the bad
    offset and marks every returned row ``truncated=True``.
    """
    data, gz_ok = _maybe_gunzip(data)
    rows: list[dict] = []
    pos, n = 0, len(data)
    truncated = not gz_ok
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        nl_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (nl_end != -1 and nl_end + 2 < hdr_end):
            hdr_end, sep_len = nl_end, 2
        if hdr_end == -1:
            truncated = True
            break
        headers = _parse_headers(data[pos:hdr_end])
        if headers is None or "content-length" not in headers:
            truncated = True
            break
        try:
            clen = int(headers["content-length"])
        except ValueError:
            truncated = True
            break
        body_start = hdr_end + sep_len
        if body_start + clen > n:
            truncated = True
            break
        body = data[body_start:body_start + clen]
        rows.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "content_length": clen,
            "text": body.decode("utf-8", "replace"),
            "wet_file": source,
        })
        pos = body_start + clen
    if truncated and strict:
        raise ValueError(f"malformed WARC record at byte {pos} of "
                         f"{source or '<bytes>'}")
    for r in rows:
        r["truncated"] = truncated
    return rows


def read_wet(paths, *, keep_types: tuple[str, ...] = ("conversion",),
             strict: bool = False):
    """WET shard path(s) -> Dataset with ``WET_SCHEMA`` rows.

    ``keep_types`` filters by WARC-Type (CommonCrawl WET text lives in
    ``conversion`` records; pass ``None`` to keep everything including
    ``warcinfo`` preambles). One parse task per shard file.
    """
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    kt = tuple(keep_types) if keep_types is not None else None

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for raw, path in zip(t["bytes"].to_pylist(),
                             t["path"].to_pylist()):
            for r in parse_wet_bytes(raw, source=path, strict=strict):
                if kt is None or r["warc_type"] in kt:
                    rows.append(r)
        if not rows:
            return WET_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=WET_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow")


def wet_to_documents(ds, seed: int = 0):
    """WET rows -> the engine's documents shape (doc_id, url, ts, text):
    doc_id is a stable 63-bit hash of the record id (or url|date when
    absent) so re-reads, retries and shard orderings agree; ts is the
    WARC-Date ISO string. Feed straight into curate_corpus / build_kg's
    from-documents path."""
    from ..functions.hashing import hash64_vec

    def conv(t: pa.Table) -> pa.Table:
        ids = [
            (rid if rid else f"{u}|{d}")
            for rid, u, d in zip(t["record_id"].to_pylist(),
                                 t["url"].to_pylist(),
                                 t["warc_date"].to_pylist())
        ]
        # >>1 = the documented 63-bit id: nonnegative in int64, same
        # rationale as the substring-dedup keys (Ray groupby re-infers
        # key dtypes; full-range values degrade to object blocks)
        h = (hash64_vec(ids, seed) >> np.uint64(1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(h, pa.int64()),
            "url": t["url"],
            "ts": t["warc_date"],
            "text": t["text"].cast(pa.large_string()),
        })

    return ds.map_batches(conv, batch_format="pyarrow")


def write_wet(path: str, records: list[dict], *,
              compress: bool = False,
              per_record_members: bool = False) -> None:
    """Spec-conformant WET writer (tests / synthetic shards): each
    record gets WARC/1.0 headers with an exact Content-Length over the
    UTF-8 payload. ``per_record_members=True`` reproduces CommonCrawl's
    one-gzip-member-per-record framing (implies compression)."""
    chunks: list[bytes] = []
    for i, r in enumerate(records):
        body = r["text"].encode("utf-8")
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'conversion')}\r\n"
            f"WARC-Target-URI: {r.get('url', '')}\r\n"
            f"WARC-Date: {r.get('warc_date', '2020-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: <urn:uuid:{r.get('record_id', f'rec-{i}')}>\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode("utf-8")
        chunks.append(hdr + body + b"\r\n\r\n")
    if per_record_members:
        out = b"".join(gzip.compress(c, mtime=0) for c in chunks)
    elif compress:
        out = gzip.compress(b"".join(chunks), mtime=0)
    else:
        out = b"".join(chunks)
    with open(path, "wb") as f:
        f.write(out)
