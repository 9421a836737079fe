"""Per-domain webtext rollups over the Common-Crawl-style pages table.

Scale additions for a web-corpus engine (the reference has no URL
analytics surface; its nearest analogue is the per-source document
stats in scripts/dataset_statistics.py): crawl curation decisions —
domain allow/deny lists, per-domain quality caps, recrawl scheduling —
key on *registrable domain*, so the engine needs (a) vectorized URL
component parsing and (b) a per-domain rollup with an exact-duplicate
rate, both as streaming dataflows.

Every regex here is written in the common Python-``re`` / RE2 subset
(same discipline as ``stages/pii.py``) so DuckDB ``regexp_extract`` /
``regexp_replace`` over the same Parquet is an exact per-row oracle,
and the duplicate fingerprint is ``md5(text)`` — the one hash DuckDB
computes byte-identically (same rationale as ``stages/sampling.py``).

Null/no-match semantics follow DuckDB: ``regexp_extract`` returns the
EMPTY STRING on no match (not NULL), so unparseable URLs land in host
= domain = '' and still aggregate — a crawl with junk url rows yields
a '' domain bucket instead of dropped rows.

Scale notes: URL parsing is a pure streaming map (one
``pc.extract_regex`` pass per batch, no shuffle). ``domain_stats`` is
two grouped shuffles with map-side combines: level 1 pre-aggregates
``(domain, md5(text))`` inside each batch (recrawl duplicates combine
before the shuffle), level 2 reduces one row per distinct text to one
row per domain. A hub domain (one site dominating the crawl) spreads
across its distinct fingerprints at level 1, and Ray's hash-shuffle
aggregate combines per block at level 2, so no single reducer sees a
hot domain's raw page count.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# Shared Python-re / RE2 subset (no lookbehind, no backrefs). Named
# groups because pyarrow extract_regex requires them; RE2/DuckDB still
# exposes them as numbered groups 1/2/3 for the oracle SQL.
URL_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
                r"(?P<auth>[^/?#]+)(?P<path>[^?#]*)")
# Port suffix to strip from the authority.
PORT_RE = r":[0-9]+$"
# Leading www. label to strip from the lowercased host.
WWW_RE = r"^www\."
# Last two labels of the host = approximate registrable domain. A real
# deployment swaps this for a public-suffix list (co.uk etc.); the
# two-label rule is the documented, oracle-checkable approximation.
REG_DOMAIN_RE = r"(?P<dom>[^.]+\.[^.]+)$"


def _empty_if_null(arr: pa.Array) -> pa.Array:
    """DuckDB regexp_extract no-match semantics: '' not NULL."""
    return pc.fill_null(arr, "")


def url_components(urls: pa.Array) -> dict[str, pa.Array]:
    """Vectorized URL → (scheme, host, domain, path, path_depth).

    host is lowercased with the port and a leading ``www.`` stripped;
    domain is the last two host labels (falls back to the whole host
    for single-label hosts); path_depth counts '/' in the path. Rows
    that don't look like absolute URLs get '' components and depth 0.
    """
    urls = pc.cast(urls, pa.string())
    parts = pc.extract_regex(urls, URL_PARTS_RE)
    # struct_field on the null (no-match) rows yields null -> ''.
    scheme = _empty_if_null(pc.ascii_lower(pc.struct_field(parts, 0)))
    authority = _empty_if_null(pc.utf8_lower(pc.struct_field(parts, 1)))
    path = _empty_if_null(pc.struct_field(parts, 2))
    host = pc.replace_substring_regex(
        pc.replace_substring_regex(authority, PORT_RE, ""), WWW_RE, "")
    dom = pc.extract_regex(host, REG_DOMAIN_RE)
    domain = pc.if_else(pc.is_valid(dom),
                        _empty_if_null(pc.struct_field(dom, 0)), host)
    depth = pc.count_substring(path, "/").cast(pa.int64())
    return {"scheme": scheme, "host": host, "domain": domain,
            "path": path, "path_depth": depth}


def parse_urls(ds, url_col: str = "url"):
    """Append scheme/host/domain/path/path_depth columns (streaming map)."""

    def add(t: pa.Table) -> pa.Table:
        comps = url_components(t[url_col])
        for name, arr in comps.items():
            t = t.append_column(name, arr)
        return t

    return ds.map_batches(add, batch_format="pyarrow", batch_size=65536)


def _md5_col(texts: pa.Array) -> pa.Array:
    """md5 hex per text — matches DuckDB ``md5(text)`` byte-for-byte.

    Per-row loop, but hashlib's C md5 over page-sized texts dominates
    the loop overhead (same tradeoff as stages/sampling._md5_rank);
    NULL text hashes as NULL, matching SQL ``md5(NULL)``.
    """
    out = []
    for v in texts:
        s = v.as_py()
        out.append(None if s is None
                   else hashlib.md5(s.encode("utf-8")).hexdigest())
    return pa.array(out, pa.string())


def domain_stats(pages_ds, url_col: str = "url", text_col: str = "text",
                 ts_col: str = "warc_ts"):
    """Per-registrable-domain crawl rollup.

    Returns a pandas frame sorted by domain with columns
    (domain, n_pages, n_distinct_texts, dup_rate, total_chars,
    avg_chars, first_ts, last_ts). dup_rate = 1 - distinct/pages and
    avg_chars = total_chars/n_pages are single int/int divisions
    rounded half-away, so DuckDB computes them bit-identically.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions.rounding import round_half_away

    def level1(t: pa.Table) -> pa.Table:
        comps = url_components(t[url_col])
        pre = pa.Table.from_arrays(
            [comps["domain"], _md5_col(t[text_col]),
             pc.utf8_length(t[text_col]).cast(pa.int64()),
             t[ts_col]],
            names=["domain", "fp", "chars", "ts"],
        )
        # map-side combine: recrawl duplicates of the same text merge
        # inside the batch before the (domain, fp) shuffle. n counts ALL
        # rows (count_all) so NULL-text pages still count toward n_pages
        # — matching the oracle's count(*) — while chars/fp stay null
        # (sum skips them; distinct ignores NULL, handled below).
        return pre.group_by(["domain", "fp"]).aggregate(
            [([], "count_all"), ("chars", "sum"),
             ("ts", "min"), ("ts", "max")]
        ).rename_columns(["domain", "fp", "n", "chars", "ts_min", "ts_max"])

    per_text = (
        pages_ds.map_batches(level1, batch_format="pyarrow",
                             batch_size=4096)
        .groupby(["domain", "fp"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("chars", alias_name="chars"),
                   Min("ts_min", alias_name="ts_min"),
                   Max("ts_max", alias_name="ts_max"))
    )
    out = (
        per_text.groupby("domain")
        .aggregate(Sum("n", alias_name="n_pages"),
                   # distinct texts ignore NULL fp (SQL count(DISTINCT)
                   # semantics — a domain of only null-text pages has 0)
                   Count(on="fp", ignore_nulls=True,
                         alias_name="n_distinct_texts"),
                   Sum("chars", alias_name="total_chars"),
                   Min("ts_min", alias_name="first_ts"),
                   Max("ts_max", alias_name="last_ts"))
        .to_pandas()
    )
    out["n_pages"] = out["n_pages"].astype("int64")
    out["n_distinct_texts"] = out["n_distinct_texts"].astype("int64")
    if out["total_chars"].notna().all():
        out["total_chars"] = out["total_chars"].astype("int64")
    # else: an all-null-text domain's sum is NULL, matching SQL
    # sum(length(text)) — keep NaN rather than crash the int cast
    out["dup_rate"] = round_half_away(
        1.0 - out["n_distinct_texts"] / out["n_pages"], 6)
    out["avg_chars"] = round_half_away(
        out["total_chars"] / out["n_pages"], 4)
    cols = ["domain", "n_pages", "n_distinct_texts", "dup_rate",
            "total_chars", "avg_chars", "first_ts", "last_ts"]
    return out[cols].sort_values("domain", ignore_index=True)
