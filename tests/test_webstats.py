"""Per-domain webtext rollups: url_components and domain_stats must
match DuckDB exactly (regexes in the shared Python-re/RE2 subset,
md5(text) fingerprints, single-division ratios)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from temporal_knowledge_graphs_ray.stages.webstats import (
    PORT_RE,
    REG_DOMAIN_RE,
    URL_PARTS_RE,
    WWW_RE,
    url_components,
)

EDGE_URLS = [
    "https://www.Example.COM:8080/a/b/c?q=1#f",
    "http://site5.example/page/77",
    "ftp://files.example.org/",
    "not a url",
    "https://localhost/x",
    "https://sub.deep.example.co.uk/p",   # two-label rule => co.uk
    "HTTPS://example.com",                # no path
    "",
    "https://www.www.example.net/y",      # only the FIRST www. strips
    "http://a.b:99:77/z",                 # junk double port
]


def _duck_components(urls: list[str]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ",".join(f"('{u}')" for u in urls) + ") t(url)")
    return con.execute(f"""
        WITH c AS (
          SELECT url,
            lower(regexp_extract(url, '{URL_PARTS_RE}', 1)) AS scheme,
            regexp_replace(regexp_replace(
               lower(regexp_extract(url, '{URL_PARTS_RE}', 2)),
               '{PORT_RE}', ''), '{WWW_RE}', '') AS host,
            regexp_extract(url, '{URL_PARTS_RE}', 3) AS path
          FROM u)
        SELECT scheme, host,
          CASE WHEN regexp_extract(host, '{REG_DOMAIN_RE}', 1) = ''
               THEN host
               ELSE regexp_extract(host, '{REG_DOMAIN_RE}', 1)
          END AS domain,
          path,
          length(path) - length(replace(path, '/', '')) AS path_depth
        FROM c
    """).fetchall()


def test_url_components_match_duckdb():
    got = {k: v.to_pylist()
           for k, v in url_components(pa.array(EDGE_URLS)).items()}
    for i, (s, h, d, p, depth) in enumerate(_duck_components(EDGE_URLS)):
        assert (got["scheme"][i], got["host"][i], got["domain"][i],
                got["path"][i], got["path_depth"][i]) == \
            (s, h, d, p, depth), EDGE_URLS[i]


def _pages_with_recrawls(tmp_path) -> str:
    """Synth pages + planted recrawl duplicates (same url+text, later
    warc_ts) so dup_rate is non-trivial, written to Parquet."""
    from temporal_knowledge_graphs_ray.sources.synth import pages_table

    base = pages_table(list(range(120)))
    dup = base.slice(0, 30)
    bumped = pa.compute.add(
        dup["warc_ts"].cast(pa.int64()),
        pa.scalar(86_400_000_000, pa.int64()),
    ).cast(pa.timestamp("us"))
    dup = dup.set_column(dup.schema.get_field_index("warc_ts"),
                         "warc_ts", bumped)
    pages = pa.concat_tables([base, dup])
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    return path


@pytest.mark.usefixtures("ray_session")
def test_domain_stats_matches_duckdb(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.webstats import domain_stats

    path = _pages_with_recrawls(tmp_path)
    got = domain_stats(rd.read_parquet(path))

    con = duckdb.connect()
    want = con.execute(f"""
        WITH c AS (
          SELECT regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '{URL_PARTS_RE}', 2)),
                   '{PORT_RE}', ''), '{WWW_RE}', '') AS host,
                 text, warc_ts
          FROM read_parquet('{path}')),
        d AS (
          SELECT CASE WHEN regexp_extract(host, '{REG_DOMAIN_RE}', 1) = ''
                      THEN host
                      ELSE regexp_extract(host, '{REG_DOMAIN_RE}', 1)
                 END AS domain, text, warc_ts
          FROM c)
        SELECT domain,
               count(*) AS n_pages,
               count(DISTINCT md5(text)) AS n_distinct_texts,
               round(1 - count(DISTINCT md5(text))::DOUBLE / count(*), 6)
                 AS dup_rate,
               sum(length(text)) AS total_chars,
               round(sum(length(text))::DOUBLE / count(*), 4) AS avg_chars,
               min(warc_ts) AS first_ts,
               max(warc_ts) AS last_ts
        FROM d GROUP BY domain ORDER BY domain
    """).df()

    assert len(got) > 1
    assert (got["dup_rate"] > 0).any(), "recrawl dups must be visible"
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_parse_urls_appends_columns(tmp_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.webstats import parse_urls

    path = _pages_with_recrawls(tmp_path)
    ds = parse_urls(rd.read_parquet(path, columns=["url"]))
    out = ds.take_batch(5, batch_format="pandas")
    for col in ("scheme", "host", "domain", "path", "path_depth"):
        assert col in out.columns
    assert (out["scheme"] == "https").all()
    assert out["domain"].str.endswith(".example").all()
