"""Domain filtering: kept rows must equal the DuckDB oracle computed
with the same component-extraction regexes; allow/block are exact
complements; host-level matching distinguishes subdomains."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from temporal_knowledge_graphs_ray.stages.webstats import (
    PORT_RE,
    REG_DOMAIN_RE,
    URL_PARTS_RE,
    WWW_RE,
)

URLS = [
    "https://www.spam.com/a",
    "https://sub.spam.com/b",
    "http://good.org/c",
    "https://spam.com:8080/d",
    "https://notspam.com/e",
    "https://ads.tracker.net/f",
    "not a url",
    "https://good.org/g",
]


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("urls") / "pages.parquet")
    pq.write_table(pa.table({
        "url": URLS, "page_id": list(range(len(URLS)))}), p)
    return p


def _oracle_domains(path: str, domains: tuple, negate: bool,
                    match: str = "domain") -> list[int]:
    comp = f"""regexp_replace(regexp_replace(
                 lower(regexp_extract(url, '{URL_PARTS_RE}', 2)),
                 '{PORT_RE}', ''), '{WWW_RE}', '')"""
    if match == "domain":
        comp = f"""CASE WHEN regexp_extract({comp}, '{REG_DOMAIN_RE}', 1) = ''
                   THEN {comp}
                   ELSE regexp_extract({comp}, '{REG_DOMAIN_RE}', 1) END"""
    op = "NOT IN" if negate else "IN"
    return [r[0] for r in duckdb.sql(f"""
        SELECT page_id FROM read_parquet('{path}')
        WHERE {comp} {op} {domains} ORDER BY page_id
    """).fetchall()]


def _got(pages_path, domains, mode, match="domain") -> list[int]:
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.urlfilter import (
        filter_domains,
    )

    out = filter_domains(rd.read_parquet(pages_path), domains,
                         mode=mode, match=match).to_pandas()
    return sorted(out["page_id"].tolist())


@pytest.mark.usefixtures("ray_session")
def test_blocklist_matches_oracle(pages_path):
    block = ["spam.com", "tracker.net"]
    got = _got(pages_path, block, "block")
    want = _oracle_domains(pages_path, ("spam.com", "tracker.net"), True)
    assert got == want
    # subdomains of a blocked registrable domain are blocked too
    assert 1 not in got and 3 not in got
    # 'notspam.com' is NOT blocked (exact component match, no substring)
    assert 4 in got
    # junk url ('' domain) kept when '' not listed
    assert 6 in got


@pytest.mark.usefixtures("ray_session")
def test_allowlist_is_exact_complement(pages_path):
    allow = ["good.org"]
    got = _got(pages_path, allow, "allow")
    want = _oracle_domains(pages_path, ("good.org", "good.org"), False)
    assert got == want == [2, 7]
    blocked = _got(pages_path, allow, "block")
    assert sorted(got + blocked) == list(range(len(URLS)))


@pytest.mark.usefixtures("ray_session")
def test_host_match_distinguishes_subdomains(pages_path):
    got = _got(pages_path, ["spam.com"], "block", match="host")
    # host-level: sub.spam.com survives, spam.com (incl. www./port) dies
    assert 1 in got and 0 not in got and 3 not in got


@pytest.mark.usefixtures("ray_session")
def test_bad_args(pages_path):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.urlfilter import (
        filter_domains,
    )

    ds = rd.read_parquet(pages_path)
    with pytest.raises(ValueError, match="mode"):
        filter_domains(ds, ["x.com"], mode="deny")
    with pytest.raises(ValueError, match="match"):
        filter_domains(ds, ["x.com"], match="suffix")


# ----------------------------------------------------- canonical + dedup --


class TestCanonicalizeUrl:
    def test_rules(self):
        from temporal_knowledge_graphs_ray.functions.urlnorm import (
            canonicalize_url as c,
        )

        assert c("HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#frag") == \
            "http://example.com/a?a=1&b=2"
        assert c("https://example.com:443/") == "https://example.com/"
        assert c("https://example.com") == "https://example.com/"
        # non-default port, userinfo, percent case, trailing slash kept
        assert c("https://example.com:8443/x") == \
            "https://example.com:8443/x"
        assert c("https://User:Pw@Example.com/X") == \
            "https://User:Pw@example.com/X"
        assert c("https://example.com/a/") == "https://example.com/a/"
        # tracking params drop, incl. every utm_*
        assert c("https://example.com/a?fbclid=z&utm_whatever=1") == \
            "https://example.com/a"
        # non-URLs/null pass through, never raise
        assert c("not a url") == "not a url"
        assert c("") == ""
        assert c(None) == ""

    def test_idempotent(self):
        from temporal_knowledge_graphs_ray.functions.urlnorm import (
            canonicalize_url as c,
        )

        for u in ["HTTP://A.B:80/x?b=2&a=1#f", "https://a.b/p?q=1",
                  "ftp://Host/Path", "mailto:x@y", "//proto-relative/x"]:
            once = c(u)
            assert c(once) == once

    def test_never_raises(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from temporal_knowledge_graphs_ray.functions.urlnorm import (
            canonicalize_url as c,
        )

        @given(st.text(max_size=120))
        @settings(max_examples=300, deadline=None)
        def run(u):
            assert isinstance(c(u), str)

        run()


@pytest.mark.usefixtures("ray_session")
class TestDedupByUrl:
    def _pages(self):
        rows = []
        # 3 spellings of one resource at different timestamps, a
        # distinct resource on the same host, a junk row, a null url
        rows.append(("HTTP://News.Example.com:80/a?utm_source=t", 100, "v1"))
        rows.append(("http://news.example.com/a", 300, "v3"))
        rows.append(("http://news.example.com/a#frag", 200, "v2"))
        rows.append(("http://news.example.com/b", 100, "other"))
        rows.append(("not a url", 50, "junk"))
        rows.append((None, 10, "nullurl"))
        rows.append(("", 5, "emptyurl"))  # coalesces with the null row
        return pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.string())})

    def test_keep_latest_matches_duckdb_oracle(self):
        import duckdb
        import ray.data as rd

        from temporal_knowledge_graphs_ray.functions.urlnorm import (
            canonicalize_url,
        )
        from temporal_knowledge_graphs_ray.stages.urlfilter import (
            dedup_by_url,
        )

        tbl = self._pages()
        got = (dedup_by_url(rd.from_arrow(tbl), ts_col="warc_ts")
               .to_pandas().sort_values("canonical_url",
                                        ignore_index=True))
        src = tbl.to_pandas()
        src["canonical_url"] = [
            canonicalize_url(u) if u is not None else None
            for u in src["url"]]
        con = duckdb.connect()
        con.register("pages", src)
        want = con.execute("""
            SELECT url, warc_ts, text, canonical_url FROM pages
            QUALIFY row_number() OVER (
              PARTITION BY coalesce(canonical_url, '')
              ORDER BY warc_ts DESC, url ASC) = 1
            ORDER BY canonical_url
        """).df()
        assert list(got["canonical_url"]) == list(want["canonical_url"])
        assert list(got["text"]) == list(want["text"])
        assert list(got["warc_ts"]) == list(want["warc_ts"])
        # the latest recrawl of the canonical resource won
        assert "v3" in set(got["text"])
        assert {"v1", "v2"}.isdisjoint(set(got["text"]))

    def test_layout_invariance_and_no_ts(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.urlfilter import (
            dedup_by_url,
        )

        tbl = self._pages()
        base = (dedup_by_url(rd.from_arrow(tbl), ts_col="warc_ts",
                             num_buckets=3)
                .to_pandas().sort_values("canonical_url",
                                         ignore_index=True))
        rep = (dedup_by_url(rd.from_arrow(tbl).repartition(5),
                            ts_col="warc_ts", num_buckets=3)
               .to_pandas().sort_values("canonical_url",
                                        ignore_index=True))
        assert base.equals(rep)
        # without ts: smallest RAW url wins deterministically — the
        # uppercase 'HTTP://News...' spelling (v1) byte-sorts before
        # the lowercase ones
        nots = (dedup_by_url(rd.from_arrow(tbl)).to_pandas()
                .sort_values("canonical_url", ignore_index=True))
        assert "v1" in set(nots["text"])
        assert {"v2", "v3"}.isdisjoint(set(nots["text"]))
        assert len(nots) == len(base)
