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
