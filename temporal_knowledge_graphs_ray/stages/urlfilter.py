"""Domain allow/deny filtering over the pages table (webtext curation
staple — C4/RefinedWeb-style blocklists; the reference has no URL
surface, its nearest analogue is the per-source filter in
scripts/dataset_statistics.py).

Matching keys on the same vectorized URL components as
stages/webstats.py (registrable ``domain`` by default, full ``host``
optionally), so membership has the identical exact DuckDB oracle: the
filter keeps exactly the rows whose extracted component is (not) in
the list. Unparseable URLs extract to '' — include '' in a blocklist
to also drop junk rows, or leave it out to keep them (documented,
oracle-visible choice; an allowlist drops them by construction).

Scale notes: the list ships ONCE via ``ray.put`` (an Arrow string
array workers read zero-copy — the state/broadcast.py pattern; real
blocklists run to millions of domains) and the filter is one
streaming ``map_batches`` pass — vectorized extract + ``pc.is_in``,
no shuffle, no driver data path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .webstats import url_components


def filter_domains(ds, domains, url_col: str = "url",
                   mode: str = "block", match: str = "domain"):
    """Keep rows by URL component membership.

    mode='block': drop rows whose component is in ``domains``;
    mode='allow': keep only those rows. match='domain' (registrable,
    two-label rule) or 'host' (port/www-stripped full host).
    ``domains`` entries are lowercased.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    if match not in ("domain", "host"):
        raise ValueError(f"match must be 'domain' or 'host', got {match!r}")
    import ray

    dom_ref = ray.put(pa.array(sorted({d.lower() for d in domains}),
                               pa.string()))
    keep_hit = mode == "allow"

    def fil(t: pa.Table) -> pa.Table:
        value_set = ray.get(dom_ref)
        comp = url_components(t[url_col])[match]
        hit = pc.is_in(comp, value_set=value_set)
        return t.filter(hit if keep_hit else pc.invert(hit))

    return ds.map_batches(fil, batch_format="pyarrow", batch_size=65536)


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append the canonical spelling of ``url_col`` (one streaming
    pass; rules in functions/urlnorm.py). Non-URL strings pass through
    unchanged, nulls stay null."""
    from ..functions.urlnorm import canonicalize_url

    def fn(t: pa.Table) -> pa.Table:
        canon = [None if u is None else canonicalize_url(u)
                 for u in t[url_col].to_pylist()]
        return t.append_column(out_col, pa.array(canon, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def dedup_by_url(ds, url_col: str = "url", ts_col: str | None = None,
                 num_buckets: int = 64):
    """URL-level dedup on the CANONICAL spelling: one surviving row per
    canonical URL — the LATEST ``ts_col`` when given (recrawl
    supersession at corpus grain), raw-``url_col``-ascending as the
    deterministic tie-break either way. All input columns pass through
    on the winner; a ``canonical_url`` column is added.

    One bucketed uniform-hash shuffle (groupby(bucket of canonical) ->
    vectorized per-bucket keep-first) — the house dedup shape; no
    driver state. Null urls keep a null ``canonical_url`` but dedup in
    the SAME group as ''-canonical rows (coalesce semantics, matching
    the DuckDB oracle) — include a real id in ``url_col`` upstream if
    one-survivor-for-all-unkeyed-rows is not what you want."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import hash64_vec

    canon = canonicalize_urls(ds, url_col=url_col)

    def bucket(t: pa.Table) -> pa.Table:
        vals = [c or "" for c in t["canonical_url"].to_pylist()]
        b = (hash64_vec(vals) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_url_bucket", pa.array(b))

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_url_bucket"])
        if not len(g):
            return g
        # group on COALESCED canonical (null-url and ''-url rows are
        # one group — the documented semantics and the oracle's
        # PARTITION BY coalesce(canonical_url, ''))
        _K = "_canon_key"
        g = g.assign(**{_K: g["canonical_url"].fillna("")})
        by = [_K]
        asc = [True]
        if ts_col is not None:
            by.append(ts_col)
            asc.append(False)  # latest wins
        by.append(url_col)
        asc.append(True)
        g = g.sort_values(by, ascending=asc, kind="mergesort",
                          na_position="last")
        return g.drop_duplicates(_K, keep="first").drop(columns=[_K])

    return (canon.map_batches(bucket, batch_format="pyarrow")
            .groupby("_url_bucket")
            .map_groups(keep_best, batch_format="pandas"))
