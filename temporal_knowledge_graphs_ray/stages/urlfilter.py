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
