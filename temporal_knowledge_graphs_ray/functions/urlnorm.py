"""Canonical-URL normalization (webtext curation kernel).

Common-Crawl-style corpora carry the same resource under many URL
spellings (scheme/host case, default ports, fragments, tracking
params, param order). ``canonicalize_url`` maps every spelling of a
resource to ONE canonical string so URL-level dedup / keep-latest
supersession can key on it. The reference keys recrawls on the raw
url string (its ingest upserts by url); this kernel is the scale
addition that makes that key spelling-invariant.

Normalization decisions (each deliberate, all documented here; the
kernel is pure and unit-pinned, so changing one is a one-line diff +
re-dedup):

- scheme and host lowercase; an empty path becomes "/",
- default ports drop (http:80, https:443); other ports stay,
- the fragment drops (never sent to the server),
- tracking query params drop (``TRACKING_PARAMS``: utm_*, ga/fb/ms
  click ids, mailchimp ids, common affiliate refs),
- surviving query params sort by (key, value) — order-insensitive
  dedup — and their percent-encoding NORMALIZES via the
  parse_qsl/urlencode round-trip ('a=%41' and 'a=A' canonicalize
  identically),
- userinfo, PATH percent-encoding case and trailing-slash
  distinctions are PRESERVED: collapsing them conflates genuinely
  different resources more often than it merges spellings in practice.

Non-URL strings (no scheme/netloc) come back unchanged — never raise
mid-pipeline.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

TRACKING_PARAMS = frozenset({
    "fbclid", "gclid", "gclsrc", "dclid", "msclkid", "twclid",
    "igshid", "mc_cid", "mc_eid", "mkt_tok", "yclid", "wbraid",
    "gbraid", "ref_src", "ref_url", "_hsenc", "_hsmi", "vero_id",
    "oly_anon_id", "oly_enc_id", "s_cid", "wickedid",
})

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str | None,
                     tracking_params: frozenset = TRACKING_PARAMS) -> str:
    """One canonical spelling per resource (rules in module docstring)."""
    if not url:
        return url or ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    host_start = netloc.rfind("@") + 1  # keep userinfo verbatim
    netloc = netloc[:host_start] + netloc[host_start:].lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    path = parts.path or "/"
    q = [(k, v) for k, v in
         parse_qsl(parts.query, keep_blank_values=True)
         if not (k in tracking_params or k.startswith("utm_"))]
    query = urlencode(sorted(q)) if q else ""
    return urlunsplit((scheme, netloc, path, query, ""))
