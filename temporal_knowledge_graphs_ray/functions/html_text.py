"""HTML → plain-text extraction kernel.

Behavioral contract replicated from the reference's ``_load_html``
(/root/reference/src/temporal_kg_rag/ingestion/document_loader.py:169-200):

1. parse the HTML document,
2. drop ``<script>`` and ``<style>`` subtrees entirely (``decompose()``),
3. collect the text of every remaining text node, stripped, skipping
   whitespace-only nodes, joined with ``"\n"``
   (bs4 ``get_text(separator="\n", strip=True)``),
4. re-split on line breaks, strip each line, drop empties, join with
   ``"\n"`` (document_loader.py:193-194).

The net effect of (3)+(4): the output is exactly the sequence of non-empty,
stripped *lines* of all text content outside script/style, joined by a
single ``"\n"``, with HTML character references decoded.

bs4 is not available in this environment, so the kernel is implemented on
the stdlib ``html.parser`` with ``convert_charrefs=True`` (same entity
decoding). CDATA-less, well-formed-ish HTML (the only kind our page
generator and Common-Crawl-style fixtures produce) round-trips identically.
The per-url byte-identical pytest gate in tests/test_html_text.py pins this
contract.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style"})

# Void elements never push onto the open-tag stack (html.parser reports some
# of them via handle_starttag, not handle_startendtag).
_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            stripped = data.strip()
            if stripped:
                self.parts.append(stripped)


# ---------------------------------------------------------------------------
# fast path: a regex tag scanner for the "simple" HTML subset
# ---------------------------------------------------------------------------
# ``html.parser`` spends ~45% of the whole page kernel in its tolerant
# ``goahead`` loop. Web-page bodies overwhelmingly use plain tags with
# balanced quoted attributes and no character references outside
# script/style, so a tag-regex scan extracts the same text ~8x faster.
# EXACTNESS RULE: the scanner handles only inputs it can PROVE behave
# identically under ``html.parser`` and returns None for everything else
# (comments, doctypes, processing instructions, character references in
# text, quotes that could hide a ``>``, malformed tags, end tags with
# attributes) — the caller then falls back to the parser path, so the
# byte-identical contract holds for every input by construction. The
# subset-equivalence is pinned by a differential fuzz test
# (tests/test_html_fast_path.py).

# Tag-name charset matches html.parser's ``tagfind_tolerant``; the attr
# region excludes both angle brackets so any "<" inside a tag (or an
# unterminated tag) fails the match and falls back.
_SIMPLE_TAG_RE = re.compile(r"<(/?)([a-zA-Z][^\t\n\r\f />\x00]*)([^<>]*)>")

# Start-tag attribute regions the scanner accepts: a sequence of
# well-formed attributes (name, optional quoted/unquoted value) with "/"
# allowed only inside quoted values or as the final self-closing slash.
# Anything else (stray slashes, bare quotes, junk html.parser would
# re-parse tolerantly or emit as data) falls back to the parser.
_ATTRS_OK_RE = re.compile(
    r"(?:\s+[^\s/=>\"']+"                          # attribute name
    r"(?:=(?:\"[^\"]*\"|'[^']*'|[^\s\"'=/>]*))?"   # optional value
    r")*"
    r"\s*/?\Z")

# html.parser's CDATA-mode end scanner for script/style is ``</\s*name``
# (case-insensitive).
_CDATA_END = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def _extract_fast(html: str) -> str | None:
    """Text extraction over the simple-HTML subset; None = fall back."""
    parts: list[str] = []
    append = parts.append
    find = html.find
    i = 0
    while True:
        lt = find("<", i)
        seg = html[i:] if lt < 0 else html[i:lt]
        if seg:
            if "&" in seg:
                # exactly the parser's convert_charrefs step: CPython's
                # goahead() calls html.unescape() on each whole inter-tag
                # segment (html/parser.py goahead, convert_charrefs branch)
                seg = unescape(seg)
            s = seg.strip()
            if s:
                append(s)
        if lt < 0:
            break
        m = _SIMPLE_TAG_RE.match(html, lt)
        if m is None:
            return None  # "<!--", "<?", "<3", bare "<" ... -> parser
        closing, name, attrs = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            if attrs.strip():
                return None  # end tag with junk: parser's tolerant re-parse
        elif attrs and _ATTRS_OK_RE.fullmatch(attrs) is None:
            # also covers a quoted value containing ">": the truncated
            # match leaves that quote unbalanced and the tail malformed
            return None
        elif (attrs.endswith("/") and len(attrs) >= 2
                and attrs[-2] not in " \t\n\r\f\"'"):
            # html.parser's bare-value charset includes "/", so a slash
            # glued to an unquoted value (<script foo=bar/>) is VALUE, not
            # a self-closing marker there — ambiguous, let the parser rule
            return None
        i = m.end()
        # html.parser enters CDATA mode only for a non-self-closing start
        # tag (a "/>" suffix routes to handle_startendtag instead); the
        # self-closing test is end.endswith("/>"), i.e. no space before ">"
        if (not closing and name in _SKIP_TAGS
                and not attrs.endswith("/")):
            # CDATA content mode: raw text until the matching end tag.
            # The scanner regex is a PREFIX match (``</\s*script``), so it
            # also stops at ``</scripty>`` — html.parser parses that end
            # tag, sees the name differs from the cdata element, emits it
            # as (skipped) data and STAYS in CDATA mode
            # (parser.parse_endtag's ``elem != self.cdata_elem`` branch);
            # only an exact-name match exits the mode.
            scan = i
            i = None
            while True:
                em = _CDATA_END[name].search(html, scan)
                if em is None:
                    break  # unterminated: rest is (skipped) data
                cm = _SIMPLE_TAG_RE.match(html, em.start())
                if cm is None or not cm.group(1) or cm.group(3).strip():
                    return None
                if cm.group(2).lower() != name:
                    scan = em.start() + 1  # data inside CDATA, keep going
                    continue
                i = cm.end()
                break
            if i is None:
                break
    text = "\n".join(parts)
    lines = [line.strip() for line in text.splitlines() if line.strip()]
    return "\n".join(lines)


def extract_text_from_html(html: str | bytes) -> str:
    """Extract plain text from an HTML document.

    Pure function: deterministic for a given input, safe under Ray task
    retries. Accepts ``bytes`` (Parquet ``binary`` column values) decoded as
    UTF-8 with ``errors="replace"`` — Common-Crawl payloads are not always
    valid UTF-8.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    fast = _extract_fast(html)
    if fast is not None:
        return fast
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    # Step (3): join stripped text nodes with "\n"; step (4): line-strip,
    # drop empties, re-join. Text nodes can themselves contain newlines, so
    # both steps are required for parity with the reference.
    text = "\n".join(parser.parts)
    lines = [line.strip() for line in text.splitlines() if line.strip()]
    return "\n".join(lines)


def normalize_text_lines(text: str) -> str:
    """Apply only step (4) of the contract to pre-extracted text.

    Equivalent SQL (DuckDB):
    ``array_to_string(list_filter(list_transform(string_split(text, chr(10)),
    x -> trim(x)), x -> x <> ''), chr(10))``

    Note: Python ``str.strip()`` strips all unicode whitespace while SQL
    ``trim`` strips spaces only — callers that need SQL parity should only
    feed text whose lines are padded with plain spaces/tabs; DuckDB's
    ``trim(x, chr(9) || ' ')`` handles tabs too.
    """
    return "\n".join(line.strip() for line in text.splitlines() if line.strip())
