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


def extract_text_from_html(html: str | bytes) -> str:
    """Extract plain text from an HTML document.

    Pure function: deterministic for a given input, safe under Ray task
    retries. Accepts ``bytes`` (Parquet ``binary`` column values) decoded as
    UTF-8 with ``errors="replace"`` — Common-Crawl payloads are not always
    valid UTF-8.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
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
