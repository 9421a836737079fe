"""Markdown -> plain text (S3).

The reference loads .md files as ``markdown.markdown(md)`` ->
``BeautifulSoup(...).get_text(separator="\\n", strip=True)``
(/root/reference/src/temporal_kg_rag/ingestion/document_loader.py:142-167).
Neither library exists in this container, so this is a stdlib
reimplementation of that chain's OBSERVABLE contract for the common
Markdown constructs: every block element contributes its text content as
stripped lines separated by newlines —

- ATX headers (#..######) -> their text on an own line,
- paragraphs -> their (soft-wrapped lines joined as in HTML rendering,
  i.e. kept as separate lines by get_text),
- emphasis/strong/inline code markers stripped,
- links/images -> link text (targets dropped),
- list items -> item text on an own line (markers dropped),
- blockquote '>' prefixes dropped,
- fenced code blocks -> their lines verbatim (fence lines dropped),
- horizontal rules dropped.

Divergence from the real markdown lib is possible for exotic nesting;
the subset above covers the document corpus shapes the reference
ingests (it feeds the same chunker afterwards).
"""

from __future__ import annotations

import re

# Python-Markdown's HashHeaderProcessor regex is
# ``(?P<level>#{1,6})(?P<header>(?:\\.|[^\\])*?)#*(?:\n|$)`` — NO
# whitespace required after the hashes (``#Header`` is an h1 there,
# unlike CommonMark), content is lazy with greedy trailing ``#*``
# stripped, and the result is ``.strip()``-ed. '# ' / '#' / '#######'
# therefore render as an EMPTY header, and get_text(strip=True) drops
# empty nodes.
_HEADER_RE = re.compile(r"^(#{1,6})(.*?)\s*#*\s*$")
_ULIST_RE = re.compile(r"^\s*[-*+]\s+(.*)$")
_OLIST_RE = re.compile(r"^\s*\d+[.)]\s+(.*)$")
_HRULE_RE = re.compile(r"^\s*([-*_])\s*(\1\s*){2,}$")
_BLOCKQUOTE_RE = re.compile(r"^\s*>\s?(.*)$")
_LINK_RE = re.compile(r"!?\[([^\]]*)\]\([^)]*\)")
_CODE_RE = re.compile(r"`([^`]*)`")
_STRONG_RE = re.compile(r"(\*\*|__)(.+?)\1")
_EM_RE = re.compile(r"(\*|_)(.+?)\1")


def _inline(text: str) -> str:
    text = _LINK_RE.sub(lambda m: m.group(1), text)
    text = _CODE_RE.sub(lambda m: m.group(1), text)
    text = _STRONG_RE.sub(lambda m: m.group(2), text)
    text = _EM_RE.sub(lambda m: m.group(2), text)
    return text.strip()


def markdown_to_text(md: str) -> str:
    # Line splitting matches the reference chain, not str.splitlines():
    # Python-Markdown normalizes \r\n / \r to \n and then splits on \n
    # only, so unicode line/record separators (\x1e, \x85,  , ...)
    # are ordinary in-line characters there.  str.splitlines() would
    # split on them and change which fragments look like block starts.
    out: list[str] = []
    in_fence = False
    for raw in md.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        stripped = raw.strip()
        if stripped.startswith("```") or stripped.startswith("~~~"):
            in_fence = not in_fence
            continue
        if in_fence:
            if stripped:
                out.append(stripped)
            continue
        if not stripped:
            continue
        if _HRULE_RE.match(stripped):
            continue
        m = _HEADER_RE.match(stripped)
        if m:
            # Empty block elements ('# ', '- ') contribute NO line:
            # get_text(strip=True) drops empty strings, so the kernel
            # contract is "no blank lines, every line stripped".
            text = _inline(m.group(2) or "")
            if text:
                out.append(text)
            continue
        m = _BLOCKQUOTE_RE.match(stripped)
        if m:
            if m.group(1).strip():
                out.append(_inline(m.group(1)))
            continue
        m = _ULIST_RE.match(raw) or _OLIST_RE.match(raw)
        if m:
            text = _inline(m.group(1))
            if text:
                out.append(text)
            continue
        line = _inline(stripped)
        if line:
            out.append(line)
    # Final normalization: block parsing above is \n-based (matching
    # Python-Markdown), but the kernel contract — "no blank lines, every
    # line stripped" — must hold under str.splitlines() too, whose
    # unicode line breaks (\x1e, \x85,  , ...) can survive _inline
    # in the INTERIOR of a fragment ('a\x1e\x1eb').  Re-split each
    # fragment on every linebreak definition and drop empties.
    lines: list[str] = []
    for frag in out:
        for piece in frag.splitlines():
            piece = piece.strip()
            if piece:
                lines.append(piece)
    return "\n".join(lines)
