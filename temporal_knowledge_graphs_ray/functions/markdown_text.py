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

_HEADER_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
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
    out: list[str] = []
    in_fence = False
    for raw in md.splitlines():
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
            out.append(_inline(m.group(2)))
            continue
        m = _BLOCKQUOTE_RE.match(stripped)
        if m:
            if m.group(1).strip():
                out.append(_inline(m.group(1)))
            continue
        m = _ULIST_RE.match(raw) or _OLIST_RE.match(raw)
        if m:
            out.append(_inline(m.group(1)))
            continue
        line = _inline(stripped)
        if line:
            out.append(line)
    return "\n".join(out)
