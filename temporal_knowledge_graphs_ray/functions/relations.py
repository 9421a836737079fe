"""Deterministic relation-extraction kernel (quadruple stand-in).

The reference extracts temporal quadruples per chunk with an LLM
(/root/reference/src/temporal_kg_rag/ingestion/relation_extractor.py:124-235)
and post-processes: entity-name fuzzy resolution exact-lower -> simplified
-> substring containment (:333-355), date parsing (:376-392), fixed
confidence 0.85 (:323), ``valid_from = timestamp or now()`` (:322) — our
determinism rule replaces ``now()`` with the page's ``warc_ts``
(SURVEY.md §7.5), and exact dedup on (source, target, lower(relationship))
merging source_chunks / max confidence / longest description (:430-467).

This module is the deterministic pattern-based stand-in (SURVEY.md §5.2):
sentence-level regex templates over the chunk text, restricted to the
entities already found in the chunk (the reference's containment join,
ingestion/pipeline.py:369-390, requires >= 2 entities per chunk). The
description is the matched sentence — deterministic where the reference's
is LLM prose.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

from .dates import fiscal_period_end, parse_date
from .normalize import simplify_entity_name


RELATION_CONFIDENCE = 0.85  # reference relation_extractor.py:323

# Entity-shaped capture: a sequence of capitalized tokens (connectors
# of/and/for/the allowed inside). A token may end with "." ("Inc.") but a
# sequence never continues past a "." (negative lookbehind), so captures do
# not cross sentence boundaries. Patterns run over the WHOLE chunk text —
# like the reference LLM, which sees text[:4000] per call
# (relation_extractor.py:150) — because the canonical sentence splitter
# breaks after abbreviations like "Inc.".
_TOK = r"[A-Z][\w&\-']*\.?"
_ENT = rf"(?:{_TOK})(?:(?<!\.)[ \t]+(?:(?:of|and|for|the)[ \t]+)?(?:{_TOK}))*"
_MONEY = r"\$[\d,]+(?:\.\d+)?(?:\s(?:million|billion|trillion))?"

# (pattern, label, anchor literal): the anchor MUST appear in any match of
# its pattern, so a cheap substring test gates the expensive regex scan
_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(rf"(?P<s>{_ENT})\s+founded\s+(?P<t>{_ENT})\s+in\s+(?P<ts>(?:19|20)\d{{2}})"),
     "founded"),
    (re.compile(rf"(?P<s>{_ENT})\s+acquired\s+(?P<t>{_ENT})\s+on\s+(?P<ts>\d{{4}}-\d{{2}}-\d{{2}})"),
     "acquired"),
    (re.compile(rf"(?P<s>{_ENT})\s+acquired\s+(?P<t>{_ENT})\s+in\s+(?P<ts>(?:19|20)\d{{2}})"),
     "acquired"),
    (re.compile(rf"(?P<s>{_ENT})\s+is\s+headquartered\s+in\s+(?P<t>{_ENT})"),
     "headquartered in"),
    (re.compile(rf"(?P<s>{_ENT})\s+is\s+the\s+CEO\s+of\s+(?P<t>{_ENT})"),
     "CEO of"),
    (re.compile(rf"(?P<s>{_ENT})\s+partnered\s+with\s+(?P<t>{_ENT})(?:\s+in\s+(?P<ts>(?:19|20)\d{{2}}))?"),
     "partnered with"),
    (re.compile(rf"(?P<s>{_ENT})\s+reported\s+(?:revenue|sales)\s+of\s+(?P<t>{_MONEY})\s+in\s+(?P<q>Q[1-4])\s+(?P<y>\d{{4}})"),
     "reported revenue"),
    (re.compile(rf"(?P<s>{_ENT})\s+joined\s+(?P<t>{_ENT})\s+in\s+(?P<ts>(?:19|20)\d{{2}})"),
     "joined"),
    (re.compile(rf"(?P<s>{_ENT})\s+invested\s+in\s+(?P<t>{_ENT})(?:\s+in\s+(?P<ts>(?:19|20)\d{{2}}))?"),
     "invested in"),
]


_ANCHORS = {
    "founded": "founded",
    "acquired": "acquired",
    "headquartered in": "headquartered",
    "CEO of": "CEO",
    "partnered with": "partnered",
    "reported revenue": "reported",
    "joined": "joined",
    "invested in": "invested",
}


@dataclass(frozen=True)
class Quad:
    source: str  # resolved entity name (as extracted, pre-canonicalization)
    target: str
    relationship: str
    timestamp: datetime | None
    description: str


def build_entity_lookup(entity_names: list[str]) -> dict[str, str]:
    """name-variant (lowered) -> entity name.

    Replicates relation_extractor.py:97-104: exact lowered name plus the
    simplified form. Later entries do not overwrite earlier ones so the
    first-listed entity wins ties, matching dict-insertion semantics.
    """
    lookup: dict[str, str] = {}
    for name in entity_names:
        lookup.setdefault(name.lower(), name)
        simplified = simplify_entity_name(name)
        if simplified:
            lookup.setdefault(simplified.lower(), name)
    return lookup


def find_entity(name: str, lookup: dict[str, str]) -> str | None:
    """Fuzzy resolve (relation_extractor.py:333-355): exact lower ->
    simplified -> substring containment either direction (first hit in
    lookup insertion order)."""
    name_lower = name.lower().strip()
    if name_lower in lookup:
        return lookup[name_lower]
    simplified = simplify_entity_name(name)
    if simplified and simplified.lower() in lookup:
        return lookup[simplified.lower()]
    for key, entity_name in lookup.items():
        if name_lower in key or key in name_lower:
            return entity_name
    return None


def extract_quads(
    text: str,
    entity_names: list[str],
    default_valid_from: datetime,
) -> list[dict]:
    """Extract temporal quadruples from one chunk.

    Returns rows ``{source, target, relationship, timestamp, valid_from,
    description, confidence}``; requires >= 2 entities (reference
    relation_extractor.py:90-91). ``valid_from = timestamp or
    default_valid_from`` where default_valid_from is the page's warc_ts
    (determinism rule replacing the reference's datetime.now()).
    """
    if not text or text.isspace() or len(entity_names) < 2:
        return []
    # built lazily on the first actual pattern match: most chunks fail
    # every anchor gate (or match nothing), and the lookup dict is pure
    lookup: dict[str, str] | None = None
    out: list[dict] = []
    for pattern, label in _PATTERNS:
        anchor = _ANCHORS.get(label)
        if anchor is not None and anchor not in text:
            continue
        for m in pattern.finditer(text):
            if lookup is None:
                lookup = build_entity_lookup(entity_names)
            gd = m.groupdict()
            source = find_entity(gd["s"].strip(), lookup)
            target = find_entity(gd["t"].strip(), lookup)
            if not source or not target or source == target:
                continue
            if gd.get("q") and gd.get("y"):
                ts = fiscal_period_end(int(gd["y"]), gd["q"])
            else:
                ts = parse_date(gd.get("ts"))
            out.append({
                "source": source,
                "target": target,
                "relationship": label,
                "timestamp": ts,
                "valid_from": ts or default_valid_from,
                "description": m.group(0),
                "confidence": RELATION_CONFIDENCE,
            })
    return out


def merge_duplicate_relations(
    rows: list[dict],
    key_fields: tuple[str, str] = ("source", "target"),
    max_source_chunks: int | None = None,
    rel_field: str = "relationship",
) -> list[dict]:
    """Exact dedup on (source, target, lower(relationship)).

    Reference semantics (relation_extractor.py:430-467): first occurrence
    wins, source_chunks unioned in insertion order, confidence = max,
    description replaced only when strictly longer. For distributed
    determinism this engine defines the merged description as the longest
    with lexicographically-smallest tiebreak, valid_from as the minimum —
    order-insensitive, so the groupby-based merge matches the oracle
    regardless of block order (deviation documented in SURVEY.md §7.5).
    Each input row carries ``source_chunks: list[str]``.
    """
    merged: dict[tuple, dict] = {}
    kf_s, kf_t = key_fields
    for row in rows:
        key = (row[kf_s], row[kf_t], row[rel_field].lower())
        cur = merged.get(key)
        if cur is None:
            cur = dict(row)
            # set-union: hub-pair edges accumulate many chunk ids and a
            # list-membership scan would be quadratic per hot key
            cur["source_chunks"] = set(row.get("source_chunks", []))
            merged[key] = cur
            continue
        cur["source_chunks"].update(row.get("source_chunks", []))
        cur["confidence"] = max(cur["confidence"], row["confidence"])
        rd, cd = row["description"], cur["description"]
        # longest wins; equal length -> lexicographically smaller wins
        if len(rd) > len(cd) or (len(rd) == len(cd) and rd < cd):
            cur["description"] = rd
        if row["valid_from"] is not None and (
            cur["valid_from"] is None or row["valid_from"] < cur["valid_from"]
        ):
            cur["valid_from"] = row["valid_from"]
    out = list(merged.values())
    for row in out:
        sc = sorted(row["source_chunks"])
        # deterministic provenance cap (smallest-N ids). Safe under
        # partial->global re-merging: any id in the global smallest-N is in
        # its partial's smallest-N, so capping partials never loses it.
        if max_source_chunks is not None:
            sc = sc[:max_source_chunks]
        row["source_chunks"] = sc
    return out
