"""Deterministic entity-extraction kernel (NER stand-in).

The reference extracts entities per chunk with an LLM
(/root/reference/src/temporal_kg_rag/ingestion/entity_extractor.py:156-272),
then post-processes: type whitelist of 14 NER labels with unknown -> OTHER
(entity_extractor.py:19-34, :106-107), per-chunk (name, type) dedup with
mention counting (:93-122), mention position = first case-insensitive find
else 0 (:127-129), fixed confidence 0.8 (:137).

No LLM exists in this sandbox, so this module is the pluggable deterministic
extractor that SURVEY.md §5.2 specifies: a rule-based recognizer used
IDENTICALLY by the sequential oracle and the Ray pipeline, so triple P/R vs
the oracle is measurable without a model. The post-processing contract
(whitelist, dedup, position, confidence) is the reference's, replicated
exactly.

Rules (applied in order; earlier matches shadow later ones on overlap):
  MONEY    $-amounts with optional million/billion/trillion scale
  PERCENT  12.3%
  DATE     ISO dates, "Q3 2021", bare years 19xx/20xx
  capitalized-token sequences (connectors of/and/for/the allowed inside):
    * ORGANIZATION if it carries a corporate/institution suffix token,
      is an ALL-CAPS acronym (>=2 chars), or is a CamelCase single token
    * PERSON if 2-3 purely-alphabetic title-case words AND person-cued
      (honorific prefix, or followed by a person verb, or "CEO of" style)
    * LOCATION if cued by headquartered in / based in / located in
    * otherwise ORGANIZATION for multi-word sequences, dropped for single
      common title-case words (sentence starts)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .normalize import normalize_entity_name

ENTITY_TYPES = [  # reference entity_extractor.py:19-34
    "PERSON", "ORGANIZATION", "LOCATION", "FACILITY", "DATE", "TIME",
    "MONEY", "PERCENT", "PRODUCT", "EVENT", "WORK", "LAW", "LANGUAGE",
    "GROUP",
]

MENTION_CONFIDENCE = 0.8  # reference entity_extractor.py:137

_MONEY_RE = re.compile(r"\$\d[\d,]*(?:\.\d+)?(?:\s(?:million|billion|trillion))?")
_PERCENT_RE = re.compile(r"\b\d+(?:\.\d+)?%")
_DATE_RE = re.compile(
    r"\b\d{4}-\d{2}-\d{2}\b|\bQ[1-4]\s\d{4}\b|\b(?:19|20)\d{2}\b"
)

# A capitalized token: starts uppercase, continues with word chars & - .
# Sequences join only across spaces/tabs (never newlines — extracted text is
# line-structured) and never continue past a "."-final token ("Inc." ends a
# sentence-shaped boundary), mirroring relations._ENT.
_CAP_TOKEN = r"[A-Z][A-Za-z0-9&.\-]*"
_CONNECTOR = r"(?:of|and|for|the)"
_CAPSEQ_RE = re.compile(
    rf"\b{_CAP_TOKEN}(?:(?<!\.)[ \t]+(?:{_CONNECTOR}[ \t]+)?{_CAP_TOKEN})*"
)

_ORG_SUFFIX_TOKENS = frozenset({
    "Inc", "Inc.", "Corp", "Corp.", "Corporation", "Company", "Co", "Co.",
    "LLC", "Ltd", "Ltd.", "GmbH", "AG", "Technologies", "Technology",
    "Labs", "Systems", "Institute", "University", "Group", "Holdings",
    "Partners", "Ventures", "Bank", "Capital",
})

_HONORIFICS = ("Dr.", "Mr.", "Mrs.", "Ms.", "Prof.")

_PERSON_VERBS_AFTER = re.compile(
    r"\s+(?:founded|co-founded|joined|leads|led|said|became|serves|stepped|"
    r"is\s+the\s+(?:CEO|CTO|CFO|chair|chairman|president|founder))\b"
)
_LOCATION_CUE_BEFORE = re.compile(
    r"(?:headquartered\s+in|based\s+in|located\s+in|offices\s+in|moved\s+to)\s+$"
)
_PERSON_CUE_BEFORE = re.compile(
    r"(?:CEO|CTO|CFO|founder|president|chairman|chair)\s+(?:of\s+\S+\s+)?(?:is\s+)?$"
)

# single title-case words too common to be entities (sentence starters etc.)
_COMMON_WORDS = frozenset({
    "The", "A", "An", "In", "It", "On", "At", "As", "By", "He", "She",
    "They", "We", "I", "You", "This", "That", "These", "Those", "Its",
    "His", "Her", "Their", "Our", "After", "Before", "During", "Since",
    "When", "While", "However", "Meanwhile", "Today", "Yesterday",
    "According", "Under", "Over", "From", "To", "With", "Q1", "Q2", "Q3",
    "Q4", "CEO", "CTO", "CFO",
})


@dataclass(frozen=True)
class RawMention:
    name: str
    type: str
    start: int


# The before-context cues are suffix-anchored and span at most FOUR
# whitespace-delimited tokens (person cue: cue word + "of" + \S+ + "is";
# the \S+ is unbounded in CHARS, so a fixed char window could miss a
# legal match — e.g. "CEO of <300-char-url> is John Smith"). The
# look-back start is therefore found by scanning back four tokens, which
# is O(match span), not O(position), and provably covers every possible
# match start. Using pos/endpos keeps the regexes zero-copy: ``$``
# matches at endpos exactly as at the end of the old ``text[:start]``
# slice.
_LOOKBACK_TOKENS = 4


def _lookback_start(text: str, start: int,
                    ntokens: int = _LOOKBACK_TOKENS) -> int:
    i = start
    for _ in range(ntokens):
        while i > 0 and text[i - 1].isspace():
            i -= 1
        while i > 0 and not text[i - 1].isspace():
            i -= 1
    return i


def _classify_capseq(text: str, m: re.Match) -> str | None:
    """Classify a capitalized-sequence match; None -> drop.

    The look-back window (``_lookback_start`` + a $-anchored regex) is
    only computed when a cheap NECESSARY condition of the cue regex
    holds: every _LOCATION_CUE_BEFORE alternative ends with ``in`` or
    ``to`` followed by whitespace, so the two characters before the
    match's preceding whitespace decide whether the full check can
    possibly succeed. The overwhelming majority of capitalized
    sequences fail this pre-filter, skipping the per-match text walk
    entirely — classification output is bit-identical (false positives
    fall through to the full regex; false negatives are impossible).
    """
    seq = m.group(0)
    tokens = seq.split()
    start = m.start()

    # one whitespace skip (usually a single char) shared by the cue
    # pre-filters; NOT the full 4-token walk
    i = start
    while i and text[i - 1].isspace():
        i -= 1

    if text[max(i - 2, 0):i] in ("in", "to"):
        wstart = _lookback_start(text, start)
        if _LOCATION_CUE_BEFORE.search(text, wstart, start):
            return "LOCATION"

    if any(t in _ORG_SUFFIX_TOKENS for t in tokens[1:]) or (
        len(tokens) == 1 and tokens[0] in _ORG_SUFFIX_TOKENS
    ):
        return "ORGANIZATION"

    if len(tokens) == 1:
        tok = tokens[0]
        if tok in _COMMON_WORDS:
            return None
        if len(tok) >= 2 and tok.isupper() and tok.isalpha():
            return "ORGANIZATION"  # acronym: MIT, IBM
        # CamelCase single token: internal uppercase after position 0
        if any(c.isupper() for c in tok[1:]) and any(c.islower() for c in tok):
            return "ORGANIZATION"  # OpenAI, DeepMind
        return None

    person_shaped = (
        2 <= len(tokens) <= 3
        and all(t.isalpha() and t[0].isupper() and t[1:].islower() for t in tokens)
    )
    if person_shaped:
        # honorifics all end with "."; the stripped prefix ends exactly
        # at i, so text[i-1] == "." is a necessary condition
        honorific = text[i - 1:i] == "." and text[
            max(i - 5, 0):i].endswith(_HONORIFICS)
        cued_after = honorific or bool(
            _PERSON_VERBS_AFTER.match(text, m.end()))
        if cued_after:
            return "PERSON"
        wstart = _lookback_start(text, start)
        if _PERSON_CUE_BEFORE.search(text, wstart, start):
            return "PERSON"
    return "ORGANIZATION"


def extract_raw_mentions(text: str) -> list[RawMention]:
    """All rule matches with char offsets, earlier rules shadowing later."""
    taken: list[tuple[int, int]] = []
    out: list[RawMention] = []

    def claim(start: int, end: int) -> bool:
        for s, e in taken:
            if start < e and end > s:
                return False
        taken.append((start, end))
        return True

    for regex, etype in ((_MONEY_RE, "MONEY"), (_PERCENT_RE, "PERCENT"),
                         (_DATE_RE, "DATE")):
        for m in regex.finditer(text):
            if claim(m.start(), m.end()):
                out.append(RawMention(m.group(0), etype, m.start()))

    for m in _CAPSEQ_RE.finditer(text):
        etype = _classify_capseq(text, m)
        if etype is not None and claim(m.start(), m.end()):
            out.append(RawMention(m.group(0), etype, m.start()))

    out.sort(key=lambda r: r.start)
    return out


def extract_entities(text: str) -> list[dict]:
    """Per-chunk entity extraction with the reference's post-processing.

    Returns one row per unique (name, type):
    ``{name, type, mention_count, position}`` where
    - name is normalized (entity_extractor.py:344-360 rules),
    - type falls back to OTHER when off-whitelist (:106-107),
    - position = first case-insensitive find of name in text, else 0
      (:127-129),
    - mention_count counts raw occurrences in the chunk (:122).
    """
    if not text.strip():
        return []
    by_key: dict[tuple[str, str], dict] = {}
    text_lower = text.lower()
    for raw in extract_raw_mentions(text):
        name = normalize_entity_name(raw.name)
        if not name:
            continue
        etype = raw.type if raw.type in ENTITY_TYPES else "OTHER"
        key = (name, etype)
        row = by_key.get(key)
        if row is None:
            position = text_lower.find(name.lower())
            if position == -1:
                position = 0
            by_key[key] = {
                "name": name,
                "type": etype,
                "mention_count": 1,
                "position": position,
            }
        else:
            row["mention_count"] += 1
    return list(by_key.values())
