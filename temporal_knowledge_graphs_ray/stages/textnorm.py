"""Unicode text normalization for webtext curation (scale addition —
the normalize-before-dedup step of a training pipeline; the
reference's nearest analogue is entity-name normalization in
functions/normalize.py, which this deliberately does NOT touch: that
one is calibrated to the dedup cascade, this one cleans document
text).

Pipeline (each step optional, applied in this order):
1. NFC unicode normalization — composes combining sequences so
   byte-level dedup/fingerprints see "é" and "e\\u0301" as equal;
2. control-character strip (C0 minus \\t \\n \\r \\f \\v, plus DEL);
3. whitespace collapse (runs of space/tab/newline/etc. → one space)
   and space trim.

Every step maps to one DuckDB expression over the same Parquet —
``nfc_normalize`` / ``regexp_replace(..., 'g')`` / ``trim`` — so the
rewritten column has an exact per-row SQL oracle (the stages/pii.py
discipline: regexes in the common Python-re/RE2 subset). NULL text
stays NULL, matching SQL.

Scale notes: pure streaming map, no shuffle; the regex/trim kernels
are Arrow-vectorized. The NFC step is per-row Python because this
container's pyarrow ``utf8_normalize`` does not compose (see _nfc) —
but ``unicodedata.is_normalized`` quick-checks at C speed and almost
all webtext is already NFC, so the normalize copy is rare.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# C0 controls except \t\n\r\f\v (which whitespace collapse handles),
# plus DEL. Written with \x escapes valid in both Python re and RE2.
CONTROL_RE = r"[\x00-\x08\x0E-\x1F\x7F]"
WS_RE = r"[ \t\r\n\f\v]+"


def _nfc(arr: pa.Array) -> pa.Array:
    """NFC via unicodedata: this container's pyarrow (16.1) ships a
    ``utf8_normalize`` that does NOT compose (NFC('e'+U+0301) stays
    decomposed — diverging from both Python and DuckDB), so the
    composing step runs in Python. ``is_normalized`` is a C-speed
    quick-check that skips the copy for the (vast webtext) majority
    of already-NFC strings."""
    import unicodedata as ud

    vals = arr.to_pylist()
    out = [v if v is None or ud.is_normalized("NFC", v)
           else ud.normalize("NFC", v) for v in vals]
    return pa.array(out, pa.string())


def normalize_text_kernel(arr: pa.Array, nfc: bool = True,
                          strip_control: bool = True,
                          collapse_ws: bool = True) -> pa.Array:
    arr = pc.cast(arr, pa.string())
    if nfc:
        arr = _nfc(arr)
    if strip_control:
        arr = pc.replace_substring_regex(arr, CONTROL_RE, "")
    if collapse_ws:
        arr = pc.replace_substring_regex(arr, WS_RE, " ")
        arr = pc.utf8_trim(arr, characters=" ")
    return arr


def normalize_text_stage(ds, text_col: str = "text",
                         out_col: str | None = None, nfc: bool = True,
                         strip_control: bool = True,
                         collapse_ws: bool = True):
    """Append (or replace) the normalized text column — streaming,
    vectorized, exact SQL oracle per step (see module doc)."""
    target = out_col or text_col

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_text_kernel(t[text_col], nfc=nfc,
                                     strip_control=strip_control,
                                     collapse_ws=collapse_ws)
        if target in t.column_names:
            return t.set_column(t.column_names.index(target),
                                target, norm)
        return t.append_column(target, norm)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)
