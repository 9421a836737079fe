"""PII scrubbing stage over a documents table (scale addition).

Pure per-batch map — no shuffle, no state — so it streams at any corpus
size. The regexes are module-level compiled (once per worker process, not
per batch). Exact DuckDB oracle: ``functions.pii.pii_redact_sql`` /
``pii_count_sql`` (see tests/test_pii.py).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.pii import PII_TYPES, count_pii, redact_pii


def pii_stage(ds, text_col: str = "text", id_col: str = "doc_id",
              redact: bool = True):
    """Per-doc PII counts (on the original text, per type, matching the
    regexp_extract_all oracle) plus, when ``redact``, the rewritten text
    and the total number of inserted redaction tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        counts = [count_pii(t or "") for t in texts]
        arrays = [batch[id_col]]
        names = [id_col]
        for name in PII_TYPES:
            arrays.append(pa.array([c[name] for c in counts], pa.int64()))
            names.append(f"pii_{name}")
        if redact:
            red = [redact_pii(t or "") for t in texts]
            arrays.append(pa.array([r[0] for r in red], pa.string()))
            names.append("text_redacted")
            arrays.append(pa.array([sum(r[1].values()) for r in red],
                                   pa.int64()))
            names.append("pii_redactions")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)
