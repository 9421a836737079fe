"""Dataset card: the one-call corpus audit a data engineer runs before
committing a training mix (a composition of already-tested operators —
nothing here computes anything new).

``build_datacard(docs)`` returns one JSON-able dict:

- ``rows`` / ``columns``: shape;
- ``profile``: per-column nulls/min/max/moments/HLL-distinct/top-k
  (stages/profile.py — one streaming AggregateFnV2 pass);
- ``language_mix``: docs per predicted language (bounded groupby over
  the langid signal);
- ``text``: corpus-level token/char totals + per-doc means and exact
  p50/p95 token quantiles (bounded: token counts are small ints);
- ``duplication``: exact-duplicate fraction (distinct fingerprints vs
  rows, one grouped count) and the pre-shuffle skew factor of the
  fingerprint key (stages/profile.skew_report sketch mode);
- ``flags``: loud booleans a reviewer scans first (high_dup_fraction,
  dominant_language, empty_docs).

Scale: every section is a streaming pass or a bounded aggregate; the
driver holds only the card dict. The card deliberately REUSES the
operators' own scale designs rather than re-deriving statistics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def build_datacard(docs, text_col: str = "text",
                   id_col: str = "doc_id") -> dict:
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..stages.profile import profile_columns, skew_report
    from ..stages.quantiles import exact_quantiles
    from ..stages.textstats import text_stats_stage

    docs = docs.materialize()  # several consumers; corpus-sized, spills
    n_rows = docs.count()
    schema = docs.schema()
    card: dict = {"rows": n_rows, "columns": list(schema.names)}
    if n_rows == 0:
        card.update({"profile": {}, "language_mix": {}, "text": {},
                     "duplication": {}, "flags": {"empty": True}})
        return card

    card["profile"] = profile_columns(docs)

    # ONE merged text pass feeds language mix, dup accounting AND the
    # token stats (text_stats_stage already bundles all three signals)
    stats = text_stats_stage(docs, text_col=text_col,
                             id_col=id_col).materialize()
    lang_counts = (stats.groupby("lang_pred").aggregate(
        Count(alias_name="n")).to_pandas())
    card["language_mix"] = dict(
        sorted(zip(lang_counts["lang_pred"],
                   lang_counts["n"].astype(int)),
               key=lambda kv: -kv[1]))
    tok_total = int(stats.sum(on="n_tokens") or 0)
    chars_total = int(stats.sum(on="n_chars") or 0)
    qs = exact_quantiles(stats, "n_tokens", qs=[0.5, 0.95])
    card["text"] = {
        "total_tokens": tok_total,
        "total_chars": chars_total,
        "mean_tokens_per_doc": round(tok_total / n_rows, 2),
        "p50_tokens": int(qs["value"].iloc[0]),
        "p95_tokens": int(qs["value"].iloc[1]),
        "empty_docs": stats.map_batches(
            lambda t: t.filter(pc.equal(t["n_tokens"], 0)),
            batch_format="pyarrow").count(),
    }

    distinct_fp = (stats.map_batches(
        lambda t: t.select(["fingerprint"]), batch_format="pyarrow")
        .groupby("fingerprint").aggregate(Count(alias_name="n"))
        .aggregate(Sum("n", alias_name="rows"),
                   Count(alias_name="distinct")))
    dup_fraction = 1.0 - distinct_fp["distinct"] / max(
        distinct_fp["rows"], 1)
    skew = skew_report(stats.select_columns(["fingerprint"]),
                       "fingerprint")
    card["duplication"] = {
        "exact_dup_fraction": round(float(dup_fraction), 4),
        "distinct_texts": int(distinct_fp["distinct"]),
        "fingerprint_skew_factor": round(
            float(skew["skew_factor"]), 2),
    }

    top_lang_share = (max(card["language_mix"].values()) / n_rows
                      if card["language_mix"] else 0.0)
    card["flags"] = {
        "high_dup_fraction": bool(dup_fraction > 0.2),
        "dominant_language": bool(top_lang_share > 0.95),
        "empty_docs": bool(card["text"]["empty_docs"] > 0),
    }
    return card
