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
- ``near_dup``: MinHash-LSH near-duplicate fraction on a deterministic
  md5-fraction SAMPLE of the corpus (stages/sampling.sample_fraction +
  stages/dedup.minhash_lsh_dedup — the fraction of sampled docs a
  near-dup pass would drop; sampled so the card stays one bounded call
  at any corpus size). The in-sample value is a LOWER BOUND when
  frac<1 (a dup is detected only if a partner co-survives the
  sample), so the section reports both it and the observed/frac
  corrected estimate the flag fires on — see the inline note;
- ``pii``: per-type PII match totals and the fraction of docs with any
  match (stages/pii.pii_stage — exact regexp_extract_all oracle);
- ``flags``: loud booleans a reviewer scans first (high_dup_fraction,
  high_near_dup, pii_present, dominant_language, empty_docs).

Scale: every section is a streaming pass or a bounded aggregate; the
driver holds only the card dict. The card deliberately REUSES the
operators' own scale designs rather than re-deriving statistics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _near_dup_section(docs, text_col: str, id_col: str,
                      neardup_sample_max: int, neardup_jaccard: float,
                      seed: int, n_rows: int) -> tuple[dict, float]:
    """near-dup fraction on a deterministic md5 sample: the fraction of
    sampled docs a MinHash-LSH near-dup pass (the production operator,
    not a re-derivation) would drop.

    Sampling note: a sampled doc is DETECTED as a near-dup only when a
    cluster partner also survived the sample, so the raw in-sample
    fraction scales with sample_fraction for pair-grain dup clusters
    (detection prob ~ frac per partner) and is a LOWER BOUND, not an
    estimate. The card therefore also reports the Horvitz-Thompson-
    style correction observed/frac — exact at frac=1, unbiased for
    pair clusters, an overestimate for large clusters — and the
    high_near_dup flag fires on the corrected estimate so a 20%-dup
    corpus cannot read as clean just because the sample was thin."""
    from ..stages.dedup import minhash_lsh_dedup
    from ..stages.sampling import sample_fraction

    frac = min(1.0, neardup_sample_max / n_rows)
    sample = docs.select_columns([id_col, text_col])
    if frac < 1.0:
        sample = sample_fraction(sample, frac, id_col, seed=seed)
    sample = sample.materialize()
    m = sample.count()
    clusters = minhash_lsh_dedup(sample, text_col=text_col,
                                 id_col=id_col,
                                 jaccard_threshold=neardup_jaccard)
    n_members = len(clusters)
    n_clusters = (clusters["cluster_id"].nunique() if n_members else 0)
    near_dropped = n_members - n_clusters
    near_frac = near_dropped / m if m else 0.0
    est_frac = min(1.0, near_frac / frac) if frac else 0.0
    return {
        "sample_docs": int(m),
        "sample_fraction": round(float(frac), 4),
        "jaccard_threshold": neardup_jaccard,
        "near_dup_docs": int(near_dropped),
        # measured within the sample — a lower bound below frac=1
        "near_dup_fraction_sampled": round(float(near_frac), 4),
        # observed/frac correction (pair-cluster assumption; ==
        # the sampled value when the whole corpus was scanned)
        "est_near_dup_fraction": round(float(est_frac), 4),
    }, est_frac


def _pii_section(docs, text_col: str, id_col: str,
                 n_rows: int) -> tuple[dict, int]:
    """PII: one streaming regex pass; totals per type + docs-with-any."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.pii import PII_TYPES
    from ..stages.pii import pii_stage

    pii = pii_stage(docs, text_col=text_col, id_col=id_col,
                    redact=False).materialize()
    agg = pii.aggregate(*[Sum(f"pii_{n}", alias_name=n)
                          for n in PII_TYPES])
    pii_counts = {n: int(agg[n] or 0) for n in PII_TYPES}

    def _any_pii(t: pa.Table) -> pa.Table:
        mask = None
        for n in PII_TYPES:
            m_ = pc.greater(t[f"pii_{n}"], pa.scalar(0))
            mask = m_ if mask is None else pc.or_(mask, m_)
        return t.filter(mask).select([id_col])

    docs_with_pii = pii.map_batches(_any_pii,
                                    batch_format="pyarrow").count()
    return {
        "counts": pii_counts,
        "docs_with_pii": int(docs_with_pii),
        "docs_with_pii_fraction": round(docs_with_pii / n_rows, 4),
    }, int(docs_with_pii)


def build_datacard(docs, text_col: str = "text",
                   id_col: str = "doc_id",
                   neardup_sample_max: int = 20_000,
                   neardup_jaccard: float = 0.8,
                   seed: int = 0) -> dict:
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
                     "duplication": {}, "near_dup": {}, "pii": {},
                     "flags": {"empty": True}})
        return card

    # ONE merged text pass feeds language mix, dup accounting AND the
    # token stats (text_stats_stage already bundles all three signals)
    stats = text_stats_stage(docs, text_col=text_col,
                             id_col=id_col).materialize()

    # the sections below are independent reads of the two materialized
    # datasets — run them as CONCURRENT Ray jobs (the mixture.py
    # concurrent-count pattern) so the card's wall time is the slowest
    # section, not the sum of eight sequential job waves
    def _lang_mix():
        lang_counts = (stats.groupby("lang_pred").aggregate(
            Count(alias_name="n")).to_pandas())
        return dict(
            sorted(zip(lang_counts["lang_pred"],
                       lang_counts["n"].astype(int)),
                   key=lambda kv: -kv[1]))

    def _totals():  # one fused aggregate, not two sum jobs
        agg = stats.aggregate(Sum("n_tokens", alias_name="tok"),
                              Sum("n_chars", alias_name="chars"))
        return int(agg["tok"] or 0), int(agg["chars"] or 0)

    def _quantiles():
        return exact_quantiles(stats, "n_tokens", qs=[0.5, 0.95])

    def _empty_docs():
        return stats.map_batches(
            lambda t: t.filter(pc.equal(t["n_tokens"], 0)),
            batch_format="pyarrow").count()

    def _distinct_fp():
        return (stats.map_batches(
            lambda t: t.select(["fingerprint"]), batch_format="pyarrow")
            .groupby("fingerprint").aggregate(Count(alias_name="n"))
            .aggregate(Sum("n", alias_name="rows"),
                       Count(alias_name="distinct")))

    def _skew():
        return skew_report(stats.select_columns(["fingerprint"]),
                           "fingerprint")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=9) as pool:
        f_profile = pool.submit(profile_columns, docs)
        f_lang = pool.submit(_lang_mix)
        f_totals = pool.submit(_totals)
        f_qs = pool.submit(_quantiles)
        f_empty = pool.submit(_empty_docs)
        f_fp = pool.submit(_distinct_fp)
        f_skew = pool.submit(_skew)
        f_near = pool.submit(
            _near_dup_section, docs, text_col, id_col,
            neardup_sample_max, neardup_jaccard, seed, n_rows)
        f_pii = pool.submit(_pii_section, docs, text_col, id_col,
                            n_rows)
        card["profile"] = f_profile.result()
        card["language_mix"] = f_lang.result()
        tok_total, chars_total = f_totals.result()
        qs = f_qs.result()
        empty_docs = f_empty.result()
        distinct_fp = f_fp.result()
        skew = f_skew.result()
        near_dup, est_frac = f_near.result()
        pii_card, docs_with_pii = f_pii.result()

    card["text"] = {
        "total_tokens": tok_total,
        "total_chars": chars_total,
        "mean_tokens_per_doc": round(tok_total / n_rows, 2),
        "p50_tokens": int(qs["value"].iloc[0]),
        "p95_tokens": int(qs["value"].iloc[1]),
        "empty_docs": empty_docs,
    }

    dup_fraction = 1.0 - distinct_fp["distinct"] / max(
        distinct_fp["rows"], 1)
    card["duplication"] = {
        "exact_dup_fraction": round(float(dup_fraction), 4),
        "distinct_texts": int(distinct_fp["distinct"]),
        "fingerprint_skew_factor": round(
            float(skew["skew_factor"]), 2),
    }
    card["near_dup"] = near_dup
    card["pii"] = pii_card

    top_lang_share = (max(card["language_mix"].values()) / n_rows
                      if card["language_mix"] else 0.0)
    card["flags"] = {
        "high_dup_fraction": bool(dup_fraction > 0.2),
        "high_near_dup": bool(est_frac > 0.2),
        "pii_present": bool(docs_with_pii > 0),
        "dominant_language": bool(top_lang_share > 0.95),
        "empty_docs": bool(card["text"]["empty_docs"] > 0),
    }
    return card
