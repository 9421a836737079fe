"""Corpus curation: the composed training-data pipeline.

What a 100 TB pretraining-data run does with this engine's operators, as
one Dataset flow (each stage is independently tested; this composes them
in the standard curation order so a user gets the whole story in one
call):

    read documents
      -> optional CCNet paragraph dedup (``paragraph_dedup_sep``):
         repeated paragraphs drop corpus-wide before any signal is
         computed (stages/paradedup.py; CCNet's ordering — downstream
         filters must see the deduped text)
      -> optional ExactSubstr span removal (``substring_removal_window``):
         non-first occurrences of duplicated >= w-token windows are cut
         out of the text (stages/substring_dedup.py, Lee et al. 2021 —
         the rewrite alternative to the whole-doc cap below)
      -> ONE map_batches pass computing language id + quality signals +
         content fingerprint (text is read once; all per-doc signals come
         out of the same kernel call)
      -> filter: language allowlist, length bounds, punctuation ratio
      -> optional CCNet LM-perplexity leg (``ccnet_lm``): per-language
         head/middle/tail bucketing under a trusted-corpus LM, keep
         only ``ccnet_keep`` (stages/dsir.ccnet_buckets)
      -> exact dedup: hash-partitioned groupby(fingerprint) -> min doc_id,
         survivors selected with Ray's native LEFT SEMI hash join
      -> near-dup removal: MinHash-LSH candidates + distributed exact
         Jaccard verify; for each verified pair the larger doc_id drops
         (union-find cluster representative = min id)
      -> optional substring-duplication cap (``max_dup_fraction``): docs
         whose exact w-token duplicated-span fraction exceeds the cap
         drop (stages/substring_dedup.py — boilerplate/template filter)
      -> write curated Parquet (+ a JSON funnel report)

Scale notes: the only driver-side state is the near-dup DROP set (ids of
near-duplicate losers — a tiny fraction of the corpus by construction;
swap for a Bloom filter / anti-join at extreme dup rates). Everything
else is map_batches, one groupby, and one semi-join.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..functions.textstats import (
    detect_language,
    fingerprint,
    quality_signals,
)
from ..functions.unionfind import cluster_pairs


def _signal_stage(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = [quality_signals(t) for t in texts]
        return pa.Table.from_arrays(
            [
                batch[id_col],
                batch[text_col],
                pa.array([detect_language(t) for t in texts], pa.string()),
                pa.array([s["n_words"] for s in sigs], pa.int64()),
                pa.array([s["punct_ratio"] for s in sigs], pa.float64()),
                pa.array([fingerprint(t) for t in texts], pa.string()),
            ],
            names=[id_col, text_col, "lang_pred", "n_words",
                   "punct_ratio", "fingerprint"],
        )

    return fn


def curate_corpus(
    ds,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: set[str] | None = None,
    min_words: int = 5,
    max_punct_ratio: float = 0.3,
    jaccard_threshold: float = 0.8,
    num_bands: int = 32,
    join_partitions: int | None = None,
    max_dup_fraction: float | None = None,
    dup_window_tokens: int = 50,
    flag_broadcast_limit: int = 200_000,
    quality_model=None,
    min_quality_score: float = 0.5,
    paragraph_dedup_sep: str | None = None,
    paragraph_min_chars: int = 1,
    substring_removal_window: int | None = None,
    substring_removal_until_stable: bool = False,
    ccnet_lm=None,
    ccnet_keep: tuple = ("head", "middle"),
    fingerprint_store: str | None = None,
    neardup_store: str | None = None,
    update_stores: bool = False,
) -> dict:
    """documents Dataset -> curated Parquet under ``out_dir``; returns the
    funnel report (counts per stage)."""
    import shutil

    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..stages.dedup import minhash_verified_pairs

    # typo'd store paths must fail loudly up front: deduping against a
    # missing store silently keeps every recrawl duplicate. A missing
    # store is legitimate ONLY when update_stores will seed it (the
    # first-snapshot case).
    if (fingerprint_store is not None and not update_stores
            and not os.path.isdir(fingerprint_store)):
        raise ValueError(
            f"fingerprint_store {fingerprint_store} does not exist "
            "(pass update_stores=True to seed a new store)")
    if neardup_store is not None and not update_stores:
        from ..stages.incneardup import store_params

        if store_params(neardup_store) is None:
            raise ValueError(
                f"neardup_store {neardup_store} does not exist "
                "(pass update_stores=True to seed a new store)")

    report: dict = {}
    report["input_docs"] = ds.count()

    # optional CCNet paragraph-dedup leg, FIRST (CCNet's order: dedup
    # rewrites the text, so every downstream signal/filter must see the
    # deduped text, not the boilerplate-laden original). Docs that lose
    # every paragraph drop here.
    if paragraph_dedup_sep is not None:
        from ..stages.paradedup import dedup_paragraphs

        ds = dedup_paragraphs(
            ds.select_columns([id_col, text_col]), text_col=text_col,
            id_col=id_col, sep=paragraph_dedup_sep,
            min_chars=paragraph_min_chars).materialize()
        report["after_paragraph_dedup"] = ds.count()

    # optional ExactSubstr REMOVAL leg (Lee et al. 2021), also at the
    # head and for the same reason: it rewrites text, so every
    # downstream signal must see the cut text. Runs after paragraph
    # dedup when both are set (paragraph grain first, then spans).
    # Fully-cut docs drop here. Alternative to the max_dup_fraction CAP
    # below (cap drops whole docs; removal keeps them minus the spans).
    if substring_removal_window is not None:
        from ..stages.substring_dedup import remove_duplicate_spans

        _sr_stats: dict = {}
        ds = remove_duplicate_spans(
            ds.select_columns([id_col, text_col]), text_col=text_col,
            id_col=id_col,
            window_tokens=substring_removal_window,
            until_stable=substring_removal_until_stable,
            stats=_sr_stats).materialize()
        if _sr_stats:
            report["substring_removal_passes"] = _sr_stats["passes"]
            report["substring_removal_converged"] = _sr_stats["converged"]
        report["after_substring_removal"] = ds.count()
        report["substring_removed_tokens"] = int(
            ds.sum(on="removed_tokens") or 0)
        ds = ds.drop_columns(["removed_tokens"])

    sig = ds.map_batches(_signal_stage(text_col, id_col),
                         batch_format="pyarrow", batch_size=1024)

    langs = sorted(languages) if languages else None

    def keep_filter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["n_words"], pa.scalar(min_words)),
            pc.less_equal(t["punct_ratio"], pa.scalar(max_punct_ratio)),
        )
        if langs is not None:
            keep = pc.and_(keep, pc.is_in(t["lang_pred"],
                                          value_set=pa.array(langs)))
        return t.filter(keep)

    filtered = sig.map_batches(keep_filter,
                               batch_format="pyarrow").materialize()
    report["after_quality_filter"] = filtered.count()

    # optional model-based quality filter (the GPT-3 / CCNet classifier
    # step): a trained TextClassifierModel (or a path to a saved one)
    # scores each doc in one streaming broadcast pass; low scorers drop
    if quality_model is not None:
        from ..stages.classifier import (
            TextClassifierModel,
            filter_by_quality,
        )

        if isinstance(quality_model, str):
            quality_model = TextClassifierModel.load(quality_model)
        filtered = filter_by_quality(
            filtered, quality_model, min_quality_score,
            text_col=text_col).materialize()
        report["after_model_filter"] = filtered.count()

    # optional CCNet LM-perplexity leg (Wenzek et al. §4.4): bucket
    # docs by bits under a trusted-corpus LM (cutpoints PER predicted
    # language — lang_pred comes from the signal pass above) and keep
    # only the requested buckets (CCNet keeps head+middle). One score
    # pass for the cutpoints + one filter-in-place pass with all
    # columns passing through — no id join, nothing doc-grain resident
    # (stages/dsir.ccnet_filter; validates the keep set so a typo
    # errors instead of silently emptying the corpus).
    if ccnet_lm is not None:
        import numpy as np

        from ..stages.dsir import ccnet_filter

        counts = (np.load(ccnet_lm) if isinstance(ccnet_lm, str)
                  else ccnet_lm)
        filtered = ccnet_filter(
            filtered, counts, keep=ccnet_keep, lang_col="lang_pred",
            text_col=text_col, id_col=id_col).materialize()
        report["after_ccnet_filter"] = filtered.count()

    # exact dedup: winner per fingerprint, survivors via native semi-join
    if join_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        join_partitions = max(2, min(64, ncpu // 2))
    winners = (
        filtered.select_columns(["fingerprint", id_col])
        .groupby("fingerprint")
        .aggregate(Min(id_col, alias_name=id_col))
    )
    # repartition after the join: hash-join output carries schema-less
    # EMPTY partitions (sparse when the corpus is small relative to the
    # partition count) that poison any downstream join — repartition
    # rebuilds uniform schema'd Arrow blocks (the incneardup.py finding)
    exact_unique = (filtered.join(
        winners, "left_semi", join_partitions, on=(id_col,))
        .repartition(join_partitions).materialize())
    report["after_exact_dedup"] = exact_unique.count()

    # recurring-crawl leg 1: drop docs whose CONTENT is already in the
    # persisted fingerprint store (byte-identical recrawls of earlier
    # snapshots; stages/incdedup.py). Runs after in-corpus exact dedup
    # so the store side sees one representative per fingerprint.
    if fingerprint_store is not None:
        from ..stages.incdedup import dedup_against_store

        exact_unique = dedup_against_store(
            exact_unique, fingerprint_store, text_col=text_col,
            id_col=id_col, join_partitions=join_partitions,
            # the signal pass already computed this exact kernel —
            # don't re-md5 the whole surviving corpus
            fingerprint_col="fingerprint").materialize()
        report["after_store_exact_dedup"] = exact_unique.count()

    # near-dup: drop every cluster member except the min id. Gated the
    # same way as minhash_lsh_dedup: at or below _DRIVER_CLUSTER_MAX
    # verified pairs the cluster step is a driver union-find and the
    # drop set applies as a broadcast filter; above it (boilerplate-
    # replicated crawls where the pair set is corpus-scale) clusters
    # come from the distributed connected_components and drops apply as
    # a distributed anti-join — no step holds O(pairs) driver state.
    from ..stages import dedup as _dedup

    pairs_ds = minhash_verified_pairs(
        exact_unique, text_col=text_col, id_col=id_col,
        num_bands=num_bands, jaccard_threshold=jaccard_threshold,
        as_dataset=True).materialize()
    n_pairs = pairs_ds.count()
    report["neardup_pairs"] = n_pairs
    if n_pairs == 0:
        report["neardup_dropped"] = 0
        curated = exact_unique
    elif n_pairs <= _dedup._DRIVER_CLUSTER_MAX:
        pairs = pairs_ds.to_pandas()
        drop: set = set()
        for cluster in cluster_pairs(list(zip(pairs["a"], pairs["b"]))):
            drop.update(sorted(cluster)[1:])
        report["neardup_dropped"] = len(drop)
        drop_arr = pa.array(sorted(drop), pa.int64())
        curated = exact_unique.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t[id_col].cast(pa.int64()),
                                   value_set=drop_arr))),
            batch_format="pyarrow",
        )
    else:
        drop_ds = (_dedup._cluster_pairs_distributed(pairs_ds, id_col)
                   .map_batches(
                       lambda t: t.filter(pc.not_equal(
                           t[id_col], t["cluster_id"]))
                       .select([id_col]),
                       batch_format="pyarrow").materialize())
        report["neardup_dropped"] = drop_ds.count()
        _NKEY = "_neardup_key"
        flags = drop_ds.map_batches(
            lambda t: pa.table({_NKEY: t[id_col].cast(pa.int64())}),
            batch_format="pyarrow")
        keyed = exact_unique.map_batches(
            lambda t: t.append_column(_NKEY,
                                      t[id_col].cast(pa.int64())),
            batch_format="pyarrow")
        curated = keyed.join(
            flags, "left_anti", join_partitions,
            on=(_NKEY,)).drop_columns([_NKEY])

    # recurring-crawl leg 2: drop docs that are NEAR-copies of the
    # accumulated corpus (persisted MinHash store, stages/incneardup.py
    # — the store's own _meta.json parameters govern matching, not this
    # funnel's in-corpus num_bands). Runs after in-corpus near-dup so
    # the store comparison sees one representative per cluster.
    if neardup_store is not None:
        from ..stages.incneardup import (
            neardup_against_store,
            store_params,
        )

        curated, _nd_stats = neardup_against_store(
            curated, neardup_store, text_col=text_col, id_col=id_col,
            jaccard_threshold=jaccard_threshold,
            join_partitions=join_partitions, return_stats=True,
            **(store_params(neardup_store) or {}))
        curated = curated.materialize()
        report["store_neardup_matched"] = _nd_stats["matched"]
        report["after_store_neardup"] = curated.count()

    # optional substring-duplication leg (Lee et al. window spans):
    # docs whose exact-duplicated-token fraction exceeds the cap drop.
    # Small flag sets (the normal case — the cap targets boilerplate
    # outliers) apply as a broadcast is_in filter; above the gate
    # (e.g. a user setting max_dup_fraction low on a template-heavy
    # corpus) the flags stay dataset-resident and apply via a
    # distributed anti-join, so driver memory never depends on how
    # many docs the cap flags.
    if max_dup_fraction is not None:
        from ..stages.substring_dedup import substring_dup_stats

        stats = substring_dup_stats(
            curated, window_tokens=dup_window_tokens,
            text_col=text_col, id_col=id_col)
        flagged_ds = stats.map_batches(
            lambda t: t.filter(pc.greater(
                t["dup_fraction"], pa.scalar(max_dup_fraction)))
            .select([id_col]),
            batch_format="pyarrow").materialize()
        n_flagged = flagged_ds.count()
        report["substring_dup_dropped"] = n_flagged
        if 0 < n_flagged <= flag_broadcast_limit:
            flagged = flagged_ds.to_pandas()
            # stats normalizes ids to string; compare in string space
            flag_arr = pa.array(sorted(flagged[id_col]), pa.string())
            curated = curated.map_batches(
                lambda t: t.filter(
                    pc.invert(pc.is_in(t[id_col].cast(pa.string()),
                                       value_set=flag_arr))),
                batch_format="pyarrow",
            )
        elif n_flagged:
            import ray

            _SKEY = "_substr_flag_key"
            flags = flagged_ds.map_batches(
                lambda t: pa.table({
                    _SKEY: t[id_col].cast(pa.string())}),
                batch_format="pyarrow")
            keyed = curated.map_batches(
                lambda t: t.append_column(
                    _SKEY, t[id_col].cast(pa.string())),
                batch_format="pyarrow")
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            curated = keyed.join(
                flags, "left_anti", max(2, min(64, ncpu // 2)),
                on=(_SKEY,)).drop_columns([_SKEY])

    shutil.rmtree(out_dir, ignore_errors=True)
    from ..stages.blocks import coalesce_blocks

    coalesce_blocks(
        curated.select_columns([id_col, text_col, "lang_pred", "n_words"])
    ).write_parquet(out_dir)
    report["curated_docs"] = rd.read_parquet(out_dir).count()

    # append the FINAL curated docs to the persisted stores, so the
    # next snapshot's funnel dedups against this one (only docs that
    # SURVIVED curation enter the stores — rejected docs must not
    # suppress future content)
    if update_stores and (fingerprint_store or neardup_store):
        final = rd.read_parquet(out_dir)
        if fingerprint_store:
            from ..stages.incdedup import write_fingerprint_store

            write_fingerprint_store(final, fingerprint_store,
                                    text_col=text_col, id_col=id_col)
        if neardup_store:
            from ..stages.incneardup import (
                store_params,
                write_neardup_store,
            )

            write_neardup_store(final, neardup_store,
                                text_col=text_col, id_col=id_col,
                                **(store_params(neardup_store) or {}))
        report["stores_updated"] = True

    with open(os.path.join(out_dir, "_curation_report.json"), "w") as f:
        json.dump(report, f)
    return report
