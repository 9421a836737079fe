"""Evaluation-side evidence join (J6).

The reference's evaluator joins each benchmark question's evidence
documents against the ingested graph to count how much of the evidence is
actually present (/root/reference — evaluate_tkg.py:95-135 over
``data/SKX_questions.jsonl``). Rebuilt as a batch job:

    questions (question_id, url)            [small side]
    chunks    (url, chunk_id, ...)          [big side]
    mentions  (url, chunk_id, entity, ...)  [big side]

    -> per-url counts via ONE distributed groupby over the union of the
       two big tables (indicator columns, Sum aggregation)
    -> question attach via the broadcast url->question map (ray.put once,
       read per task) — the small side never shuffles
    -> (question_id, n_evidence_chunks, n_evidence_mentions, covered)

Partitioning assumption: questions fit in the object store as one
broadcast dict (they are a benchmark file, thousands of rows). The big
tables stream; the only shuffle is the url-keyed aggregate, pre-combined
per batch by Arrow group_by.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def evidence_join(questions_tbl: pa.Table, chunks_ds, mentions_ds):
    """questions (question_id, url) x chunks/mentions -> coverage table."""
    import ray
    from ray.data.aggregate import Sum

    q_urls = pa.array(sorted(set(questions_tbl["url"].to_pylist())))
    qmap_ref = ray.put(dict(zip(questions_tbl["url"].to_pylist(),
                                questions_tbl["question_id"].to_pylist())))

    def chunk_units(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["url"], value_set=q_urls))
        # map-side combine: per-batch partial counts before the shuffle
        g = t.select(["url"]).group_by("url").aggregate([([], "count_all")])
        return pa.Table.from_arrays(
            [g["url"], g["count_all"].cast(pa.int64()),
             pa.nulls(len(g), pa.int64()).fill_null(0)],
            names=["url", "c", "m"],
        )

    def mention_units(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["url"], value_set=q_urls))
        g = t.select(["url"]).group_by("url").aggregate([([], "count_all")])
        return pa.Table.from_arrays(
            [g["url"], pa.nulls(len(g), pa.int64()).fill_null(0),
             g["count_all"].cast(pa.int64())],
            names=["url", "c", "m"],
        )

    units = (
        chunks_ds.select_columns(["url"])
        .map_batches(chunk_units, batch_format="pyarrow")
        .union(mentions_ds.select_columns(["url"])
               .map_batches(mention_units, batch_format="pyarrow"))
    )
    per_url = (
        units.groupby("url")
        .aggregate(Sum("c", alias_name="n_evidence_chunks"),
                   Sum("m", alias_name="n_evidence_mentions"))
    )

    def attach(t: pa.Table) -> pa.Table:
        qmap = ray.get(qmap_ref)
        qids = pa.array([qmap[u] for u in t["url"].to_pylist()], pa.int64())
        return pa.Table.from_arrays(
            [qids,
             t["n_evidence_chunks"].cast(pa.int64()).combine_chunks(),
             t["n_evidence_mentions"].cast(pa.int64()).combine_chunks(),
             pc.greater(t["n_evidence_chunks"], 0)],
            names=["question_id", "n_evidence_chunks",
                   "n_evidence_mentions", "covered"],
        )

    found = attach  # per-url rows -> per-question rows (url is unique/question)
    joined = per_url.map_batches(found, batch_format="pyarrow").to_pandas()

    # questions with NO ingested evidence still get a row (coverage = 0) —
    # the evaluator's miss accounting
    seen = set(joined["question_id"])
    missing = [
        {"question_id": int(q), "n_evidence_chunks": 0,
         "n_evidence_mentions": 0, "covered": False}
        for q, u in zip(questions_tbl["question_id"].to_pylist(),
                        questions_tbl["url"].to_pylist())
        if int(q) not in seen
    ]
    import pandas as pd

    if missing:
        joined = pd.concat([joined, pd.DataFrame(missing)],
                           ignore_index=True)
    return joined.sort_values("question_id", ignore_index=True)
