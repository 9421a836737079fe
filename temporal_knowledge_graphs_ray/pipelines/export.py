"""End-to-end training-data export: curated documents → training
shards (scale addition — the final mile of a training pipeline; the
reference stops at graph construction, scripts/ingest_documents.py).

One call chains the tested operators:

1. unicode normalization (stages/textnorm.py, optional);
2. token counting (stages/textstats.token_stats_stage);
3. deterministic NEXT-FIT packing into token-budget sequences
   (stages/packing.pack_sequences);
4. SEQUENCE-grain deterministic shuffle — the md5 contract of
   stages/shuffle.py applied to the sequence key, with docs of one
   sequence kept adjacent and in doc-id order (a sequence is the
   atomic training unit; shuffling must not split it);
5. ordered shard Parquet (``shard=K/``, rows in (shard, pos) order),
   an optional exact-vocab sidecar (stages/vocab.py), and a JSON
   manifest with the parameters, row/sequence counts and the packing
   fill report.

Determinism: every step is a pure function of (corpus, params, seed),
so re-running the export reproduces identical shards — the resume
story is "rerun it"; a partially-written output is simply replaced.

Scale notes: two streaming text passes (normalize, token-count), the
packing groupby, one doc↔assignment hash join, the one unavoidable
shuffle exchange, and the write. Driver state: the manifest numbers.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa

from ..stages.packing import pack_sequences, packing_report_distributed
from ..stages.sampling import _md5_rank
from ..stages.textnorm import normalize_text_stage
from ..stages.textstats import token_stats_stage

_SEQ = "seq_key"


def export_training_data(docs, out_dir: str, text_col: str = "text",
                         id_col: str = "doc_id",
                         token_budget: int = 2048, seed: int = 0,
                         num_shards: int = 16, normalize: bool = True,
                         pack_buckets: int = 64,
                         vocab_size: int | None = None,
                         join_partitions: int | None = None,
                         stage_cache: str = "memory",
                         output_format: str = "parquet") -> dict:
    """Run the export; returns (and writes) the manifest dict.

    ``stage_cache``: the normalized corpus has two-or-three consumers
    (token stats, the final join, optionally vocab). "memory"
    materializes it in the object store (small/medium corpora);
    "disk" writes it to ``out_dir + ".norm"`` Parquet and re-reads —
    the 100 TB mode: nothing page-grain ever lives in the object
    store (the kg.py stage_cache rule).

    ``output_format``: "parquet" (default — ``shard=K/`` Hive dirs) or
    "jsonl" (the common LLM-training handoff): one
    ``shard=K/part-0.jsonl`` file per shard, rows in the same
    deterministic (shard, pos) order, written by the shard's own group
    task so the sink stays one-task-per-shard resumable."""
    import shutil

    from ..stages.blocks import coalesce_blocks

    if stage_cache not in ("memory", "disk"):
        raise ValueError(f"stage_cache must be 'memory' or 'disk', "
                         f"got {stage_cache!r}")
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"output_format must be 'parquet' or 'jsonl', "
                         f"got {output_format!r}")
    shutil.rmtree(out_dir, ignore_errors=True)
    if normalize:
        docs = normalize_text_stage(docs, text_col=text_col)
    if stage_cache == "disk":
        import ray.data as rd

        norm_dir = out_dir + ".norm"
        shutil.rmtree(norm_dir, ignore_errors=True)
        coalesce_blocks(docs).write_parquet(norm_dir)
        docs = rd.read_parquet(norm_dir)
    else:
        docs = docs.materialize()

    stats = token_stats_stage(docs, text_col=text_col, id_col=id_col)
    packed = pack_sequences(stats, token_budget, id_col=id_col,
                            buckets=pack_buckets).materialize()

    def add_seq_key(t: pa.Table) -> pa.Table:
        keys = [f"{b}:{s}" for b, s in zip(t["bucket"].to_pylist(),
                                           t["seq"].to_pylist())]
        return pa.table({id_col: t[id_col],
                         _SEQ: pa.array(keys, pa.string()),
                         "n_tokens": t["n_tokens"]})

    assign = packed.map_batches(add_seq_key, batch_format="pyarrow")
    if join_partitions is None:
        # the house join sizing (decontaminate.py/kg.py/incdedup.py):
        # the hash join spins up join_partitions aggregator actors and
        # more than the cluster's CPUs deadlocks resource scheduling
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        join_partitions = max(2, min(64, ncpu // 2))
    rows = docs.join(assign, "inner", join_partitions, on=(id_col,))

    # sequence-grain deterministic shuffle (stages/shuffle.py contract,
    # secondary order doc_id so a sequence's docs stay in pack order)
    def add_rank(t: pa.Table) -> pa.Table:
        h = _md5_rank(t[_SEQ].to_pylist(), seed)
        shard = [int(x[:4], 16) * num_shards >> 16 for x in h]
        t = t.append_column("_rank", pa.array(h, pa.string()))
        return t.append_column("shard",
                               pa.array(shard, pa.int32()))

    def sort_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_rank", _SEQ, id_col], kind="mergesort",
                          ignore_index=True)
        g["pos"] = range(len(g))
        return g.drop(columns=["_rank"])

    if output_format == "jsonl":
        # the shard group task sorts AND writes its own file: one task
        # per shard end-to-end, same resumability grain as the Hive
        # dirs, no whole-output pass through the driver
        def sort_and_write_jsonl(g: pd.DataFrame) -> pd.DataFrame:
            g = sort_shard(g)
            shard = int(g["shard"].iloc[0])
            d = os.path.join(out_dir, f"shard={shard}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, ".part-0.jsonl.tmp")
            g.drop(columns=["shard"]).to_json(tmp, orient="records",
                                              lines=True,
                                              force_ascii=False)
            os.replace(tmp, os.path.join(d, "part-0.jsonl"))
            return pd.DataFrame({"shard": [shard],
                                 "rows": [len(g)]})

        os.makedirs(out_dir, exist_ok=True)
        written = (rows.map_batches(add_rank, batch_format="pyarrow")
                   .groupby("shard")
                   .map_groups(sort_and_write_jsonl,
                               batch_format="pandas"))
        written.materialize()  # drive the writes
    else:
        shuffled = (rows.map_batches(add_rank, batch_format="pyarrow")
                    .groupby("shard")
                    .map_groups(sort_shard, batch_format="pandas"))

        coalesce_blocks(shuffled).write_parquet(out_dir,
                                                partition_cols=["shard"])

    # distributed report: the per-doc assignment table never lands on
    # the driver (packing_report_distributed)
    report = packing_report_distributed(packed, token_budget)
    manifest = {
        "docs": report["docs"],
        "sequences": report["sequences"],
        "token_budget": token_budget,
        "fill_efficiency": round(report["fill_efficiency"], 4),
        "oversized_docs": report["oversized_docs"],
        "num_shards": num_shards,
        "seed": seed,
        "normalized": normalize,
        "pack_buckets": pack_buckets,
        "output_format": output_format,
    }
    if vocab_size:
        from ..stages.vocab import build_vocab

        vocab = build_vocab(docs, text_col=text_col,
                            max_size=vocab_size)
        vocab.to_parquet(os.path.join(out_dir, "_vocab.parquet"),
                         index=False)
        manifest["vocab_terms"] = len(vocab)
    with open(os.path.join(out_dir, "_export_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
