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
        join_partitions = _default_join_partitions()
    rows = docs.join(assign, "inner", join_partitions, on=(id_col,))

    # sequence-grain deterministic shuffle (stages/shuffle.py contract,
    # secondary order doc_id so a sequence's docs stay in pack order)
    add_rank = _rank_shard_fn(seed, num_shards)

    def sort_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_rank", _SEQ, id_col], kind="mergesort",
                          ignore_index=True)
        g["pos"] = range(len(g))
        return g.drop(columns=["_rank"])

    if output_format == "jsonl":
        # the shard group task sorts AND writes its own file: one task
        # per shard end-to-end, same resumability grain as the Hive
        # dirs, no whole-output pass through the driver
        # NOTE: each shard task writes to its local filesystem — on a
        # multi-node cluster out_dir must be shared storage (NFS/S3
        # mount), same contract as the neo4j_export sink.
        def sort_and_write_jsonl(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({"shard": pd.array([], "int64"),
                                     "rows": pd.array([], "int64")})
            g = sort_shard(g)
            shard = int(g["shard"].iloc[0])
            d = os.path.join(out_dir, f"shard={shard}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, ".part-0.jsonl.tmp")
            # double_precision=15: pandas' default (10) silently rounds
            # float columns a library caller passes through the export
            g.drop(columns=["shard"]).to_json(tmp, orient="records",
                                              lines=True,
                                              force_ascii=False,
                                              double_precision=15)
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


def _rank_shard_fn(seed: int, num_shards: int):
    """Shared md5 sequence-rank + shard assignment (the shuffle contract
    both export paths must agree on — one definition, not two)."""

    def add_rank(t: pa.Table) -> pa.Table:
        h = _md5_rank(t[_SEQ].to_pylist(), seed)
        shard = [int(x[:4], 16) * num_shards >> 16 for x in h]
        t = t.append_column("_rank", pa.array(h, pa.string()))
        return t.append_column("shard", pa.array(shard, pa.int32()))

    return add_rank


def _default_join_partitions() -> int:
    """House join sizing: the hash join spins up join_partitions
    aggregator actors and more than the cluster's CPUs deadlocks
    resource scheduling (decontaminate.py/kg.py/incdedup.py)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(64, ncpu // 2))


def export_tokenized(docs, merges, out_dir: str, *,
                     seq_budget: int = 2048, seed: int = 0,
                     num_shards: int = 16, text_col: str = "text",
                     id_col: str = "doc_id", pack_buckets: int = 64,
                     join_partitions: int | None = None,
                     normalize: bool = True,
                     encode_concurrency: int = 8) -> dict:
    """The final training artifact: BPE token IDS packed into
    sequences — one ``list<int32>`` row per packed sequence, shuffled
    and sharded like :func:`export_training_data`.

    Pipeline (every stage an already-tested operator):

    1. unicode normalization (same default as the text export, so the
       same corpus tokenizes identically on both paths), then ONE BPE
       encode pass (stages/bpe.BpeEncodeStage actor pool, merge table
       + word memo pinned per actor; task-mode fallback on a 1-CPU
       cluster where a fixed pool would starve the read operator);
    2. MODEL-DERIVED piece->id vocab: the id space is the tokenizer's
       closed piece universe — the [a-z0-9] alphabet, the </w> marker
       and every merge product — NOT corpus-observed pieces, so two
       corpora exported with the same saved model get identical ids
       (``<eos>`` is id 0, pieces sorted from 1);
    3. NEXT-FIT packing on the BPE length ``n_pieces + 1`` (each doc
       is followed by one <eos>) — packing on the REAL tokenizer
       length, not a whitespace proxy;
    4. docs join their sequence slots (house hash join), sequences
       md5-shuffle into shards, and each shard's group task emits one
       row per sequence: ids = concat(doc ids + [eos]) in doc-id
       order. A doc longer than ``seq_budget`` sits alone and keeps
       its full length (lossless; ``oversized_sequences`` in the
       manifest counts them — truncation is the trainer's choice).

    Returns the manifest (docs, sequences, vocab size, fill stats,
    oversized_sequences); shards land as ``shard=K/`` Parquet of
    (seq_key, n_ids, ids) with int64 list offsets (a shard group past
    2^31 total ids must not wrap).
    """
    import shutil
    import string

    import numpy as np
    import ray

    from ..stages.blocks import coalesce_blocks
    from ..stages.bpe import EOW, BpeModel, apply_bpe
    from ..stages.packing import pack_sequences

    shutil.rmtree(out_dir, ignore_errors=True)
    model = BpeModel(merges=[tuple(p) for p in merges])
    if normalize:
        docs = normalize_text_stage(docs, text_col=text_col)
    # clamp the fixed actor pool BELOW the cluster CPU count: a pool
    # taking every CPU starves the upstream read/map task operators and
    # the pipeline deadlocks (observed at pool=4 on a 4-CPU cluster).
    # On a 1-CPU cluster no pool size works — fall back to task mode.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if ncpu < 2:
        from ..stages.bpe import BpeEncodeStage

        stage = BpeEncodeStage(model.merges, text_col=text_col,
                               id_col=id_col)
        encoded = (docs.select_columns([id_col, text_col])
                   .map_batches(stage, batch_format="pyarrow",
                                batch_size=256).materialize())
    else:
        encoded = apply_bpe(
            docs, model, text_col=text_col, id_col=id_col,
            concurrency=min(encode_concurrency,
                            max(1, ncpu - 1))).materialize()

    # model-derived id space: closed under encode_word by construction
    # (every output symbol is a single [a-z0-9] char, the EOW marker,
    # or a merge product)
    eos_id = 0
    universe = sorted(set(string.ascii_lowercase + string.digits)
                      | {EOW} | set(model.vocab()))
    piece_id = {p: i + 1 for i, p in enumerate(universe)}

    def with_len(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            id_col: t[id_col],
            "n_tok": pc.add(t["n_pieces"], pa.scalar(1))})  # + <eos>

    packed = pack_sequences(
        encoded.map_batches(with_len, batch_format="pyarrow"),
        seq_budget, id_col=id_col, tokens_col="n_tok",
        buckets=pack_buckets).materialize()

    def add_seq_key(t: pa.Table) -> pa.Table:
        keys = [f"{b}:{s}" for b, s in zip(t["bucket"].to_pylist(),
                                           t["seq"].to_pylist())]
        return pa.table({id_col: t[id_col],
                         _SEQ: pa.array(keys, pa.string())})

    assign = packed.map_batches(add_seq_key, batch_format="pyarrow")
    if join_partitions is None:
        join_partitions = _default_join_partitions()

    # Arrow's hash join rejects list-typed non-key columns, so pieces
    # ride through the join as ONE \x00-delimited large_string blob per
    # doc (pieces are _TOKEN_RE words-fragments — never contain \x00)
    def blob_pieces(t: pa.Table) -> pa.Table:
        blobs = ["\x00".join(p) for p in t["pieces"].to_pylist()]
        return pa.table({
            id_col: t[id_col],
            "pieces_blob": pa.array(blobs, pa.large_string())})

    rows = (encoded.map_batches(blob_pieces, batch_format="pyarrow")
            .join(assign, "inner", join_partitions, on=(id_col,)))

    pid_ref = ray.put(piece_id)
    add_rank = _rank_shard_fn(seed, num_shards)

    def assemble(g: pd.DataFrame) -> pa.Table:
        pid = ray.get(pid_ref)
        g = g.sort_values(["_rank", _SEQ, id_col], kind="mergesort",
                          ignore_index=True)
        out_key, out_ids = [], []
        for key, grp in g.groupby(_SEQ, sort=False):
            ids: list[int] = []
            for blob in grp["pieces_blob"]:
                if blob:
                    ids.extend(pid[p] for p in blob.split("\x00"))
                ids.append(eos_id)
            out_key.append(key)
            out_ids.append(np.asarray(ids, dtype=np.int32))
        # emit PLAIN list<int32> (zero-copy offsets+values) — returning
        # numpy arrays in a pandas column would make Ray write its
        # tensor-extension struct type, which downstream parquet
        # readers don't understand. Offsets are int64 (LargeList): a
        # shard group past 2^31 total ids must not wrap.
        lens = np.fromiter((len(x) for x in out_ids), np.int64,
                           len(out_ids))
        flat = (np.concatenate(out_ids) if out_ids
                else np.empty(0, np.int32))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int64),
            pa.int64())
        shard = int(g["shard"].iloc[0]) if len(g) else 0
        n = len(out_key)
        return pa.table({
            "seq_key": pa.array(out_key, pa.string()),
            "n_ids": pa.array(lens, pa.int64()),
            "ids": pa.LargeListArray.from_arrays(
                offsets, pa.array(flat, pa.int32())),
            "shard": pa.array(np.full(n, shard, dtype=np.int32)),
            "pos": pa.array(np.arange(n, dtype=np.int64)),
        })

    shards = (rows.map_batches(add_rank, batch_format="pyarrow")
              .groupby("shard")
              .map_groups(assemble, batch_format="pandas"))
    coalesce_blocks(shards).write_parquet(out_dir,
                                          partition_cols=["shard"])

    n_docs = encoded.count()
    import ray.data as rd

    written = rd.read_parquet(out_dir)
    n_seqs = written.count()
    total_ids = int(written.sum(on="n_ids") or 0)
    n_over = written.filter(expr=f"n_ids > {seq_budget}").count()
    manifest = {
        "docs": n_docs,
        "sequences": n_seqs,
        "seq_budget": seq_budget,
        "total_tokens": total_ids,
        "fill_efficiency": round(total_ids / (n_seqs * seq_budget), 4)
        if n_seqs else 0.0,
        "oversized_sequences": n_over,
        "vocab_size": len(piece_id) + 1,
        "eos_id": eos_id,
        "num_shards": num_shards,
        "seed": seed,
        "normalized": normalize,
    }
    with open(os.path.join(out_dir, "_tokenized_manifest.json"),
              "w") as f:
        json.dump(manifest, f, indent=1)
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"piece": pa.array(["<eos>", *universe]),
                  "token_id": pa.array(
                      [eos_id, *[piece_id[p] for p in universe]],
                      pa.int32())}),
        os.path.join(out_dir, "_token_vocab.parquet"))
    return manifest
