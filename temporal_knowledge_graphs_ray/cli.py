"""Command-line entry points (reference scripts/ parity).

The reference ships CLI scripts (scripts/ingest_documents.py,
consolidate_graph.py, evaluate_tkg.py); this module is their batch-engine
analog:

    python -m temporal_knowledge_graphs_ray.cli build --pages <parquet-dir> --out <dir>
    python -m temporal_knowledge_graphs_ray.cli build --from-documents /root/testdata/sf0.001 --out <dir>
    python -m temporal_knowledge_graphs_ray.cli resume --pages ... --out <dir>
    python -m temporal_knowledge_graphs_ray.cli stats --out <dir>

plus curation/maintenance subcommands: curate, compact, ingest, eval,
sample (md5-keyed fraction/stratified/weighted-without-replacement),
classify (train/apply the hashed-ngram quality classifier),
dsir (importance selection),
semdedup (embedding near-dup verdicts), dupspans (exact substring-dup
stats), analytics (degrees/triangles/k-core/components/pagerank over a
built KG), bm25 (build/query a ranked keyword index), hybrid (BM25 +
dense RRF retrieval), shuffle (deterministic md5-keyed global shuffle
into ordered shard files). Owns its Ray session (scripts are allowed
to init; the library is not).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _distinct_count(ds, col: str) -> int:
    """COUNT(DISTINCT col) without materializing the node-grain table on
    the driver: one groupby shuffle, then a row count of the (small)
    group table — driver holds a scalar."""
    return ds.groupby(col).count().count()


def _pages_dataset(args):
    import ray.data as rd

    from .sources.synth import pages_from_documents

    if args.from_documents:
        return pages_from_documents(args.from_documents,
                                    repeat=args.repeat)
    return rd.read_parquet(args.pages)


def cmd_build(args, resume: bool = False, increment: bool = False) -> int:
    from .pipelines.kg import build_kg, ingest_increment
    from .sources.synth import alias_table

    _init_ray(args.num_cpus)
    aliases = alias_table() if args.builtin_aliases else None
    if increment:
        from .pipelines.kg import ingest_increment_supersede

        fn = (ingest_increment_supersede
              if getattr(args, "supersede_recrawls", False)
              else ingest_increment)
        res = fn(_pages_dataset(args), args.out, alias_table=aliases)
    else:
        blocked = (args.blocked_domains.split(",")
                   if getattr(args, "blocked_domains", None) else None)
        res = build_kg(_pages_dataset(args), args.out,
                       alias_table=aliases, resume=resume,
                       blocked_domains=blocked)
    print(json.dumps({k: v for k, v in res.items()
                      if isinstance(v, (str, int, dict))}, default=str))
    import ray

    ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    import os

    from .state.manifests import MANIFEST_DIR, completed_parts

    out = {"out_dir": args.out}
    for table in ("chunk_ents", "mentions", "edges_raw", "edges"):
        out[table] = sorted(completed_parts(args.out, table))
    run_path = os.path.join(args.out, MANIFEST_DIR, "_run.json")
    if os.path.exists(run_path):
        with open(run_path) as f:
            out["run"] = json.load(f)
    print(json.dumps(out))
    return 0


def cmd_eval(args) -> int:
    """Evidence-coverage evaluation (reference scripts/evaluate_tkg.py
    analog): join the question set's evidence urls against the built KG's
    chunks/mentions and report coverage."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from .pipelines.evaluate import evidence_join
    from .sources.synth import page_url

    _init_ray(args.num_cpus)
    if args.questions:
        questions = pq.read_table(args.questions)
    else:
        docs = pq.read_table(f"{args.from_documents}/documents.parquet",
                             columns=["doc_id"])
        qids = [int(d) for d in docs["doc_id"].to_pylist()]
        questions = pa.Table.from_pydict({
            "question_id": pa.array(qids, pa.int64()),
            "url": pa.array([page_url(q) for q in qids], pa.string()),
        })
    out = evidence_join(
        questions,
        rd.read_parquet(f"{args.kg}/chunk_ents", columns=["url"]),
        rd.read_parquet(f"{args.kg}/mentions", columns=["url"]),
    )
    covered = int(out["covered"].sum())
    print(json.dumps({
        "n_questions": len(out),
        "n_covered": covered,
        "coverage": round(covered / max(1, len(out)), 4),
        "mean_evidence_chunks": round(
            float(out["n_evidence_chunks"].mean()), 3),
        "mean_evidence_mentions": round(
            float(out["n_evidence_mentions"].mean()), 3),
    }))
    import ray

    ray.shutdown()
    return 0


def cmd_ask(args) -> int:
    """Batch question-answering against a BUILT KG store (the serving
    story as batch dataflow: build -> ask). Runs the full 5-stage RAG
    pipeline (pipelines/rag.py — understand -> retrieve -> build_context
    -> generate -> verify) over the given questions; the generate stage
    uses the deterministic renderer unless TKG_LLM_API_BASE points at a
    live endpoint (then each actor builds the HTTP client once). One
    JSON line per question on stdout."""
    import ray
    import ray.data as rd

    from .pipelines.rag import rag_answer_batch

    questions = list(args.question or [])
    if args.questions_file:
        with open(args.questions_file) as f:
            questions += [line.strip() for line in f if line.strip()]
    if not questions:
        print("ask needs --question (repeatable) or --questions-file",
              file=sys.stderr)
        return 2
    qlist = [{"query_id": i, "query": q}
             for i, q in enumerate(questions)]
    _init_ray(args.num_cpus)
    out = rag_answer_batch(
        rd.read_parquet(os.path.join(args.kg, "chunk_ents")),
        rd.read_parquet(os.path.join(args.kg, "mentions")),
        qlist, k=args.k)
    for r in out.to_dict("records"):
        print(json.dumps({
            "query_id": int(r["query_id"]),
            "query": r["query"],
            "query_type": r["query_type"],
            "num_results": int(r["num_results"]),
            "answer": r["answer"],
            "verified": bool(r["verified"]),
        }))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Compact fragmented checkpoint partitions (store OPTIMIZE)."""
    import ray

    from .pipelines.compact import compact_store

    _init_ray(args.num_cpus)
    report = compact_store(args.out,
                           target_bytes=args.target_mb << 20)
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Training-data curation funnel over a documents Parquet."""
    import ray
    import ray.data as rd

    from .pipelines.curate import curate_corpus

    if not args.documents and not args.wet:
        raise SystemExit("curate: one of --documents / --wet is required")
    if args.documents and args.wet:
        raise SystemExit("curate: --documents and --wet are mutually "
                         "exclusive — pass exactly one input")
    _init_ray(args.num_cpus)
    if args.wet:
        from .sources.wet import read_wet, wet_to_documents

        ds = wet_to_documents(read_wet(args.wet.split(",")))
    else:
        ds = rd.read_parquet(args.documents, columns=["doc_id", "text"])
    report = curate_corpus(
        ds, args.out,
        languages=set(args.languages.split(",")) if args.languages else None,
        min_words=args.min_words,
        max_punct_ratio=args.max_punct_ratio,
        jaccard_threshold=args.jaccard_threshold,
        max_dup_fraction=args.max_dup_fraction,
        quality_model=args.quality_model,
        min_quality_score=args.min_quality_score,
        paragraph_dedup_sep=args.paradedup_sep,
        substring_removal_window=args.substr_remove_window,
        ccnet_lm=args.ccnet_lm,
        ccnet_keep=tuple(args.ccnet_keep.split(",")),
        fingerprint_store=args.fingerprint_store,
        neardup_store=args.neardup_store,
        update_stores=args.update_stores,
    )
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_sample(args) -> int:
    """Deterministic sampling over a documents Parquet (md5-keyed:
    exact SQL-checkable membership, layout/retry-invariant)."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.sampling import (
        sample_fraction,
        stratified_sample,
        weighted_sample,
    )

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.documents)
    if args.weight_col:
        if not args.k:
            raise SystemExit("--weight-col requires --k")
        out = weighted_sample(ds, args.k, args.weight_col,
                              args.key_col, seed=args.seed)
    elif args.per_group:
        out = stratified_sample(ds, args.group_col, args.per_group,
                                args.key_col, seed=args.seed)
    else:
        out = sample_fraction(ds, args.frac, args.key_col, seed=args.seed)
    coalesce_blocks(out).write_parquet(args.out)
    print(json.dumps({"out": args.out,
                      "rows": rd.read_parquet(args.out).count()}))
    ray.shutdown()
    return 0


def cmd_dsir(args) -> int:
    """DSIR importance selection: pick k raw docs most target-like."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.dsir import dsir_select

    _init_ray(args.num_cpus)
    out = dsir_select(
        rd.read_parquet(args.documents),
        rd.read_parquet(args.target),
        k=args.k, num_buckets=args.num_buckets, mode=args.mode)
    coalesce_blocks(out).write_parquet(args.out)
    print(json.dumps({"out": args.out, "k": args.k, "mode": args.mode}))
    ray.shutdown()
    return 0


def cmd_classify(args) -> int:
    """Train and/or apply the fastText-style quality classifier.

    With ``--train-labels`` fits on a (doc_id, text, label 0/1) Parquet
    and saves the model to ``--model``; with ``--documents`` scores the
    corpus against ``--model`` into ``--out`` (doc_id, quality_score)."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.classifier import (
        TextClassifierModel,
        classify_text,
        featurize,
        fit_classifier,
    )

    if args.documents and not args.out:
        raise SystemExit("classify: --documents requires --out")
    _init_ray(args.num_cpus)
    info = {"model": args.model}
    if args.train_labels:
        feats = featurize(
            rd.read_parquet(args.train_labels),
            label_col=args.label_col, dim=args.dim,
            ngrams=args.ngrams, seed=args.seed)
        model = fit_classifier(
            feats, dim=args.dim, ngrams=args.ngrams, seed=args.seed,
            epochs=args.epochs, lr=args.lr, l2=args.l2)
        model.save(args.model)
        info["final_loss"] = model.losses[-1]
    else:
        model = TextClassifierModel.load(args.model)
    if args.documents:
        out = classify_text(
            rd.read_parquet(args.documents, columns=["doc_id", "text"]),
            model)
        coalesce_blocks(out).write_parquet(args.out)
        info["out"] = args.out
        info["rows"] = rd.read_parquet(args.out).count()
    print(json.dumps(info))
    ray.shutdown()
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup verdicts over an embeddings Parquet."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.kmeans import semantic_dedup

    _init_ray(args.num_cpus)
    out = semantic_dedup(
        rd.read_parquet(args.embeddings), k=args.k,
        threshold=args.threshold, id_col=args.id_col).materialize()
    coalesce_blocks(out).write_parquet(args.out)
    kept = out.sum(on="keep") or 0
    print(json.dumps({"out": args.out, "rows": out.count(),
                      "kept": int(kept)}))
    ray.shutdown()
    return 0


def cmd_dupspans(args) -> int:
    """Per-doc exact substring-duplication stats (Lee et al. windows);
    with --remove, rewrite the corpus keeping only each duplicated
    window's globally-first occurrence (ExactSubstr removal)."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks

    _init_ray(args.num_cpus)
    import pyarrow.compute as pc

    if args.remove:
        from .stages.substring_dedup import remove_duplicate_spans

        out = remove_duplicate_spans(
            rd.read_parquet(args.documents),
            window_tokens=args.window_tokens).materialize()
        coalesce_blocks(out).write_parquet(args.out)
        n_cut = out.map_batches(
            lambda t: t.filter(pc.not_equal(t["removed_tokens"], 0)),
            batch_format="pyarrow").count()
        print(json.dumps({
            "out": args.out, "rows": out.count(), "docs_cut": n_cut,
            "removed_tokens": int(out.sum(on="removed_tokens") or 0)}))
        ray.shutdown()
        return 0

    from .stages.substring_dedup import substring_dup_stats

    out = substring_dup_stats(
        rd.read_parquet(args.documents),
        window_tokens=args.window_tokens).materialize()
    coalesce_blocks(out).write_parquet(args.out)
    n_dup = out.map_batches(
        lambda t: t.filter(pc.not_equal(t["dup_tokens"], 0)),
        batch_format="pyarrow").count()
    print(json.dumps({"out": args.out, "rows": out.count(),
                      "docs_with_dup_spans": n_dup}))
    ray.shutdown()
    return 0


def cmd_datacard(args) -> int:
    """One-call corpus audit card (profile + language mix + token
    stats + dup accounting + review flags) as one JSON blob."""
    import ray
    import ray.data as rd

    from .pipelines.datacard import build_datacard

    _init_ray(args.num_cpus)
    card = build_datacard(rd.read_parquet(args.documents),
                          text_col=args.text_col, id_col=args.id_col)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(card, f, indent=1, default=str)
    print(json.dumps(card, default=str))
    ray.shutdown()
    return 0


def cmd_graphcsv(args) -> int:
    """Parquet graph store -> neo4j-admin bulk-import CSVs (the bridge
    back into the reference's Neo4j serving stack)."""
    import ray

    from .pipelines.neo4j_export import export_neo4j_csv

    _init_ray(args.num_cpus)
    rep = export_neo4j_csv(args.store, args.out)
    print(json.dumps(rep))
    ray.shutdown()
    return 0


def cmd_urldedup(args) -> int:
    """URL-level dedup on the canonical spelling: one row per canonical
    URL, latest --ts-col wins (recrawl supersession at corpus grain)."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.urlfilter import dedup_by_url

    _init_ray(args.num_cpus)
    src = rd.read_parquet(args.pages)
    rows_in = src.count()
    out = dedup_by_url(src, url_col=args.url_col,
                       ts_col=args.ts_col or None).materialize()
    coalesce_blocks(out).write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows_in": rows_in,
                      "rows_out": out.count()}))
    ray.shutdown()
    return 0


def cmd_paradedup(args) -> int:
    """CCNet-style paragraph dedup: drop non-first occurrences of each
    exact paragraph corpus-wide, reassemble docs."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.paradedup import dedup_paragraphs

    _init_ray(args.num_cpus)
    docs = rd.read_parquet(args.documents)
    n_in = docs.count()
    out = dedup_paragraphs(docs.select_columns([args.id_col, args.text_col]),
                           text_col=args.text_col, id_col=args.id_col,
                           sep=args.sep, min_chars=args.min_chars).materialize()
    coalesce_blocks(out).write_parquet(args.out)
    print(json.dumps({"out": args.out, "docs_in": n_in,
                      "docs_out": out.count()}))
    ray.shutdown()
    return 0


def cmd_bm25(args) -> int:
    """Build (or load) a BM25 index and rank a query against it."""
    import os

    import ray
    import ray.data as rd

    from .stages.bm25 import Bm25Index

    _init_ray(args.num_cpus)
    meta = os.path.join(args.index, "_index_meta.json")
    if os.path.exists(meta) and not args.rebuild:
        idx = Bm25Index.load(args.index)
    else:
        docs = rd.read_parquet(args.documents,
                               columns=[args.id_col, args.text_col])
        idx = Bm25Index(docs, text_col=args.text_col, id_col=args.id_col,
                        num_buckets=args.num_buckets)
        idx.save(args.index)
    report = {"index": args.index, "n_docs": idx.n_docs,
              "avgdl": round(idx.avgdl, 3)}
    if args.query:
        top = idx.score([args.query], k=args.k)
        report["query"] = args.query
        report["topk"] = [
            {"id": i, "score": round(float(s), 6)}
            for i, s in zip(top[args.id_col], top["score"])]
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_hybrid(args) -> int:
    """Hybrid BM25+dense retrieval with RRF fusion over documents."""
    import ray
    import ray.data as rd

    from .stages.hybrid import hybrid_search

    _init_ray(args.num_cpus)
    docs = rd.read_parquet(args.documents,
                           columns=[args.id_col, args.text_col])
    top = hybrid_search(docs, args.query, k=args.k, n_each=args.n_each,
                        id_col=args.id_col, text_col=args.text_col)
    print(json.dumps({
        "query": args.query,
        "topk": [{"id": i, "rrf_score": float(s),
                  "rank_bm25": int(rb), "rank_dense": int(rd_)}
                 for i, s, rb, rd_ in zip(
                     top[args.id_col], top["rrf_score"],
                     top["rank_bm25"], top["rank_dense"])]}))
    ray.shutdown()
    return 0


def cmd_shuffle(args) -> int:
    """Deterministic md5-keyed global shuffle into ordered shard files."""
    import ray
    import ray.data as rd

    from .stages.shuffle import write_shuffled_shards

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.documents)
    write_shuffled_shards(ds, args.out, args.key_col, seed=args.seed,
                          num_shards=args.num_shards)
    print(json.dumps({"out": args.out, "num_shards": args.num_shards,
                      "seed": args.seed,
                      "rows": rd.read_parquet(args.out).count()}))
    ray.shutdown()
    return 0


def cmd_mix(args) -> int:
    """Deterministic weighted mixture of corpora split by a column."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.mixture import mix_corpora

    _init_ray(args.num_cpus)
    weights = {}
    for part in args.weights.split(","):
        name, w = part.split("=")
        weights[name] = float(w)
    base = rd.read_parquet(args.documents)
    corpora = {name: base.filter(expr=f"{args.group_col} == '{name}'")
               for name in weights}
    # one grouped pass for ALL corpus sizes (mix_corpora would
    # otherwise run a count scan per corpus)
    by = base.groupby(args.group_col).count().to_pandas()
    counts = {n: int(c) for n, c in
              zip(by[args.group_col], by["count()"]) if n in weights}
    missing = set(weights) - set(counts)
    if missing:
        raise SystemExit(f"no rows for corpora {sorted(missing)}")
    mixed = mix_corpora(corpora, weights, args.key_col, seed=args.seed,
                        scale=args.scale, num_shards=args.num_shards,
                        counts=counts)
    coalesce_blocks(mixed).write_parquet(args.out,
                                         partition_cols=["shard"])
    out = rd.read_parquet(args.out)
    by = out.groupby("corpus").count().to_pandas()
    print(json.dumps({
        "out": args.out, "rows": int(by["count()"].sum()),
        "by_corpus": dict(zip(by["corpus"],
                              (int(x) for x in by["count()"])))}))
    ray.shutdown()
    return 0


def cmd_vocab(args) -> int:
    """Exact top-K vocabulary over a documents table."""
    import ray
    import ray.data as rd

    from .stages.vocab import build_vocab

    _init_ray(args.num_cpus)
    docs = rd.read_parquet(args.documents, columns=[args.text_col])
    vocab = build_vocab(docs, text_col=args.text_col,
                        max_size=args.max_size,
                        min_count=args.min_count)
    vocab.to_parquet(args.out, index=False)
    print(json.dumps({"out": args.out, "terms": len(vocab),
                      "top5": vocab["term"].head(5).tolist()}))
    ray.shutdown()
    return 0


def cmd_bpe(args) -> int:
    """Train a BPE tokenizer on a documents table; optionally encode."""
    import ray
    import ray.data as rd

    from .stages.bpe import apply_bpe, train_bpe

    _init_ray(args.num_cpus)
    docs = rd.read_parquet(args.documents)
    model = train_bpe(docs, text_col=args.text_col,
                      num_merges=args.num_merges,
                      max_words=args.max_words)
    model.save(args.out)
    report = {"out": args.out, "merges": len(model.merges),
              "vocab": len(model.vocab())}
    if args.encode_out:
        enc = apply_bpe(docs, model, text_col=args.text_col,
                        id_col=args.id_col)
        enc.write_parquet(args.encode_out)
        report["encode_out"] = args.encode_out
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_pca(args) -> int:
    """Fit PCA on an embeddings table; optionally project the corpus."""
    import ray
    import ray.data as rd

    from .stages.pca import fit_pca, pca_transform

    _init_ray(args.num_cpus)
    emb = rd.read_parquet(args.embeddings)
    model = fit_pca(emb, k=args.k, emb_col=args.emb_col)
    model.save(args.out)
    report = {"out": args.out, "n": model.n,
              "components": int(model.components.shape[0]),
              "explained_variance":
                  [round(float(v), 6)
                   for v in model.explained_variance[:5]]}
    if args.transform_out:
        proj = pca_transform(emb, model, emb_col=args.emb_col,
                             id_col=args.id_col)
        proj.write_parquet(args.transform_out)
        report["transform_out"] = args.transform_out
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_profile(args) -> int:
    """Profile a Parquet table (one streaming aggregate pass); optionally
    validate expectation rules from a JSON file."""
    import ray
    import ray.data as rd

    from .stages.profile import (
        profile_columns,
        skew_report,
        validate_expectations,
    )

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.table)
    cols = args.columns.split(",") if args.columns else None
    report: dict = {"profile": profile_columns(
        ds, cols, topk=args.topk, max_candidates=args.max_candidates)}
    if args.rules:
        with open(args.rules) as f:
            rules = json.load(f)
        report["expectations"] = validate_expectations(
            ds, rules, id_col=args.id_col)
    if args.skew_key:
        report["skew"] = {
            k: skew_report(ds, k, exact=args.skew_exact)
            for k in args.skew_key.split(",")}
    print(json.dumps(report, default=str))
    ray.shutdown()
    return 0


def cmd_incdedup(args) -> int:
    """Dedup a new snapshot against a persisted fingerprint store."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.incdedup import (
        dedup_against_store,
        write_fingerprint_store,
    )

    if not args.init_from and not os.path.isdir(args.store):
        # deduping (or compacting) a missing store silently keeps
        # everything — almost certainly a typo'd --store path
        print(f"incdedup: store {args.store} does not exist; "
              "initialize it with --init-from", file=sys.stderr)
        return 2
    if args.compact:
        from .stages.incdedup import compact_fingerprint_store

        _init_ray(args.num_cpus)
        print(json.dumps({"store": args.store,
                          **compact_fingerprint_store(args.store)}))
        ray.shutdown()
        return 0
    if args.remove_docs:
        from .stages.incdedup import remove_from_fingerprint_store

        _init_ray(args.num_cpus)
        print(json.dumps({"store": args.store,
                          **remove_from_fingerprint_store(
                              args.store,
                              rd.read_parquet(args.remove_docs))}))
        ray.shutdown()
        return 0
    if not args.init_from and not (args.documents and args.out):
        print("incdedup needs either --init-from, --compact, or "
              "--documents with --out", file=sys.stderr)
        return 2
    _init_ray(args.num_cpus)
    if args.init_from:
        n = write_fingerprint_store(rd.read_parquet(args.init_from),
                                    args.store)
        print(json.dumps({"store": args.store, "fingerprints": n}))
        ray.shutdown()
        return 0
    out = dedup_against_store(rd.read_parquet(args.documents),
                              args.store, update_store=args.update)
    survivors = out.count()
    if survivors:
        coalesce_blocks(out).write_parquet(args.out)
    print(json.dumps({"out": args.out, "survivors": survivors,
                      "store": args.store, "updated": args.update}))
    ray.shutdown()
    return 0


def cmd_incneardup(args) -> int:
    """NEAR-dedup a new snapshot against a persisted MinHash store
    (stages/incneardup.py: shared LSH band + signature agreement >=
    --threshold; the store holds only band hashes + signatures, so no
    corpus text is ever re-read)."""
    import ray
    import ray.data as rd

    from .stages.blocks import coalesce_blocks
    from .stages.incneardup import (
        compact_neardup_store,
        neardup_against_store,
        write_neardup_store,
    )

    if not args.init_from and not os.path.exists(
            os.path.join(args.store, "_meta.json")):
        # deduping (or compacting) a missing store silently does
        # nothing — at the CLI that is almost certainly a typo'd
        # --store path
        print(f"incneardup: store {args.store} does not exist "
              "(no _meta.json); initialize it with --init-from",
              file=sys.stderr)
        return 2
    if args.compact:
        _init_ray(args.num_cpus)
        print(json.dumps({"store": args.store,
                          **compact_neardup_store(args.store)}))
        ray.shutdown()
        return 0
    if args.remove_ids_file:
        from .stages.incneardup import remove_from_neardup_store

        with open(args.remove_ids_file) as f:
            ids = [int(line) for line in f if line.strip()]
        _init_ray(args.num_cpus)
        print(json.dumps({"store": args.store,
                          **remove_from_neardup_store(args.store, ids)}))
        ray.shutdown()
        return 0
    if not args.init_from and not (args.documents and args.out):
        print("incneardup needs either --init-from, --compact, or "
              "--documents with --out", file=sys.stderr)
        return 2
    _init_ray(args.num_cpus)
    if args.init_from:
        n = write_neardup_store(rd.read_parquet(args.init_from),
                                args.store)
        print(json.dumps({"store": args.store, "docs": n}))
        ray.shutdown()
        return 0
    out, stats = neardup_against_store(
        rd.read_parquet(args.documents), args.store,
        jaccard_threshold=args.threshold, update_store=args.update,
        return_stats=True)
    out = out.materialize()  # consumed twice: count + write
    survivors = out.count()
    if survivors:
        coalesce_blocks(out).write_parquet(args.out)
    else:
        # zero survivors still publishes the reported --out path (an
        # empty table with the snapshot's schema), so downstream steps
        # read an empty dataset instead of file-not-found
        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        pq.write_table(out.schema().base_schema.empty_table(),
                       os.path.join(args.out, "part-00000.parquet"))
    print(json.dumps({"out": args.out, "survivors": survivors,
                      "store": args.store, "updated": args.update,
                      **stats}))
    ray.shutdown()
    return 0


def cmd_export(args) -> int:
    """Curated documents -> shuffled, packed training shards (text, or
    BPE token ids with --tokenize-with)."""
    import ray
    import ray.data as rd

    _init_ray(args.num_cpus)
    docs = rd.read_parquet(args.documents,
                           columns=[args.id_col, args.text_col])
    if args.tokenize_with:
        # flags that only apply to the text path must not be silently
        # ignored on the tokenized path
        if args.format != "parquet":
            raise SystemExit(
                "export: --format applies to text shards only; "
                "tokenized shards are always Parquet")
        if args.vocab_size is not None:
            raise SystemExit(
                "export: --vocab-size applies to text shards only; "
                "the tokenized path writes _token_vocab.parquet "
                "from the BPE model itself")
        from .pipelines.export import export_tokenized
        from .stages.bpe import BpeModel

        model = BpeModel.load(args.tokenize_with)
        manifest = export_tokenized(
            docs, model.merges, args.out, text_col=args.text_col,
            id_col=args.id_col, seq_budget=args.token_budget,
            seed=args.seed, num_shards=args.num_shards,
            normalize=not args.no_normalize)
    else:
        from .pipelines.export import export_training_data

        manifest = export_training_data(
            docs, args.out, text_col=args.text_col, id_col=args.id_col,
            token_budget=args.token_budget, seed=args.seed,
            num_shards=args.num_shards, normalize=not args.no_normalize,
            vocab_size=args.vocab_size, output_format=args.format)
    print(json.dumps({"out": args.out, **manifest}))
    ray.shutdown()
    return 0


def cmd_analytics(args) -> int:
    """Whole-graph analytics over a built KG's edge table."""
    import ray
    import ray.data as rd

    from .pipelines.graph import connected_components, pagerank
    from .pipelines.graph_analytics import (
        degree_distribution,
        k_core,
        label_propagation,
        local_clustering,
        triangle_count,
    )

    _init_ray(args.num_cpus)
    edges = rd.read_parquet(f"{args.kg}/edges",
                            columns=["subj_id", "obj_id"])
    report: dict = {"kg": args.kg}
    which = set(args.metrics.split(","))
    if "degrees" in which:
        dd = degree_distribution(edges).to_pandas()
        report["degree_distribution"] = dict(
            zip((int(x) for x in dd["degree"]),
                (int(x) for x in dd["n_nodes"])))
    if "triangles" in which:
        report["triangles"] = triangle_count(edges)
    # Scalar reports below stay DISTRIBUTED: the node-grain tables
    # (clustering coefficients, component/community labels) are never
    # pulled to the driver — mean via Dataset.mean, distinct counts via
    # groupby().count().count(), so driver memory is independent of
    # node count.
    if "clustering" in which:
        mean = local_clustering(edges).mean("clustering")
        report["avg_clustering"] = round(float(mean), 6) \
            if mean is not None else 0.0
    if "kcore" in which:
        report["k_core_nodes"] = k_core(edges, args.k).count()
        report["k"] = args.k
    if "components" in which:
        comp = connected_components(edges)
        report["components"] = _distinct_count(comp, "component")
    if "pagerank" in which:
        pr = pagerank(edges)
        report["pagerank_top5"] = pr.head(5)["entity_id"].tolist()
    if "communities" in which:
        lp = label_propagation(edges, rounds=args.lpa_rounds)
        report["communities"] = _distinct_count(lp, "community")
    print(json.dumps(report))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="temporal_knowledge_graphs_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("build", "resume", "ingest"):
        p = sub.add_parser(name)
        p.add_argument("--pages", help="pages Parquet path/dir")
        p.add_argument("--from-documents",
                       help="testdata dir: synthesize pages from "
                            "documents.parquet")
        p.add_argument("--repeat", type=int, default=1)
        p.add_argument("--out", required=True)
        p.add_argument("--num-cpus", type=int, default=None)
        p.add_argument("--builtin-aliases", action="store_true",
                       default=True)
        p.add_argument("--supersede-recrawls", action="store_true",
                       help="ingest only: a resubmitted url with a newer "
                            "warc_ts replaces its previous version")
        p.add_argument("--blocked-domains", default=None,
                       help="build only: comma list of registrable "
                            "domains to drop before extraction")

    p = sub.add_parser("ask")
    p.add_argument("--kg", required=True, help="built KG output dir")
    p.add_argument("--question", action="append",
                   help="a question (repeatable)")
    p.add_argument("--questions-file",
                   help="file with one question per line")
    p.add_argument("--k", type=int, default=5,
                   help="retrieved chunks per question")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("stats")
    p.add_argument("--out", required=True)

    p = sub.add_parser("verify")
    p.add_argument("--out", required=True)

    p = sub.add_parser("eval")
    p.add_argument("--kg", required=True, help="built KG output dir")
    p.add_argument("--questions",
                   help="questions Parquet (question_id, url)")
    p.add_argument("--from-documents",
                   help="testdata dir: synthesize questions from "
                        "documents.parquet")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("compact")
    p.add_argument("--out", required=True, help="built KG output dir")
    p.add_argument("--target-mb", type=int, default=256,
                   help="target compacted file size in MiB")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("curate")
    p.add_argument("--documents", default=None,
                   help="documents Parquet path/dir (doc_id, text)")
    p.add_argument("--wet", default=None,
                   help="comma-separated WARC/WET shard paths to curate "
                        "instead of --documents")
    p.add_argument("--out", required=True)
    p.add_argument("--languages", default=None,
                   help="comma-separated allowlist, e.g. en,de")
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.3)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--max-dup-fraction", type=float, default=None,
                   help="drop docs whose exact substring-duplicated "
                        "token fraction exceeds this cap")
    p.add_argument("--quality-model", default=None,
                   help="saved TextClassifierModel .npz; adds the "
                        "model-based quality-filter leg")
    p.add_argument("--min-quality-score", type=float, default=0.5)
    p.add_argument("--paradedup-sep", default=None,
                   help="paragraph delimiter; adds the CCNet "
                        "paragraph-dedup leg at the funnel head")
    p.add_argument("--substr-remove-window", type=int, default=None,
                   help="window tokens; adds the ExactSubstr span-"
                        "REMOVAL leg at the funnel head (cuts non-first "
                        "occurrences of duplicated windows out of the "
                        "text — the rewrite alternative to "
                        "--max-dup-fraction's whole-doc cap)")
    p.add_argument("--ccnet-lm", default=None,
                   help="np.save'd trusted-corpus LM counts "
                        "(fit_hashed_lm); adds the CCNet perplexity-"
                        "bucket leg with per-language cutpoints")
    p.add_argument("--ccnet-keep", default="head,middle",
                   help="comma-separated buckets to keep")
    p.add_argument("--fingerprint-store", default=None,
                   help="persisted exact-fingerprint store: drop docs "
                        "whose content earlier snapshots already have")
    p.add_argument("--neardup-store", default=None,
                   help="persisted MinHash store: drop NEAR-copies of "
                        "the accumulated corpus (store _meta.json "
                        "parameters govern matching)")
    p.add_argument("--update-stores", action="store_true",
                   help="append the curated survivors to the stores so "
                        "the next snapshot dedups against this one")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("sample")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frac", type=float, default=0.1)
    p.add_argument("--per-group", type=int, default=None,
                   help="stratified quota per group (overrides --frac)")
    p.add_argument("--group-col", default="lang")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--weight-col", default=None,
                   help="weighted sampling without replacement by this "
                        "column (requires --k)")
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("classify")
    p.add_argument("--model", required=True,
                   help="model .npz path (written with --train-labels, "
                        "read otherwise)")
    p.add_argument("--train-labels", default=None,
                   help="labeled Parquet (doc_id, text, label 0/1) to fit on")
    p.add_argument("--label-col", default="label")
    p.add_argument("--documents", default=None,
                   help="corpus Parquet to score (writes --out)")
    p.add_argument("--out", default=None)
    p.add_argument("--dim", type=int, default=2 ** 18)
    p.add_argument("--ngrams", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=8.0)
    p.add_argument("--l2", type=float, default=0.0)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("dsir")
    p.add_argument("--documents", required=True, help="raw corpus Parquet")
    p.add_argument("--target", required=True, help="target corpus Parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--k", type=int, required=True)
    p.add_argument("--num-buckets", type=int, default=65536)
    p.add_argument("--mode", choices=("topk", "gumbel"), default="topk")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("semdedup")
    p.add_argument("--embeddings", required=True,
                   help="Parquet with (id, embedding list<float>)")
    p.add_argument("--out", required=True)
    p.add_argument("--k", type=int, default=64, help="n clusters")
    p.add_argument("--threshold", type=float, default=0.95)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("dupspans")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--window-tokens", type=int, default=50)
    p.add_argument("--remove", action="store_true",
                   help="rewrite the corpus with non-first occurrences "
                        "of duplicated windows cut out (ExactSubstr "
                        "removal) instead of writing stats")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("datacard")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", default=None,
                   help="also write the card JSON here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("graphcsv")
    p.add_argument("--store", required=True,
                   help="graph store dir (nodes/ + edges/ Parquet)")
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("urldedup")
    p.add_argument("--pages", required=True,
                   help="pages Parquet path/dir with a url column")
    p.add_argument("--out", required=True)
    p.add_argument("--url-col", default="url")
    p.add_argument("--ts-col", default="warc_ts",
                   help="latest-wins timestamp column; pass '' to "
                        "tie-break on the raw url only")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("paradedup")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sep", default="\n", help="paragraph delimiter")
    p.add_argument("--min-chars", type=int, default=1,
                   help="paragraphs shorter than this are always kept")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("bm25")
    p.add_argument("--documents", required=True)
    p.add_argument("--index", required=True,
                   help="index dir (loaded if it exists, else built)")
    p.add_argument("--query", default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--rebuild", action="store_true")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("hybrid")
    p.add_argument("--documents", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-each", type=int, default=50)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("shuffle")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("mix")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--weights", required=True,
                   help="comma list name=weight, e.g. src0=3,src1=1")
    p.add_argument("--group-col", default="source")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("vocab")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True, help="vocab Parquet file")
    p.add_argument("--max-size", type=int, default=50000)
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("export")
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--token-budget", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--vocab-size", type=int, default=None)
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "jsonl"),
                   help="shard file format (jsonl: one "
                        "shard=K/part-0.jsonl per shard, same order)")
    p.add_argument("--tokenize-with", default=None,
                   help="saved BPE model (cli bpe --out); shards become "
                        "packed token-ID sequences (list<int32> rows, "
                        "<eos>-joined, --token-budget = seq length)")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("incdedup")
    p.add_argument("--store", required=True,
                   help="fingerprint store dir")
    p.add_argument("--documents", help="new snapshot Parquet")
    p.add_argument("--out", help="survivors Parquet dir")
    p.add_argument("--update", action="store_true",
                   help="append survivors' fingerprints to the store")
    p.add_argument("--init-from",
                   help="initialize the store from this corpus instead "
                        "of deduping")
    p.add_argument("--compact", action="store_true",
                   help="merge the store's increment files instead of "
                        "deduping")
    p.add_argument("--remove-docs",
                   help="takedown: Parquet of documents whose content "
                        "fingerprints should be deleted from the store")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("incneardup")
    p.add_argument("--store", required=True,
                   help="MinHash store dir (bands/ + sigs/ + _meta.json)")
    p.add_argument("--documents", help="new snapshot Parquet")
    p.add_argument("--out", help="survivors Parquet dir")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="signature-agreement (est. Jaccard) threshold")
    p.add_argument("--update", action="store_true",
                   help="append survivors' MinHash state to the store")
    p.add_argument("--init-from",
                   help="initialize the store from this corpus instead "
                        "of deduping")
    p.add_argument("--compact", action="store_true",
                   help="merge the store's increment files instead of "
                        "deduping")
    p.add_argument("--remove-ids-file",
                   help="takedown: file of doc ids (one per line) to "
                        "delete from the store's MinHash state")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("analytics")
    p.add_argument("--kg", required=True, help="built KG output dir")
    p.add_argument("--metrics",
                   default="degrees,triangles,clustering,kcore,"
                           "components,pagerank,communities")
    p.add_argument("--k", type=int, default=3, help="k for k-core")
    p.add_argument("--lpa-rounds", type=int, default=10,
                   help="label-propagation rounds for communities")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("bpe")
    p.add_argument("--documents", required=True,
                   help="documents Parquet (text corpus)")
    p.add_argument("--out", required=True, help="merges JSON path")
    p.add_argument("--num-merges", type=int, default=2000)
    p.add_argument("--max-words", type=int, default=100_000)
    p.add_argument("--text-col", default="text")
    p.add_argument("--encode-out",
                   help="also encode the corpus to this Parquet dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("profile")
    p.add_argument("--table", required=True, help="Parquet table to profile")
    p.add_argument("--columns", help="comma-separated (default: all "
                                     "non-nested, non-binary columns)")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--max-candidates", type=int, default=4096)
    p.add_argument("--rules", help="expectation rules JSON file")
    p.add_argument("--id-col", default="doc_id",
                   help="id column for violation examples")
    p.add_argument("--skew-key", help="comma-separated prospective "
                                      "groupby/join keys to skew-probe")
    p.add_argument("--skew-exact", action="store_true",
                   help="exact grouped-count skew mode (runs the shuffle)")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("pca")
    p.add_argument("--embeddings", required=True,
                   help="embeddings Parquet (vec_id, embedding)")
    p.add_argument("--out", required=True, help="model .npz path")
    p.add_argument("--k", type=int, default=None,
                   help="components to keep (default: all)")
    p.add_argument("--transform-out",
                   help="also project the corpus to this Parquet dir")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--emb-col", default="embedding")
    p.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)
    if args.cmd == "sample":
        return cmd_sample(args)
    if args.cmd == "dsir":
        return cmd_dsir(args)
    if args.cmd == "classify":
        return cmd_classify(args)
    if args.cmd == "semdedup":
        return cmd_semdedup(args)
    if args.cmd == "dupspans":
        return cmd_dupspans(args)
    if args.cmd == "datacard":
        return cmd_datacard(args)
    if args.cmd == "graphcsv":
        return cmd_graphcsv(args)
    if args.cmd == "urldedup":
        return cmd_urldedup(args)
    if args.cmd == "paradedup":
        return cmd_paradedup(args)
    if args.cmd == "analytics":
        return cmd_analytics(args)
    if args.cmd == "bm25":
        return cmd_bm25(args)
    if args.cmd == "hybrid":
        return cmd_hybrid(args)
    if args.cmd == "shuffle":
        return cmd_shuffle(args)
    if args.cmd == "mix":
        return cmd_mix(args)
    if args.cmd == "vocab":
        return cmd_vocab(args)
    if args.cmd == "bpe":
        return cmd_bpe(args)
    if args.cmd == "pca":
        return cmd_pca(args)
    if args.cmd == "profile":
        return cmd_profile(args)
    if args.cmd == "incdedup":
        return cmd_incdedup(args)
    if args.cmd == "incneardup":
        return cmd_incneardup(args)
    if args.cmd == "export":
        return cmd_export(args)
    if args.cmd == "eval":
        return cmd_eval(args)
    if args.cmd == "compact":
        return cmd_compact(args)
    if args.cmd == "curate":
        return cmd_curate(args)
    if args.cmd == "build":
        return cmd_build(args, resume=False)
    if args.cmd == "resume":
        return cmd_build(args, resume=True)
    if args.cmd == "ingest":
        return cmd_build(args, increment=True)
    if args.cmd == "ask":
        return cmd_ask(args)
    if args.cmd == "stats":
        return cmd_stats(args)
    if args.cmd == "verify":
        from .state.manifests import verify_output

        res = verify_output(args.out)
        print(json.dumps(res, default=str))
        return 0 if res["ok"] else 1
    return 2


if __name__ == "__main__":
    sys.exit(main())
