"""Command-line entry points (reference scripts/ parity).

The reference ships CLI scripts (scripts/ingest_documents.py,
consolidate_graph.py, evaluate_tkg.py); this module is their batch-engine
analog:

    python -m temporal_knowledge_graphs_ray.cli build --pages <parquet-dir> --out <dir>
    python -m temporal_knowledge_graphs_ray.cli build --from-documents /root/testdata/sf0.001 --out <dir>
    python -m temporal_knowledge_graphs_ray.cli resume --pages ... --out <dir>
    python -m temporal_knowledge_graphs_ray.cli stats --out <dir>

Owns its Ray session (scripts are allowed to init; the library is not).
"""

from __future__ import annotations

import argparse
import json
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
        res = build_kg(_pages_dataset(args), args.out,
                       alias_table=aliases, resume=resume)
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

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.documents, columns=["doc_id", "text"])
    report = curate_corpus(
        ds, args.out,
        languages=set(args.languages.split(",")) if args.languages else None,
        min_words=args.min_words,
        max_punct_ratio=args.max_punct_ratio,
        jaccard_threshold=args.jaccard_threshold,
    )
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
    p.add_argument("--documents", required=True,
                   help="documents Parquet path/dir (doc_id, text)")
    p.add_argument("--out", required=True)
    p.add_argument("--languages", default=None,
                   help="comma-separated allowlist, e.g. en,de")
    p.add_argument("--min-words", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.3)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)
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
