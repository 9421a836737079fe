"""``ray job submit`` entry point for the KG construction pipeline.

Production invocation against a running multi-node cluster (the
north_rule's ``ray job submit`` requirement)::

    ray job submit --address http://<head>:8265 \
        --working-dir . -- \
        python -m temporal_knowledge_graphs_ray.job \
            --pages /mnt/shared/crawl/pages \
            --out   /mnt/shared/kg_store --probe-skew

and the resumption of a killed run is the same command plus
``--resume`` (partition-granular: finished partitions are skipped via
the per-partition lineage manifests, state/manifests.py).

No local-filesystem assumptions: inside a submitted job the entrypoint
runs on the cluster and ``ray.init(address="auto")`` attaches to it
(``RAY_ADDRESS`` overrides — the local smoke test sets
``RAY_ADDRESS=local``). Every path argument must therefore be
cluster-visible:

- ``--pages``: a Parquet directory readable from every node
  (``ray.data.read_parquet`` handles local-shared / s3:// / gcs://
  URIs natively),
- ``--out``: the KG store dir on SHARED storage mounted at the same
  path on every node — extraction tasks write partitioned Parquet
  there and the driver writes manifests/journals next to them (the
  same storage contract documented in pipelines/compact.py,
  stages/incdedup.py, pipelines/export.py and
  pipelines/neo4j_export.py).

The sandbox cannot run the real job server (the dashboard's packages
are not installed), so tests/test_job_submit.py drives this exact
module as a subprocess with ``RAY_ADDRESS=local`` — byte-for-byte the
code path a submitted job executes after the job server hands it to
the entrypoint shell.

Prints ONE JSON line with the build result (paths + row counts +
phase seconds) so the job log doubles as the run record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m temporal_knowledge_graphs_ray.job",
        description="KG construction as a ray-job entrypoint")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages Parquet dir/URI "
                                     "(url, warc_ts, html, text, lang)")
    src.add_argument("--from-documents",
                     help="sf dir with documents.parquet (test corpus; "
                          "pages synthesized deterministically)")
    ap.add_argument("--out", required=True,
                    help="KG store dir on cluster-shared storage")
    ap.add_argument("--resume", action="store_true",
                    help="resume a killed run at partition granularity")
    ap.add_argument("--increment", action="store_true",
                    help="ingest_increment into an existing store")
    ap.add_argument("--probe-skew", action="store_true",
                    help="one-pass skew probe auto-sizes the "
                         "canonicalization shuffle")
    ap.add_argument("--builtin-aliases", action="store_true",
                    help="broadcast the built-in alias table")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only honored for address=local smoke runs")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # inside a submitted job, RAY_ADDRESS points at the cluster (the
        # job runtime exports it); "auto" is the attach default outside
        address = os.environ.get("RAY_ADDRESS", "auto")
        kwargs = {"address": address, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if address == "local":
            kwargs["include_dashboard"] = False
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .pipelines.kg import build_kg, ingest_increment
    from .sources.synth import alias_table, pages_from_documents

    pages = (pages_from_documents(args.from_documents)
             if args.from_documents else rd.read_parquet(args.pages))
    aliases = alias_table() if args.builtin_aliases else None
    if args.increment:
        res = ingest_increment(pages, args.out, alias_table=aliases)
    else:
        res = build_kg(pages, args.out, alias_table=aliases,
                       resume=args.resume, probe_skew=args.probe_skew)
    print(json.dumps(
        {k: v for k, v in res.items()
         if isinstance(v, (str, int, float, dict)) or v is None},
        default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
