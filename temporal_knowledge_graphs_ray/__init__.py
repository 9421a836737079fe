"""temporal_knowledge_graphs_ray — a Ray-Data-native temporal knowledge-graph
construction engine.

Rebuilt from scratch with the data-processing capabilities of the reference
system (a sequential Neo4j+LLM temporal-KG RAG pipeline, see SURVEY.md), but
architected Ray-Data-first:

- every per-row transform is a vectorized ``map_batches`` over Arrow batches,
- stateful stages (tokenizer, NER model, relation model, linker with a
  broadcast alias dictionary) are actor pools,
- wide steps (canonicalization, edge merge, node stats) are explicit
  ``groupby``/``map_groups`` shuffles with documented partitioning keys and
  skew handling,
- graph materialization writes partitioned Parquet ``nodes/``/``edges/``
  tables with per-partition lineage manifests for partition-granular resume.

Layout:
  functions/  pure deterministic kernels (shared by the Ray pipeline and the
              sequential oracle used in tests)
  sources/    readers + deterministic synthetic page generation
  stages/     Ray Data stages (map_batches callables / actor classes)
  pipelines/  end-to-end pipelines and query-side batch jobs
  state/      broadcast helpers, lineage manifests, resume logic
  oracle/     reference-style sequential implementation used as test oracle
"""

__version__ = "0.1.0"
