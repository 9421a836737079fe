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


def _complete_fsspec_http_probe() -> None:
    """Defuse a thread race in Ray Data's optional HTTP-filesystem probe.

    ``ray.data``'s path resolver re-attempts ``from
    fsspec.implementations.http import HTTPFileSystem`` on every dataset
    plan. In containers without ``aiohttp`` that import always fails, so
    it is never cached and re-executes per plan — and two threads planning
    datasets concurrently (e.g. the background checkpoint writer in
    pipelines/kg.py and a foreground ``read_parquet``) can hit the import
    machinery's deadlock-avoidance path and observe the half-initialized
    module, crashing with ``ImportError: cannot import name
    'HTTPFileSystem'`` instead of the ``ModuleNotFoundError`` the probe
    catches. Completing the module once with an inert stub makes the
    import succeed and stay cached: the probe's isinstance check then
    correctly returns False for every real filesystem, and no concurrent
    re-import can ever race. The stub raises on instantiation, so real
    HTTP-filesystem use still fails loudly (and honestly: aiohttp is
    absent).
    """
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return  # real implementation importable — nothing to patch
    except ImportError:
        pass
    try:
        import fsspec  # noqa: F401
        import fsspec.implementations  # noqa: F401
    except ImportError:
        return  # no fsspec at all: ray's probe already handles this
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover - never instantiated
        def __init__(self, *args, **kwargs):
            raise ModuleNotFoundError(
                "fsspec's HTTPFileSystem requires aiohttp, which is not "
                "installed in this environment")

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


_complete_fsspec_http_probe()
