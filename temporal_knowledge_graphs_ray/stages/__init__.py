"""Ray Data stages: map_batches callables and actor-pool classes.

Conventions:
- Arrow in / Arrow out (``batch_format="pyarrow"``) unless a kernel needs
  pandas; large text columns use ``large_string``.
- stateless transforms are plain functions (cheap elastic tasks); stages
  holding state (broadcast alias dict, compiled models) are callable
  classes run as actor pools via ``map_batches(Cls, concurrency=...)``.
- every stage is a pure function of its input rows — safe under Ray task
  retries and lineage re-execution.
"""
