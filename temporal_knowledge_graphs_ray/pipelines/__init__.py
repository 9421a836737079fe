"""End-to-end pipelines and query-side batch jobs."""
