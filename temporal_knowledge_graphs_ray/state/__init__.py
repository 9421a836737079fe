"""Shared state helpers: broadcast objects, lineage manifests, resume."""
