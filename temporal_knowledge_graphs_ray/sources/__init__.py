"""Sources: readers and deterministic synthetic page generation."""
