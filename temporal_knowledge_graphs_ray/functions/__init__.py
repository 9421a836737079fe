"""Pure, deterministic kernels.

Every function here is a pure function of its inputs (no wall-clock, no
randomness, no I/O) so that Ray task retries are idempotent and the
sequential oracle in ``oracle/`` produces byte-identical results to the
distributed pipeline.
"""
