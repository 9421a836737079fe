"""Sequential oracle: reference-style one-thread pipeline over the same
deterministic kernels, used by tests to compute expected outputs."""
