"""Pure deterministic kernels — no Spark imports, safe inside any UDF."""
