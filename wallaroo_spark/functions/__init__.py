"""Scalar-function layer.

The reference has **no** built-in scalar functions (SURVEY §2.3) — all scalar
logic is user Python. Our engine's stdlib is pyspark.sql.functions itself;
this package adds the deterministic, engine-portable primitives (hashing,
tokenization) that the dedup/similarity/text operators share, defined once so
the Spark implementation and the DuckDB oracle are generated from the same
constants.
"""
