"""Operator library: the engine's core dataflow + relational operators.

Each module re-expresses a family from SURVEY.md §2 (reference citations in
each docstring) as native DataFrame operations, falling back to pandas-UDF
state operators only where Spark has no native equivalent.
"""

from wallaroo_spark.operators import windows  # noqa: F401
