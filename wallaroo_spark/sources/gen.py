"""GenSource — synthetic/test generator source (reference §2.4).

Reference (`core/source/gen_source/gen_source.pony:54-67`;
`__init__.py:528-534`): user supplies ``initial_value()`` and
``apply(prev) -> next``; the engine drives an infinite generated stream.

Spark mapping:

- **streaming**: the ``rate`` source gives (timestamp, value: long) at a
  configurable rows/sec; ``gen_stream`` maps the monotone counter through
  user Column expressions — fully distributed, backpressured, replayable.
- **batch**: ``spark.range(n)`` through the same expressions.

Closed-form generators (counter -> value) cover the reference's test uses
(sequence generators, market feeds); genuinely recursive generators
(next = f(prev) with no closed form) would serialize per partition by
construction — express those as a keyed state op over the counter stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def gen_batch(spark: SparkSession, n: int, exprs: dict[str, Column], partitions: int | None = None) -> DataFrame:
    """Batch generator: id in [0, n) -> user columns (distributed range)."""
    df = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return df.select("id", *[c.alias(name) for name, c in exprs.items()])


def gen_stream(
    spark: SparkSession, rows_per_second: int, exprs: dict[str, Column]
) -> DataFrame:
    """Streaming generator on the rate source: columns (timestamp, value=counter)
    mapped through user expressions."""
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return df.select("timestamp", "value", *[c.alias(name) for name, c in exprs.items()])
