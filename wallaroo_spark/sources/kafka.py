"""Kafka source/sink (reference §2.4/§2.5 — native in Spark).

Reference: `kafka_source_config.pony:31`, `kafka_sink_config.pony:40` — topic
+ brokers + per-message (value, key, partition). Spark's Kafka connector is
the drop-in: offsets give replay (subsumes the connector-protocol
point-of-reference acks), and the sink is transactional per micro-batch.

The connector JAR (spark-sql-kafka) may be absent in test containers, so
these builders are split: ``*_options`` (pure, unit-testable) and the
``readStream``/``writeStream`` assembly that needs the package at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def source_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Backpressure knob max_offsets_per_trigger mirrors the reference's
    ``max_received_count`` credit limit (`__init__.py:513`)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def normalize_stream(df: DataFrame, value_format: str = "string") -> DataFrame:
    """Kafka's native column set (key/value binary, timestamp, topic,
    partition, offset) -> the engine's source surface. Shared by the real
    connector path AND the embedded protocol mock (`kafka_mock`), so the
    e2e tests exercise the exact production column mapping."""
    value = (
        F.col("value").cast("string") if value_format == "string" else F.col("value")
    )
    return df.select(
        F.col("key").cast("string").alias("key"),
        value.alias("value"),
        F.col("timestamp").alias("event_ts"),
        "topic",
        "partition",
        "offset",
    )


def kafka_source(
    spark: SparkSession, brokers: str, topic: str, value_format: str = "string", **kw
) -> DataFrame:
    """Streaming source: key/value decoded from Kafka's binary columns plus
    event-time = Kafka timestamp (the reference frame's event_time_ms)."""
    reader = spark.readStream.format("kafka")
    for k, v in source_options(brokers, topic, **kw).items():
        reader = reader.option(k, v)
    return normalize_stream(reader.load(), value_format)


def sink_options(brokers: str, topic: str) -> dict[str, str]:
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Streaming sink: df must have key/value columns (encoder's contract —
    reference `kafka_sink_encoder.pony:23-24` returns (value, key, partition))."""
    writer = df.writeStream.format("kafka")
    for k, v in sink_options(brokers, topic).items():
        writer = writer.option(k, v)
    return writer.option("checkpointLocation", checkpoint).start()
