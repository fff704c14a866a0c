"""Embedded Kafka protocol mock — broker log semantics without a broker.

This container ships neither a Kafka cluster nor the spark-sql-kafka
connector JAR, so the kafka edge cannot be e2e-tested against the real
thing. This module is the test double: an append-only topic/partition/
offset log with Kafka's delivery contract, wired into Structured Streaming
through the file source so the SAME streaming machinery (micro-batches,
watermarks, checkpoints) drives it.

What it preserves of the protocol (the parts our edge code depends on):
- topics are numbered partitions; each partition is an append-only log
  with dense offsets starting at 0
- a message is (key bytes, value bytes, timestamp); records with the same
  key land in the same partition (Kafka's murmur2(key) % n shape — md5
  family here, like every other engine-portable hash)
- ordering is guaranteed per partition only
- the source surfaces the connector's exact column set via the SAME
  ``kafka.normalize_stream`` used by the real ``kafka_source``
- the sink appends with contiguous per-partition offsets, once per
  micro-batch (foreachBatch)

Reference parity targets: `core/source/kafka_source/kafka_source_config.pony:31`
(topic + brokers + per-message value/key/partition),
`core/sink/kafka_sink/` (key-partitioned delivery).

NOT a data-path component: the sink collects each micro-batch to the
driver (fine for a protocol mock; the real connector writes
executor-side) and the broker is a local directory.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wallaroo_spark.sources.kafka import normalize_stream

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _partition_for(key: bytes, n: int) -> int:
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big") % n


class MockBroker:
    """File-backed topic/partition/offset logs. ``produce`` buffers;
    ``flush`` lands one atomic segment file (= one unit of incremental
    discovery for the streaming source, like a fetched record batch)."""

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._pending: dict[str, list[dict]] = {}

    # -- admin ---------------------------------------------------------
    def create_topic(self, topic: str, partitions: int = 2) -> None:
        d = self.topic_dir(topic)
        d.mkdir(parents=True, exist_ok=True)
        (d / "_meta.json").write_text(
            json.dumps({"partitions": partitions, "next_offset": [0] * partitions})
        )

    def topic_dir(self, topic: str) -> Path:
        return self.root / topic

    def _meta(self, topic: str) -> dict:
        return json.loads((self.topic_dir(topic) / "_meta.json").read_text())

    def num_partitions(self, topic: str) -> int:
        return self._meta(topic)["partitions"]

    def end_offsets(self, topic: str) -> list[int]:
        return self._meta(topic)["next_offset"]

    # -- produce -------------------------------------------------------
    def produce(
        self,
        topic: str,
        key: bytes | str,
        value: bytes,
        timestamp_ms: int | None = None,
        partition: int | None = None,
    ) -> None:
        kb = key.encode("utf-8") if isinstance(key, str) else bytes(key)
        if isinstance(value, str):  # the real sink casts string values to binary
            value = value.encode("utf-8")
        meta = self._meta(topic)
        if partition is None:
            partition = _partition_for(kb, meta["partitions"])
        self._pending.setdefault(topic, []).append(
            {
                "key": kb,
                "value": bytes(value),
                "timestamp_ms": timestamp_ms,
                "partition": int(partition),
            }
        )

    def flush(self) -> None:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for topic, rows in self._pending.items():
            meta = self._meta(topic)
            nxt = meta["next_offset"]
            out = {
                "key": [],
                "value": [],
                "timestamp": [],
                "topic": [],
                "partition": [],
                "offset": [],
            }
            for r in rows:
                p = r["partition"]
                out["key"].append(r["key"])
                out["value"].append(r["value"])
                ts = r["timestamp_ms"]
                out["timestamp"].append(
                    pd.Timestamp(ts, unit="ms", tz="UTC") if ts is not None else pd.Timestamp.now(tz="UTC")
                )
                out["topic"].append(topic)
                out["partition"].append(p)
                out["offset"].append(nxt[p])
                nxt[p] += 1
            table = pa.table(
                {
                    "key": pa.array(out["key"], pa.binary()),
                    "value": pa.array(out["value"], pa.binary()),
                    "timestamp": pa.array(out["timestamp"], pa.timestamp("us", tz="UTC")),
                    "topic": pa.array(out["topic"], pa.string()),
                    "partition": pa.array(out["partition"], pa.int32()),
                    "offset": pa.array(out["offset"], pa.int64()),
                }
            )
            seg = self.topic_dir(topic) / f"segment-{sum(nxt):012d}.parquet"
            tmp = seg.with_name("." + seg.name + ".tmp")
            pq.write_table(table, tmp)
            os.rename(tmp, seg)  # atomic appearance for the file source
            (self.topic_dir(topic) / "_meta.json").write_text(json.dumps(meta))
        self._pending.clear()

    # -- consume (batch-side helpers for assertions) -------------------
    def log(self, spark: SparkSession, topic: str) -> DataFrame:
        return spark.read.schema(KAFKA_SCHEMA).parquet(
            str(self.topic_dir(topic)) + "/segment-*.parquet"
        )


def mock_kafka_source(
    spark: SparkSession,
    broker: MockBroker,
    topic: str,
    value_format: str = "string",
    max_segments_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over the mock broker with the real connector's
    column surface. ``max_segments_per_trigger`` is the mock's
    ``maxOffsetsPerTrigger`` backpressure analog (file-source
    maxFilesPerTrigger under the hood)."""
    reader = spark.readStream.schema(KAFKA_SCHEMA)
    if max_segments_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_segments_per_trigger))
    raw = reader.option("pathGlobFilter", "segment-*.parquet").parquet(
        str(broker.topic_dir(topic))
    )
    return normalize_stream(raw, value_format)


def mock_kafka_sink(df: DataFrame, broker: MockBroker, topic: str, checkpoint: str):
    """Streaming sink with the real ``kafka_sink`` contract: df must carry
    key/value columns; delivery is once per micro-batch with contiguous
    per-partition offsets and key-based partitioning."""

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        for row in bdf.select("key", "value").collect():
            broker.produce(topic, row.key, row.value)
        broker.flush()

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
