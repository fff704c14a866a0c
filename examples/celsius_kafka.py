"""celsius-kafka — the reference app END-TO-END over the wire broker.

Reference: `examples/python/celsius-kafka/celsius.py:26-56` — a stateless
pipeline between a Kafka SOURCE and a Kafka SINK: decode a float from the
message bytes, `multiply by 1.8`, `add 32`, encode `"%.6f"` back to Kafka
(value, key=None, partition=None).

r15's celsius example stood in with a parquet source ("swap for a real
broker"); r16's wire-level Kafka (`sources/kafka_wire.py`) removes the
stand-in: temperatures are PRODUCED to a real socket broker speaking the
real binary protocol, consumed per-partition into the streaming spool,
converted by the same Pipeline facade ops the reference app uses, and the
Fahrenheit strings are produced back to an OUTPUT topic over the wire
from the executors — the full celsius-kafka loop with no broker binary in
the container.

Run: python examples/celsius_kafka.py [n_readings]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources.kafka import normalize_stream
from wallaroo_spark.sources.kafka_wire import (
    KafkaWireClient,
    KafkaWireReceiver,
    MiniKafkaBroker,
    kafka_wire_sink,
    partition_for,
    wire_stream,
)

IN_TOPIC, OUT_TOPIC, PARTITIONS = "celsius", "fahrenheit", 2


def feed(broker: MiniKafkaBroker, n: int) -> None:
    """The reference harness's sender: float readings as utf-8 text
    messages, keyed by sensor id (keyed -> stable partition)."""
    client = KafkaWireClient(broker.host, broker.port)
    try:
        now = int(time.time() * 1000)
        groups: dict[int, list] = {}
        for i in range(n):
            key = f"sensor-{i % 7}".encode()
            value = f"{(i % 80) - 20}.{i % 10}".encode()  # -20.0 .. 59.9 C
            groups.setdefault(partition_for(key, PARTITIONS), []).append(
                (key, value, now)
            )
        for part, recs in groups.items():
            client.produce(IN_TOPIC, part, recs)
    finally:
        client.close()


def build(spark, spool_dir: str):
    """The reference pipeline: decode -> multiply by 1.8 -> add 32."""
    src = normalize_stream(wire_stream(spark, spool_dir))
    return (
        Pipeline.source_df(src, ts_col="event_ts")
        # decoder: float(bs.decode()) with the reference's 0.0 fallback
        .to({"celsius": F.coalesce(F.col("value").cast("double"), F.lit(0.0)),
             "key": F.col("key")})
        .to({"key": F.col("key"), "data": F.col("celsius") * 1.8})   # multiply
        .to({"key": F.col("key"), "data": F.col("data") + 32})       # add
        # encoder: ("%.6f" % data, None, None) — value bytes, default key
        .to({"key": F.col("key"),
             "value": F.format_number(F.col("data"), 6)})
        .df.select("key", F.regexp_replace("value", ",", "").alias("value"))
    )


def run(spark, broker: MiniKafkaBroker, spool: str, chk: str, n: int = 200):
    broker.create_topic(IN_TOPIC, PARTITIONS)
    broker.create_topic(OUT_TOPIC, PARTITIONS)
    feed(broker, n)
    receivers = [
        KafkaWireReceiver(spool, broker.host, broker.port, IN_TOPIC, p).start()
        for p in range(PARTITIONS)
    ]
    deadline = time.monotonic() + 30
    while (
        sum(r.records_received for r in receivers) < n
        and time.monotonic() < deadline
    ):
        time.sleep(0.05)
    q = (
        build(spark, spool)
        .writeStream.foreachBatch(
            kafka_wire_sink(broker.host, broker.port, OUT_TOPIC)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for r in receivers:
        r.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("celsius_kafka", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    broker = MiniKafkaBroker().start()
    try:
        run(
            spark, broker,
            tempfile.mkdtemp(prefix="ck_spool_"),
            tempfile.mkdtemp(prefix="ck_chk_"),
            n,
        )
        client = KafkaWireClient(broker.host, broker.port)
        out = []
        for p in range(PARTITIONS):
            out += client.fetch(OUT_TOPIC, p, 0)[1]
        client.close()
        print(f"{len(out)} fahrenheit readings; sample:")
        for _o, k, v, _t in out[:5]:
            print(" ", k.decode(), v.decode())
    finally:
        broker.stop()
