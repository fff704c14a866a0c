"""Observability query surface: parity with the reference's cluster query
protocol JSON shapes (`lib/wallaroo_labs/query/query_json.pony`), and the
load-bearing claim that the reported entity->partition distribution equals
Spark's PHYSICAL hash partitioning."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark import observability as O


def _df(spark, n_keys=50, rows_per_key=4):
    return spark.createDataFrame(
        [Row(k=f"key_{i % n_keys}", v=i) for i in range(n_keys * rows_per_key)]
    )


def test_cluster_status_shape(spark):
    d = json.loads(O.cluster_status_query(spark))
    assert set(d) == {"worker_count", "worker_names", "processing_messages"}
    assert d["worker_count"] == len(d["worker_names"]) >= 1
    assert d["processing_messages"] is True


def test_state_entity_counts_and_keys(spark):
    df = _df(spark)
    assert json.loads(O.state_entity_count_query(df, ["k"], "letter-state")) == {
        "letter-state": 50
    }
    keys = json.loads(O.state_entity_query(df, ["k"], "letter-state"))["letter-state"]
    assert len(keys) == 50 and keys == sorted(keys) and "key_0" in keys


def test_partition_counts_match_physical_layout(spark):
    """The protocol's {worker: entity_count} must equal the ACTUAL shuffle
    layout: pmod(murmur3(key), n) is what repartition(n, key) does."""
    df = _df(spark)
    n = 8
    d = json.loads(O.partition_count_query(df, ["k"], "letter-state", n))
    reported = d["state_partitions"]["letter-state"]

    actual = {
        f"partition_{r.pid}": r.c
        for r in df.select("k")
        .distinct()
        .repartition(n, "k")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert reported == actual
    assert sum(reported.values()) == 50


def test_cluster_entity_counts_pivot(spark):
    df = _df(spark)
    d = json.loads(O.cluster_state_entity_count_query(df, ["k"], "letter-state", 4))
    assert sum(v["letter-state"] for v in d.values()) == 50
    assert all(k.startswith("partition_") for k in d)
