"""SparkSession construction + testdata catalog helpers.

Tuned for the local[32] harness but written for cluster scale: AQE on
(runtime coalesce + skew-join), Arrow on (pandas-UDF fast path), shuffle
partitions sized to cores locally (on a real cluster you'd size to
``max(2*total_cores, input_bytes / 128MB)``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "wallaroo_spark", cpus: int | None = None) -> SparkSession:
    """Build a local session mirroring the driver's config.

    On a real cluster, drop ``master`` and memory configs; everything else
    (AQE, Arrow, UTC, shuffle-partition sizing) carries over unchanged.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/wallaroo_spark_warehouse"),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
        # fresh Python worker per task: reused workers accumulate memory
        # from earlier Arrow stages and a long session's late applyInPandas
        # stages degrade 5-10x (measured: the aggregation cascade went
        # 48s -> 5s mid-suite). Fork+import costs ~ms per task — cheap next
        # to any real Python stage; closures are pickled by value anyway.
        .config("spark.python.worker.reuse", "false")
        .getOrCreate()
    )


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every testdata parquet as a DataFrame (lazy; scans prune/push)."""
    from wallaroo_spark.sources import read_table

    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register the testdata tables as temp views for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
