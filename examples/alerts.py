"""alerts family ported to wallaroo_spark (stateless, stateful, windowed).

Reference apps: `examples/python/alerts_stateless`, `alerts_stateful`,
`examples/python/alerts_windowed/alerts.py:29-125` — a transactions stream;
emit an alert when a single transaction (stateless), a running total
(stateful), or a 9-second windowed total (windowed) crosses a threshold.

Run: python examples/alerts.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table

THRESHOLD = 300.0
WINDOW_THRESHOLD = 150.0  # hourly totals are smaller than single-event spikes


def stateless(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return (
        Pipeline.source_df(ev, ts_col="ts")
        .to(F.col("value") > THRESHOLD)
        .to({"alert": F.concat(F.lit("DepositAlert:"), F.col("value"))})
        .df.select("user_id", "ts", "alert")
    )


def stateful_running(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    p = (
        Pipeline.source_df(ev, ts_col="ts")
        .key_by("user_id")
        .to_running({"total": F.sum("value")}, tiebreak=["event_id"])
    )
    return p.df.filter(F.col("total") > 2000.0).select("user_id", "ts", "total")


def windowed(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    p = (
        Pipeline.source_df(ev, ts_col="ts")
        .key_by("user_id")
        .to_tumbling("1 hour", [F.sum("value").alias("total")])
    )
    return p.df.filter(F.col("total") > WINDOW_THRESHOLD).select(
        "user_id", "window_start", "total"
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("alerts", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    print("stateless:", stateless(spark, sf).count())
    print("stateful:", stateful_running(spark, sf).count())
    print("windowed:", windowed(spark, sf).count())
