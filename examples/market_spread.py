"""market_spread ported to wallaroo_spark.

Reference app: `examples/python/market_spread/market_spread.py:42-170` —
two streams (orders + market data) merged, keyed by symbol; state keeps the
latest market snapshot per symbol; an order is rejected iff the spread is
wide (`should_reject = (offer - bid) >= 0.05 * mid`) at the order's time.

Relationally that state pattern IS an as-of join (SURVEY §3 fixture 3):
each order joined to the latest market row at-or-before it, then filtered.
Synthesized inputs come from the events table (purchase = order stream,
view = market stream) so the example runs on the driver's testdata.
Run: python examples/market_spread.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.operators.asof import asof_join
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table


def build(spark, sf_dir: str):
    ev = read_table(spark, sf_dir, "events")
    # synthesize the two streams: symbol = user_id, price-ish = value
    orders = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("symbol"),
        "ts",
        F.col("event_id").alias("order_id"),
        F.col("value").alias("price"),
    )
    market = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("symbol"),
        "ts",
        (F.col("value") * 0.99).alias("bid"),
        (F.col("value") * 1.01).alias("offer"),
    )
    enriched = asof_join(
        orders, market, on=["symbol"], left_ts="ts", right_ts="ts",
        right_values=["bid", "offer"],
    )
    mid = (F.col("bid") + F.col("offer")) / 2
    return enriched.withColumn(
        "rejected", ((F.col("offer") - F.col("bid")) >= 0.05 * mid)
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("market_spread", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = build(spark, sf)
    out.groupBy("rejected").count().show()
