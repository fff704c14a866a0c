"""celsius ported to wallaroo_spark.

Reference app: `examples/python/celsius-kafka/celsius.py:38-56` — pure
stateless map (°C -> °F) between a Kafka source and sink.

Stand-in input: events.value as the temperature stream; swap the source/sink
for `wallaroo_spark.sources.kafka` against a real broker.
Run: python examples/celsius.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table


def build(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return (
        Pipeline.source_df(ev, ts_col="ts")
        .to(
            {
                "celsius": F.col("value"),
                "fahrenheit": F.round(F.col("value") * 9.0 / 5.0 + 32.0, 4),
            }
        )
        .df.select("event_id", "ts", "celsius", "fahrenheit")
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("celsius", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, sf).show(5)
