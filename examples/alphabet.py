"""alphabet ported to wallaroo_spark.

Reference app: `examples/python/alphabet/alphabet.py:73-86` — a votes
stream; key_by(letter), keyed running vote total emitted per message.

Stand-in input: events, letter = first char of event_type, votes = 1.
Run: python examples/alphabet.py [sf_dir]
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
    p = (
        Pipeline.source_df(ev, ts_col="ts")
        .to({"letter": F.substring("event_type", 1, 1), "votes": F.lit(1)})
        .key_by("letter")
        .to_running({"total_votes": F.sum("votes")}, tiebreak=["event_id"])
    )
    return p.df.select("letter", "ts", "total_votes")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("alphabet", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = build(spark, sf)
    out.groupBy("letter").agg(F.max("total_votes").alias("final")).orderBy("letter").show()
