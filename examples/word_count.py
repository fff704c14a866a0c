"""word_count ported to wallaroo_spark.

Reference app: `examples/python/word_count/word_count.py:25-53` — decoder
splits lines, key_by(word), state computation counts per word emitting
(word, count) per message.

Here: the per-message running count is the `to_running` stage; the final
totals (what the reference's sink accumulates to) are a groupBy count.
Run: python examples/word_count.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table


def build(spark, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    return (
        Pipeline.source_df(docs)
        .to_multi(F.split("text", " "), out_name="word", keep=["doc_id"])
        .to(F.col("word") != "")          # decoder's empty-line filter
        .key_by("word")
    )


def totals(spark, sf_dir: str):
    p = build(spark, sf_dir)
    return p.df.groupBy("word").agg(F.count("*").alias("count"))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("word_count", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    totals(spark, sf).orderBy(F.desc("count")).show(10)
