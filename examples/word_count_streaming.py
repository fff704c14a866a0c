"""Streaming word_count — the reference app's actual shape (unbounded
stream, per-message running counts).

Reference: `examples/python/word_count/word_count.py` — split lines,
key_by(word), per-key running count emitted on every message.

Here the stream comes from files (swap for Kafka via
`wallaroo_spark.sources.kafka.kafka_source`); the running count is the
keyed-state operator; the sink is the idempotent foreachBatch writer.
Run: python examples/word_count_streaming.py [sf_dir] [out_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline
from wallaroo_spark.session import get_spark
from wallaroo_spark.sinks import idempotent_parquet_sink


def run(spark, sf_dir: str, out_dir: str, chk_dir: str):
    # stage the documents as a file stream (stand-in for the TCP source)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    stage = tempfile.mkdtemp(prefix="wc_in_")
    docs.write.mode("overwrite").parquet(stage)
    sdf = spark.readStream.schema(docs.schema).parquet(stage)

    def count_word(row, state):
        w = row["word"]
        state[w] = state.get(w, 0) + 1
        return [{"word_group": row["word_group"], "word": w, "count": state[w]}]

    p = (
        Pipeline.source_df(sdf)
        # split first (computation_multi), THEN key — every occurrence of a
        # word must land on the same state partition. The reference keys by
        # the word itself; first-letter sharding keeps the same guarantee
        # (word -> one key) with fewer, fatter states.
        .to_multi(F.split("text", " "), out_name="word", keep=["doc_id"])
        .to(F.col("word") != "")
        .to({"word_group": F.substring("word", 1, 1)})
        .key_by("word_group")
        .to_state(
            count_word,
            dict,
            "word_group string, word string, count long",
            "words map<string,bigint>",
            pack=lambda st: (dict(st),),
            unpack=lambda tup: dict(tup[0] or {}),
        )
    )
    return p.to_sink_foreach_batch(idempotent_parquet_sink(out_dir), chk_dir)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="wc_out_")
    spark = get_spark("word_count_streaming", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = run(spark, sf, out, tempfile.mkdtemp(prefix="wc_chk_"))
    q.awaitTermination(300)
    res = spark.read.option("recursiveFileLookup", "true").parquet(out)
    res.groupBy("word").agg(F.max("count").alias("total")).orderBy(
        F.desc("total")
    ).show(10)
