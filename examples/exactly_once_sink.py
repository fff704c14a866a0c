"""Exactly-once (effectively-once) sink recipe at the engine surface.

The reference ships effectively-once delivery as the ConnectorSink 2PC
protocol (`core/sink/connector_sink/connector_sink_twopc.pony:36-72`): the
sink logs byte ranges per checkpoint and aborts/replays uncommitted ones on
restart. The Spark-native replacement is this composition:

    Pipeline.to_sink_foreach_batch( ManifestStreamWriter(table, query_id) )

- Structured Streaming's checkpoint WAL replays micro-batches after a
  crash with the SAME batch_id (the reference's checkpoint ids);
- ManifestStreamWriter embeds (query_id, batch_id) as a txn marker in the
  manifest log entry it commits ATOMICALLY with the batch's files
  (put-if-absent — the 2PC commit record, minus the coordinator);
- a replayed batch finds its marker and appends NOTHING, so the table is
  exactly-once under any crash/restart interleaving, including a crash
  BETWEEN the sink write and the WAL commit (the classic 2PC window).

Wired here to the market-spread app (the reference's flagship Python app):
the rejection stream lands in a ManifestTable; rerunning after new data —
or literally replaying an old batch — never duplicates a row. The same
writer works for any pipeline; swap ManifestStreamWriter for
MultiManifestStreamWriter when one batch must commit to several tables
atomically.

Run: python examples/exactly_once_sink.py [sf_dir] [out_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from wallaroo_spark.api.pipeline import Pipeline
from wallaroo_spark.sinks.manifest import ManifestStreamWriter, ManifestTable


def run_once(spark, src_dir: str, table: ManifestTable, checkpoint: str, schema):
    """One availableNow pass: stream the staged market-spread output into
    the manifest table through the engine's S14 sink surface. Restarting
    with the same checkpoint processes only NEW files; batches the WAL
    replays are deduplicated by their txn marker."""
    sdf = spark.readStream.schema(schema).parquet(src_dir)
    writer = ManifestStreamWriter(table, query_id="market_spread")
    q = Pipeline.source_df(sdf, ts_col="ts").to_sink_foreach_batch(
        writer, checkpoint=checkpoint, output_mode="append"
    )
    q.awaitTermination(180)
    return writer


if __name__ == "__main__":
    from pyspark.sql import functions as F

    from examples.market_spread import build
    from wallaroo_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="eos_")
    spark = get_spark("exactly-once-sink")
    spark.sparkContext.setLogLevel("ERROR")

    # stage the app output as arriving files (stands in for the live feed)
    staged = build(spark, sf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = out + "/src"
    staged.filter(F.col("order_id") % 2 == 0).write.mode("append").parquet(src)

    table = ManifestTable(out + "/table")
    ck = out + "/chk"
    w = run_once(spark, src, table, ck, staged.schema)
    n1 = table.read(spark).count()
    print(f"pass 1: {n1} rows, txns={sorted(w._committed_batches())}")

    # new data arrives; the restarted query processes ONLY the new files
    staged.filter(F.col("order_id") % 2 == 1).write.mode("append").parquet(src)
    w = run_once(spark, src, table, ck, staged.schema)
    n2 = table.read(spark).count()

    # the 2PC crash window: replay an already-committed batch by hand —
    # the txn marker makes it a no-op
    w(table.read(spark).limit(5), 0)
    n3 = table.read(spark).count()
    assert n2 == n3 == staged.count(), (n1, n2, n3)
    print(f"pass 2 + replay: {n3} rows (no duplicates), "
          f"txns={sorted(w._committed_batches())}")
    print(f"manifest table at {out}/table — exactly-once under restart")
