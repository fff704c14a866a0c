"""Live JDBC round-trip through embedded Derby (r16, VERDICT r15 #5).

The reference's `connectors/templates/postgres_insert_sink` maps to
foreachBatch + df.write.jdbc; this was paper-only until r16 — Spark
ships the embedded Derby driver (Hive metastore dependency), which is a
real JDBC database, so the mapping is now pinned end-to-end: stream ->
jdbc_insert_sink -> Derby -> jdbc_read -> values verified, plus the
incremental keyset poll that stands in for LISTEN/NOTIFY.
"""

import shutil
import tempfile

import pytest

from wallaroo_spark.sinks.jdbc import (
    derby_url,
    jdbc_insert_sink,
    jdbc_poll_increment,
    jdbc_read,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_jdbc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_live_jdbc_roundtrip_and_incremental_poll(spark, tmpdir):
    url = derby_url(tmpdir + "/db")
    src = tmpdir + "/src"
    rows = [(i, f"value-{i}") for i in range(100)]
    spark.createDataFrame(rows, "k int, v string").repartition(4).write.parquet(src)

    sdf = spark.readStream.schema("k int, v string").parquet(src)
    q = (
        sdf.writeStream.foreachBatch(jdbc_insert_sink(url, "sunk"))
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = jdbc_read(spark, url, "sunk")
    got = {r.k: r.v for r in back.collect()}
    assert got == {k: v for k, v in rows}

    # incremental keyset poll (the LISTEN/NOTIFY stand-in): only rows
    # beyond the bookmark come back, filter pushed to the database
    newer = jdbc_poll_increment(spark, url, "sunk", "k", 89)
    assert sorted(r.k for r in newer.collect()) == list(range(90, 100))

    # at-least-once append semantics under replay: a second delivery of
    # the same batch duplicates rows (the template's own posture) —
    # demonstrated, not hidden
    batch = spark.read.parquet(src)
    jdbc_insert_sink(url, "sunk")(batch, batch_id=99)
    assert jdbc_read(spark, url, "sunk").count() == 200


def test_poll_increment_string_bookmark_quoting(spark, tmpdir):
    """r16 review: string bookmarks (including embedded quotes) must render
    as standard single-quoted SQL literals, not Python repr."""
    url = derby_url(tmpdir + "/db2")
    rows = [("a", 1), ("it's", 2), ("z", 3)]
    df = spark.createDataFrame(rows, "k string, v int")
    from wallaroo_spark.sinks.jdbc import jdbc_insert_sink

    jdbc_insert_sink(
        url, "s", createTableColumnTypes="k VARCHAR(128), v INTEGER"
    )(df, batch_id=0)
    got = sorted(r.k for r in jdbc_poll_increment(spark, url, "s", "k", "it's").collect())
    assert got == ["z"]
    got_all = sorted(r.k for r in jdbc_poll_increment(spark, url, "s", "k", "").collect())
    assert got_all == ["a", "it's", "z"]
