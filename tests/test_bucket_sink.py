"""Object-bucket sink: per-row objects from executors, replay-safe.

Reference parity target: `connectors/s3_bucket_sink` (put_object per
(key, body) value). The engine's default is put-if-absent so redelivered
micro-batches converge; overwrite=True is the reference's blind put.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from wallaroo_spark.sinks.bucket import ObjectBucket, object_bucket_sink


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ws_bucket_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucket_contract(tmpdir):
    b = ObjectBucket(tmpdir + "/bkt")
    assert b.put_if_absent("a/1", b"one")
    assert not b.put_if_absent("a/1", b"ONE")  # first write wins
    assert b.get("a/1") == b"one"
    b.put("a/1", b"ONE")  # blind put overwrites
    assert b.get("a/1") == b"ONE"
    assert b.put_if_absent("a/2", b"two") and b.put_if_absent("b/3", b"three")
    assert b.list() == ["a/1", "a/2", "b/3"]
    assert b.list("a/") == ["a/1", "a/2"]
    assert b.delete("a/2") and not b.delete("a/2")
    with pytest.raises(ValueError, match="escapes"):
        b.put_if_absent("../outside", b"x")
    with pytest.raises(ValueError, match="escapes"):
        b.get("../../etc/hostname")


def test_streaming_objects_and_replay_convergence(spark, tmpdir):
    """Stream -> one object per key from the executors; re-running the
    same foreachBatch (a crash redelivery) converges: same objects, same
    bodies, no error."""
    src = tmpdir + "/src"
    bkt = tmpdir + "/bkt"
    rows = [(f"doc/{i}", f"body-{i}") for i in range(50)]
    spark.createDataFrame(rows, "key string, body string").write.parquet(src)

    sdf = spark.readStream.schema("key string, body string").parquet(src)
    sink = object_bucket_sink(bkt, "key", "body")
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tmpdir + "/chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    b = ObjectBucket(bkt)
    assert len(b.list("doc/")) == 50
    assert b.get("doc/7") == b"body-7"

    # redelivery: the same batch applied again must be a no-op
    batch = spark.read.parquet(src)
    sink(batch, batch_id=99)
    assert len(b.list("doc/")) == 50
    assert b.get("doc/7") == b"body-7"

    # reference-parity blind put: second delivery rewrites
    ow = object_bucket_sink(bkt, "key", "body", overwrite=True)
    ow(batch.withColumn("body", F.concat(F.col("body"), F.lit("!"))), batch_id=100)
    assert b.get("doc/7") == b"body-7!"
