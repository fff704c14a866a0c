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


def test_put_if_absent_crash_mid_write_leaves_no_object(tmpdir, monkeypatch):
    """r16 (ADVICE r15): a crash mid-body must NOT leave a truncated object
    that later replays skip on EEXIST — the body lands in a tmp file and is
    published atomically via os.link, so an interrupted put leaves the key
    absent and the replay succeeds with the full body."""
    import os

    from wallaroo_spark.sinks import bucket as bkt_mod

    b = ObjectBucket(tmpdir + "/bkt")

    real_write = os.write
    calls = {"n": 0}

    def short_then_die(fd, data):
        calls["n"] += 1
        real_write(fd, bytes(data)[:3])  # simulate a short write...
        raise OSError("simulated crash mid-write")

    monkeypatch.setattr(bkt_mod.os, "write", short_then_die)
    with pytest.raises(OSError, match="simulated"):
        b.put_if_absent("k/crash", b"full-body-bytes")
    monkeypatch.setattr(bkt_mod.os, "write", real_write)

    # the key must be ABSENT (not a truncated 3-byte object) ...
    assert b.list("k/") == []
    # ... so the redelivery converges on the complete body
    assert b.put_if_absent("k/crash", b"full-body-bytes")
    assert b.get("k/crash") == b"full-body-bytes"
    # and no tmp residue is served or left behind
    assert b.list() == ["k/crash"]
    leftovers = [p for p in os.listdir(tmpdir + "/bkt/k") if p.startswith("_tmp_")]
    assert leftovers == []


def test_put_if_absent_loser_sees_complete_winner_body(tmpdir):
    """The loser of a same-key race must observe the winner's FULL body
    (os.link publishes all-or-nothing), and short os.write returns are
    retried to completion."""
    b = ObjectBucket(tmpdir + "/bkt")
    big = bytes(range(256)) * 4096  # 1 MiB — multiple write() chunks at least once
    assert b.put_if_absent("k/big", big)
    assert not b.put_if_absent("k/big", b"loser")
    assert b.get("k/big") == big
