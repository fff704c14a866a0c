"""ManifestTable (Delta-lite versioned manifest log): atomicity, time
travel, compaction, crash windows, commit races."""

import os

from pyspark.sql import Row

from wallaroo_spark.sinks.manifest import ManifestTable


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(i=i, v=f"v{i}") for i in range(lo, hi)])


def test_append_and_time_travel(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    v0 = t.append(_df(spark, 0, 5))
    v1 = t.append(_df(spark, 5, 8))
    assert (v0, v1) == (0, 1)
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(8))
    assert sorted(r.i for r in t.read(spark, version=0).collect()) == list(range(5))


def test_overwrite_replaces_snapshot_keeps_history(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    t.overwrite(_df(spark, 100, 103))
    assert sorted(r.i for r in t.read(spark).collect()) == [100, 101, 102]
    # history intact
    assert sorted(r.i for r in t.read(spark, version=0).collect()) == list(range(5))


def test_crash_before_commit_is_invisible_and_vacuumable(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 3))
    # a writer that crashed after writing data but before the log link
    t._write_parts(_df(spark, 50, 60))
    assert sorted(r.i for r in t.read(spark).collect()) == [0, 1, 2]
    assert t.vacuum() == 0  # retention: fresh dirs are never vacuumed
    assert t.vacuum(min_age_s=0) == 1
    assert sorted(r.i for r in t.read(spark).collect()) == [0, 1, 2]


def test_compact_preserves_rows_single_swap(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    for k in range(3):
        t.append(_df(spark, 10 * k, 10 * k + 10))
    before_files = len(t.snapshot_files())
    assert before_files >= 3
    pre_version = t.versions()[-1]
    t.compact(n_files=1)
    assert len(t.snapshot_files()) == 1
    assert sorted(r.i for r in t.read(spark).collect()) == sorted(
        i for k in range(3) for i in range(10 * k, 10 * k + 10)
    )
    # exactly one atomic entry; pre-compaction snapshot still readable
    assert t.versions()[-1] == pre_version + 1
    assert len(t.snapshot_files(version=pre_version)) == before_files
    assert sorted(r.i for r in t.read(spark, version=pre_version).collect()) == sorted(
        i for k in range(3) for i in range(10 * k, 10 * k + 10)
    )


def test_commit_race_serializes_both_commits(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 2))
    # two writers race for version 1: pre-place a competing log entry the
    # instant before _commit links, by hijacking versions() once
    a_files = t._write_parts(_df(spark, 10, 12))
    b_files = t._write_parts(_df(spark, 20, 22))
    real_versions = t.versions
    calls = {"n": 0}

    def racy_versions():
        vs = real_versions()
        if calls["n"] == 0:
            calls["n"] += 1
            # competitor lands version 1 between our read and our link
            t._commit_competitor(b_files)
        return vs

    def commit_competitor(files):
        t.versions = real_versions
        t._commit(adds=files, removes=[])
        t.versions = racy_versions

    t._commit_competitor = commit_competitor
    t.versions = racy_versions
    t._commit(adds=a_files, removes=[])
    t.versions = real_versions
    assert t.versions() == [0, 1, 2]
    assert sorted(r.i for r in t.read(spark).collect()) == [0, 1, 10, 11, 20, 21]


def test_read_empty_raises(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    try:
        t.read(spark)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_stream_writer_exactly_once_across_restart(spark, tmp_path):
    """ManifestStreamWriter: a streaming query restarted from its
    checkpoint must not duplicate rows in the table (txn batch-id dedup),
    and a literal replay of an already-committed batch appends nothing."""
    from wallaroo_spark.sinks.manifest import ManifestStreamWriter

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    t = ManifestTable(str(tmp_path / "t"))
    w = ManifestStreamWriter(t, query_id="etl")

    def run_round():
        sdf = spark.readStream.schema("i long, v string").parquet(src)
        q = (
            sdf.writeStream.foreachBatch(w)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _df(spark, 0, 5).write.mode("append").parquet(src)
    run_round()
    _df(spark, 5, 9).write.mode("append").parquet(src)
    run_round()  # restart from checkpoint: only the new files process
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(9))

    # hard replay of batch 0 (as after a crash between sink and WAL commit)
    w(_df(spark, 0, 5), 0)
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(9))
    # and the table's history shows exactly 2 committed txn batches
    assert len(w._committed_batches()) == 2


def test_overwrite_race_is_last_writer_wins(spark, tmp_path):
    """A lost overwrite race must re-evaluate removes: the retry removes
    the racer's snapshot too (last-writer-wins), never a silent merge."""
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 3))
    b_files = t._write_parts(_df(spark, 20, 22))
    real_versions = t.versions
    fired = {"done": False}

    def racy_versions():
        vs = real_versions()
        if not fired["done"]:
            fired["done"] = True
            t.versions = real_versions
            t._commit(adds=b_files, removes=[])  # racer appends 20,21
            t.versions = racy_versions
        return vs

    t.versions = racy_versions
    t.overwrite(_df(spark, 100, 102))
    t.versions = real_versions
    # the winner of the final version is the overwrite; the racer's data
    # must NOT survive alongside it
    assert sorted(r.i for r in t.read(spark).collect()) == [100, 101]


def test_compact_aborts_on_concurrent_commit(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 3))
    extra = t._write_parts(_df(spark, 50, 52))
    real_versions = t.versions
    fired = {"done": False}

    def racy_versions():
        vs = real_versions()
        if not fired["done"]:
            fired["done"] = True
            t.versions = real_versions
            t._commit(adds=extra, removes=[])
            t.versions = racy_versions
        return vs

    t.versions = racy_versions
    try:
        try:
            t.compact()
            assert False, "expected ValueError on concurrent commit"
        except ValueError:
            pass
    finally:
        t.versions = real_versions
    # nothing lost: both commits' data intact, compaction simply didn't land
    assert sorted(r.i for r in t.read(spark).collect()) == [0, 1, 2, 50, 51]


def test_log_checkpoint_seeds_reads_and_time_travel(spark, tmp_path):
    """Log checkpointing (round-7 #2): with checkpoint_interval=3 the table
    auto-checkpoints; current reads seed from the checkpoint (proven by
    tampering: log entries at-or-below the checkpoint are moved aside and
    the snapshot is still correct), while time travel BELOW the oldest
    checkpoint replays the prefix as before."""
    t = ManifestTable(str(tmp_path / "t"), checkpoint_interval=3)
    t.append(_df(spark, 0, 3))        # v0
    t.overwrite(_df(spark, 10, 14))   # v1
    t.append(_df(spark, 14, 16))      # v2 -> auto-checkpoint @2
    t.append(_df(spark, 16, 18))      # v3
    assert t._checkpoint_versions() == [2]
    want_now = sorted(r.i for r in t.read(spark).collect())
    assert want_now == list(range(10, 18))
    # time travel below the checkpoint: full-prefix replay
    assert sorted(r.i for r in t.read(spark, version=0).collect()) == [0, 1, 2]

    # tamper: hide entries <= checkpoint; current snapshot must still
    # resolve (checkpoint-seeded), proving reads do NOT replay them
    for v in (0, 1, 2):
        os.rename(
            str(tmp_path / "t" / "_log" / f"{v}.json"),
            str(tmp_path / "t" / "_log" / f"{v}.hidden"),
        )
    assert sorted(r.i for r in t.read(spark).collect()) == want_now
    assert t.versions() == [3]


def test_explicit_checkpoint_and_race_harmless(spark, tmp_path):
    """Manual checkpoint(): idempotent (second call at the same version is
    a no-op race) and snapshot-equivalent before/after."""
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 4))
    t.append(_df(spark, 4, 6))
    before = sorted(r.i for r in t.read(spark).collect())
    assert t.checkpoint() == 1
    assert t.checkpoint() == 1  # same version again: put-if-absent no-op
    assert t._checkpoint_versions() == [1]
    assert sorted(r.i for r in t.read(spark).collect()) == before
    # empty table checkpoints to None
    t2 = ManifestTable(str(tmp_path / "t2"))
    assert t2.checkpoint() is None


def test_stream_writer_txns_survive_checkpoint(spark, tmp_path):
    """Exactly-once marker continuity: a batch committed BEFORE a log
    checkpoint must still be recognized as committed afterwards (txn
    markers ride into the checkpoint), even with its log entry hidden."""
    from wallaroo_spark.sinks.manifest import ManifestStreamWriter

    t = ManifestTable(str(tmp_path / "t"))
    w = ManifestStreamWriter(t, query_id="q1")
    w(_df(spark, 0, 5), batch_id=0)  # v0 with txn marker
    t.checkpoint()
    os.rename(
        str(tmp_path / "t" / "_log" / "0.json"),
        str(tmp_path / "t" / "_log" / "0.hidden"),
    )
    w(_df(spark, 0, 5), batch_id=0)  # replay: must append NOTHING
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(5))
    assert t.committed_txns("q1") == {0}


def test_expire_log_retains_current_and_blocks_expired_travel(spark, tmp_path):
    """expire_log removes entries at-or-below the newest checkpoint; current
    reads and at-checkpoint time travel still work, commits continue with
    correct version numbers, and travel BELOW the horizon raises instead of
    silently replaying a truncated log."""
    import pytest as _pytest

    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 3))       # v0
    t.overwrite(_df(spark, 10, 13))  # v1
    t.append(_df(spark, 13, 15))     # v2
    t.checkpoint()                   # @2
    t.append(_df(spark, 15, 17))     # v3
    assert t.expire_log() == 3       # v0..v2 gone
    assert t.versions() == [3]
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(10, 17))
    assert sorted(r.i for r in t.read(spark, version=2).collect()) == list(range(10, 15))
    with _pytest.raises(ValueError, match="expired"):
        t.read(spark, version=1)
    # commits continue above the checkpoint horizon even after full expiry
    t.checkpoint()                   # @3
    assert t.expire_log() == 1       # v3 gone; log now empty
    v = t.append(_df(spark, 17, 18))
    assert v == 4                    # NOT 0 — checkpoint horizon respected
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(10, 18))


def test_vacuum_keeps_checkpoint_referenced_dirs(spark, tmp_path):
    """After expire_log, files referenced ONLY via checkpoints must survive
    vacuum — otherwise expiry would tear live data out of the table."""
    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 4))   # v0
    t.checkpoint()               # @0
    t.expire_log()               # v0's log entry gone; adds live in the checkpoint
    assert t.vacuum(min_age_s=0) == 0
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(4))


def test_time_travel_between_checkpoints_after_expiry_raises(spark, tmp_path):
    """Review finding: with TWO checkpoints, expire_log removes everything
    at-or-below the NEWEST; travel to a version between the checkpoints
    must raise (its replay entries are gone), not silently return the
    older checkpoint's state."""
    import pytest as _pytest

    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 2))    # v0
    t.append(_df(spark, 2, 4))    # v1
    t.checkpoint()                # @1
    t.append(_df(spark, 4, 6))    # v2
    t.append(_df(spark, 6, 8))    # v3
    t.checkpoint()                # @3
    t.expire_log()                # v0..v3 gone
    # at-checkpoint travel still fine
    assert sorted(r.i for r in t.read(spark, version=1).collect()) == list(range(4))
    assert sorted(r.i for r in t.read(spark, version=3).collect()) == list(range(8))
    # BETWEEN checkpoints: v2's entry is expired and checkpoint @1 cannot
    # stand in for it
    with _pytest.raises(ValueError, match="expired"):
        t.read(spark, version=2)


def test_expire_log_keep_checkpoints_preserves_travel_window(spark, tmp_path):
    """keep_checkpoints=2: entries above the second-newest checkpoint
    survive, so time travel works at EVERY version >= that horizon; below
    it still raises."""
    import pytest as _pytest

    t = ManifestTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 2))    # v0
    t.checkpoint()                # @0
    t.append(_df(spark, 2, 4))    # v1
    t.append(_df(spark, 4, 6))    # v2
    t.checkpoint()                # @2
    t.append(_df(spark, 6, 8))    # v3
    assert t.expire_log(keep_checkpoints=2) == 1  # only v0 falls at/below @0
    # full travel window back to the older checkpoint's horizon
    for v, hi in [(0, 2), (1, 4), (2, 6), (3, 8)]:
        assert sorted(r.i for r in t.read(spark, version=v).collect()) == list(range(hi))
    # minimum retention afterwards: horizon jumps to the newest checkpoint
    assert t.expire_log() == 2  # v1, v2
    with _pytest.raises(ValueError, match="expired"):
        t.read(spark, version=1)
    with _pytest.raises(ValueError):
        t.expire_log(keep_checkpoints=0)


def test_engine_surface_exactly_once_recipe(spark, tmp_path):
    """VERDICT r11 #6: the documented effectively-once ConnectorSink
    replacement at the ENGINE surface — Pipeline.to_sink_foreach_batch +
    ManifestStreamWriter (examples/exactly_once_sink.py) — restart-replays
    without duplicates: a second availableNow pass over the same
    checkpoint processes only new files, and a hard replay of a committed
    batch appends nothing."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from exactly_once_sink import run_once

    from wallaroo_spark.sinks.manifest import ManifestStreamWriter

    src = str(tmp_path / "src")
    t = ManifestTable(str(tmp_path / "t"))
    ck = str(tmp_path / "ck")
    d1 = _df(spark, 0, 6)
    d1.write.mode("append").parquet(src)
    w = run_once(spark, src, t, ck, d1.schema)
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(6))

    _df(spark, 6, 10).write.mode("append").parquet(src)
    w = run_once(spark, src, t, ck, d1.schema)
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(10))

    # 2PC crash window: replaying committed batch 0 is a no-op
    w(_df(spark, 0, 6), 0)
    assert sorted(r.i for r in t.read(spark).collect()) == list(range(10))
    assert len(w._committed_batches()) == 2
