"""Sink layer (reference §2.5): exactly-once writers.

The reference's "effectively once" is a 2PC protocol tying sink transactions
to checkpoint ids (`connector_sink_twopc.pony:36-95`). Spark's equivalent
contract: a ``foreachBatch`` function that is **idempotent in batchId** —
re-delivered batches (after crash/recovery replays from the checkpoint WAL)
overwrite rather than append. That plus ``checkpointLocation`` gives
end-to-end exactly-once for deterministic queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(base_dir: str):
    """foreachBatch writer: one overwritten parquet dir per batchId.

    Replayed batch => same dir overwritten => no duplicates (the reference's
    txn-per-checkpoint, without the protocol).
    """

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(base_dir, f"batch_id={batch_id}"))

    return write


def fanout_sink(*sinks):
    """``to_sinks`` fan-out (reference `application.pony:193-219`): one
    foreachBatch fn driving N writers from a single streaming query.

    The reference builds one pipeline terminating in multiple sinks; the
    Spark-native equivalent is ONE query whose foreachBatch hands the same
    batch to every writer — the upstream computes once (vs. N separate
    queries re-reading the source). Each writer must itself be idempotent in
    batchId; then a crash between writers is safe: on replay, writers that
    already committed the batch overwrite, writers that didn't catch up.
    The batch DataFrame is persisted across the writers so N sinks don't
    recompute the micro-batch N times.
    """

    def write(df: DataFrame, batch_id: int) -> None:
        df.persist()
        try:
            for sink in sinks:
                sink(df, batch_id)
        finally:
            df.unpersist()

    return write


class TransactionalParquetSink:
    """Two-phase-commit parquet sink with a commit log — full parity with
    the reference's connector-sink 2PC (`connector_sink_twopc.pony:36-95`:
    prepare a txn per checkpoint, commit on barrier ack, abort orphans),
    not just dir-per-batch idempotence:

    - **prepare**: the micro-batch is written to an attempt-unique staging
      dir (``_staged/batch=<id>-<uuid>``) — never visible to readers;
    - **commit**: a put-if-absent commit record (``_txn/<id>.json``, atomic
      hard-link publish) points at exactly one staged attempt per batchId.
      A replayed batch finds the existing record, discards its own staged
      attempt, and commits nothing — exactly-once *visibility* no matter
      where a crash lands (before commit: orphan stage, invisible; after:
      replay is a no-op);
    - **read**: ``read()`` lists the commit log and reads only committed
      dirs — snapshot isolation over plain parquet files, the Delta-lite
      shape. Orphan staged attempts are garbage (``vacuum()`` removes
      them), never wrong answers.

    Single committing writer per sink dir (one streaming query), like the
    reference's single sink actor per txn stream.
    """

    def __init__(self, base_dir: str):
        self.base = base_dir
        self._staged = os.path.join(base_dir, "_staged")
        self._txn = os.path.join(base_dir, "_txn")
        os.makedirs(self._staged, exist_ok=True)
        os.makedirs(self._txn, exist_ok=True)

    # -- the foreachBatch fn ------------------------------------------------
    def __call__(self, df: DataFrame, batch_id: int) -> None:
        import json
        import shutil
        import uuid

        record = os.path.join(self._txn, f"{batch_id}.json")
        if os.path.exists(record):  # replayed batch: already committed
            return
        attempt = os.path.join(self._staged, f"batch={batch_id}-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(attempt)  # PREPARE (invisible)
        tmp = record + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "path": attempt}, f)
        try:
            os.link(tmp, record)  # COMMIT: atomic put-if-absent
        except FileExistsError:  # lost the race to a replay: drop our stage
            shutil.rmtree(attempt, ignore_errors=True)
        finally:
            os.unlink(tmp)

    # -- reader-side snapshot ----------------------------------------------
    def committed_paths(self) -> list[str]:
        import json

        paths = []
        for name in sorted(os.listdir(self._txn)):
            if name.endswith(".json"):
                with open(os.path.join(self._txn, name)) as f:
                    paths.append(json.load(f)["path"])
        return paths

    def read(self, spark) -> DataFrame:
        paths = self.committed_paths()
        if not paths:
            raise ValueError("no committed batches")
        return spark.read.parquet(*paths)

    def vacuum(self) -> int:
        """Remove orphan staged attempts (crashed before commit)."""
        import shutil

        live = set(self.committed_paths())
        removed = 0
        for name in os.listdir(self._staged):
            p = os.path.join(self._staged, name)
            if p not in live:
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        return removed


def memory_sink(sdf: DataFrame, name: str, checkpoint: str, trigger_available_now: bool = True):
    """Test sink: drain the stream into an in-memory table (complete/update
    handled by caller's output mode)."""
    w = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
