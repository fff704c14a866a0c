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
