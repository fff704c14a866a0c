"""External observability queries — parity with the reference's cluster
query protocol (`lib/wallaroo_labs/query/query_json.pony`, served to
`utils/cluster_shrinker` / external_sender clients).

JSON shapes mirror the reference encoders:

- ``cluster_status_query`` -> ``ClusterStatusQueryJsonEncoder.response``:
  ``{"worker_count": N, "worker_names": [...], "processing_messages": b}``.
- ``state_entity_count_query`` -> ``StateEntityCountQueryEncoder``:
  ``{state_name: entity_count}`` (entities = distinct keys).
- ``state_entity_query`` -> ``StateEntityQueryEncoder``:
  ``{state_name: [key, ...]}`` (small states only — this collects).
- ``partition_count_query`` ->
  ``PartitionQueryStateAndStatelessCountsEncoder``:
  ``{"state_partitions": {state_name: {worker: count}}}``.
- ``cluster_state_entity_count_query`` ->
  ``ClusterStateEntityCountQueryEncoder``: ``{worker: {state_name: n}}``.

Spark mapping: a "worker" is a shuffle partition slot (named
``partition_<i>``): a keyed operator's state entity for key k lives in
shuffle partition ``pmod(murmur3(k), n_partitions)`` — exactly Spark's
``HashPartitioning`` expression, the same role the reference's md5 ring
plays (`routing/hash_partitions.pony:23-29`). ``F.hash`` IS Murmur3Hash, so
the distribution reported here equals the physical layout bit-for-bit
(asserted in tests against ``spark_partition_id()``). Counts are computed
distributed (one agg); only the encoded summary reaches the driver.

The reference's shrink/autoscale protocol is intentionally absent: Spark's
dynamic allocation + AQE subsume stop-the-world state migration, so
``processing_messages`` is always true.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _worker_names(spark: SparkSession) -> list[str]:
    """Executor identities (local mode: the driver slot)."""
    try:
        mem = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        it = mem.keysIterator()
        names = []
        while it.hasNext():
            names.append(str(it.next()))
        return sorted(names)
    except Exception:  # pragma: no cover - JVM API drift fallback
        return ["driver"]


def cluster_status_query(spark: SparkSession) -> str:
    """ClusterStatusQueryJsonEncoder.response parity."""
    names = _worker_names(spark)
    return json.dumps(
        {
            "worker_count": len(names),
            "worker_names": names,
            # Spark has no stop-the-world migration phase (AQE + dynamic
            # allocation re-plan without halting the stream)
            "processing_messages": True,
        },
        sort_keys=True,
    )


def _entity_parts(df: DataFrame, keys: list[str], n_partitions: int) -> DataFrame:
    """(partition, key) pairs under Spark's HashPartitioning: the shuffle
    partition of key k is pmod(murmur3(k), n) — F.hash is Murmur3Hash."""
    return df.select(
        F.pmod(F.hash(*keys), F.lit(n_partitions)).alias("_part"),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("_key"),
    ).distinct()


def state_entity_count_query(
    df: DataFrame, keys: list[str], state_name: str
) -> str:
    """StateEntityCountQueryEncoder parity: {state_name: distinct keys}."""
    n = df.select(*keys).distinct().count()
    return json.dumps({state_name: n}, sort_keys=True)


def state_entity_query(df: DataFrame, keys: list[str], state_name: str) -> str:
    """StateEntityQueryEncoder parity: {state_name: [keys...]}. Collects —
    for small/diagnostic states only (the reference's query had the same
    full-enumeration cost)."""
    rows = (
        df.select(F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("k"))
        .distinct()
        .collect()
    )
    return json.dumps({state_name: sorted(r.k for r in rows)}, sort_keys=True)


def partition_count_query(
    df: DataFrame, keys: list[str], state_name: str, n_partitions: int | None = None
) -> str:
    """PartitionQueryStateAndStatelessCountsEncoder parity:
    {"state_partitions": {state_name: {worker: entity_count}}} where worker
    = the shuffle partition slot holding those entities."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    counts = (
        _entity_parts(df, keys, n)
        .groupBy("_part")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    by_worker = {f"partition_{r._part}": r.c for r in counts}
    return json.dumps({"state_partitions": {state_name: by_worker}}, sort_keys=True)


def cluster_state_entity_count_query(
    df: DataFrame, keys: list[str], state_name: str, n_partitions: int | None = None
) -> str:
    """ClusterStateEntityCountQueryEncoder parity:
    {worker: {state_name: entity_count}}."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    counts = (
        _entity_parts(df, keys, n)
        .groupBy("_part")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    return json.dumps(
        {f"partition_{r._part}": {state_name: r.c} for r in counts}, sort_keys=True
    )
