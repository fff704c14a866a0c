"""Query registry: every implemented operator exposed as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB oracle SQL string.

This is the correctness surface the driver hash-checks (CORRECTNESS_r{N});
each entry corresponds to a SURVEY.md §2 operator or an extension operator
(dedup / similarity / text). Column names are aliased identically on both
sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wallaroo_spark.operators import asof, compute, windows
from wallaroo_spark.sources import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_t = read_table


# ---------------------------------------------------------------------------
# Window family (reference S5-S12 — SURVEY §2.1)
# ---------------------------------------------------------------------------

@query(
    "tumbling_window_sum",
    oracle="""
    SELECT user_id,
           date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 tumbling range window (aligned), batch mode: per-user hourly agg."""
    ev = _t(spark, sf_dir, "events")
    return windows.tumbling(
        ev,
        ts="ts",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
        size="1 hour",
    )


@query(
    "sliding_window_sum",
    oracle="""
    SELECT e.user_id,
           to_timestamp(floor(epoch(e.ts) / 900) * 900 - g.k * 900) AS window_start,
           to_timestamp(floor(epoch(e.ts) / 900) * 900 - g.k * 900 + 3600) AS window_end,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e, generate_series(0, 3) g(k)
    GROUP BY 1, 2, 3
    """,
)
def sliding_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 sliding window range=1h slide=15m: each event lands in 4 windows."""
    ev = _t(spark, sf_dir, "events")
    return windows.sliding(
        ev,
        ts="ts",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
        size="1 hour",
        slide="15 minutes",
    )


@query(
    "count_window_sum",
    oracle="""
    WITH numbered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(floor((rn - 1) / 5) AS BIGINT) AS window_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY 1, 2
    """,
)
def count_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 count window (n=5 per key), batch semantics (ordered by ts)."""
    ev = _t(spark, sf_dir, "events")
    return windows.count_windows(
        ev,
        ts="ts",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
        n=5,
        order_tiebreak=["event_id"],
    ).select("user_id", "window_id", "n_events", "total_value")


@query(
    "running_total",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_seen
    FROM events
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 global-window per-message running aggregation (alphabet/alerts
    running-count semantics: one output per input)."""
    ev = _t(spark, sf_dir, "events")
    out = windows.running(
        ev,
        ts="ts",
        keys=["user_id"],
        exprs={"running_value": F.sum("value"), "n_seen": F.count("*")},
        order_tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.round("running_value", 2).alias("running_value"), "n_seen"
    )


@query(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS window_start,
           max(ts) + INTERVAL 30 MINUTE AS window_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 ephemeral/session windows via native session_window (gap=30m)."""
    ev = _t(spark, sf_dir, "events")
    return windows.session_windows(
        ev,
        ts="ts",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
        gap="30 minutes",
    )


@query(
    "global_collect_agg",
    oracle="""
    SELECT count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def global_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 collect(): funnel to a single partition = keyless global agg
    (Spark does partial agg per partition first — no 1-partition bottleneck)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Stateless computation family (S2, §2.2) — alerts / celsius / word_count
# ---------------------------------------------------------------------------

@query(
    "stateless_filter_alerts",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CASE WHEN value > 150 THEN 'high' ELSE 'error' END AS alert_kind
    FROM events
    WHERE value > 150 OR event_type = 'error'
    """,
)
def stateless_filter_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 stateless computation with None-filtering (alerts_stateless
    semantics: emit alert iff threshold crossed). Predicate pushes to scan."""
    ev = _t(spark, sf_dir, "events")
    filtered = compute.compute_filter(
        ev, (F.col("value") > 150) | (F.col("event_type") == "error")
    )
    return compute.compute(
        filtered,
        {
            "alert_kind": F.when(F.col("value") > 150, F.lit("high")).otherwise(
                F.lit("error")
            )
        },
    ).select("event_id", "user_id", "ts", "value", "alert_kind")


@query(
    "stateless_map_projection",
    oracle="""
    SELECT event_id,
           round(value * 9.0 / 5.0 + 32.0, 4) AS fahrenheit,
           upper(event_type) AS event_type_uc
    FROM events
    """,
)
def stateless_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 pure map (celsius semantics °C→°F) as a projected compute stage;
    scan reads only 3 columns (column pruning)."""
    ev = _t(spark, sf_dir, "events")
    return compute.compute(
        ev,
        {
            "event_id": F.col("event_id"),
            "fahrenheit": F.round(F.col("value") * 9.0 / 5.0 + 32.0, 4),
            "event_type_uc": F.upper("event_type"),
        },
        keep=False,
    )


@query(
    "word_count",
    oracle="""
    SELECT w.word AS word, count(*) AS n
    FROM documents d, unnest(string_split(d.text, ' ')) AS w(word)
    WHERE w.word <> ''
    GROUP BY 1
    """,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """computation_multi (1→N flatMap) + key_by + running count — word_count
    (`examples/python/word_count/word_count.py:25-53`), final totals."""
    docs = _t(spark, sf_dir, "documents")
    exploded = compute.compute_multi(
        docs, F.split(F.col("text"), " "), out_name="word", keep=[]
    )
    return (
        exploded.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Keyed-state enrichment (S3 + merge S13) — market_spread as-of semantics
# ---------------------------------------------------------------------------

@query(
    "asof_enrich",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, 1 AS side, event_id, value, NULL::DOUBLE AS _login_value
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, 0 AS side, NULL::BIGINT AS event_id, NULL::DOUBLE AS value,
               value AS _login_value
        FROM events WHERE event_type = 'login'
    ), filled AS (
        SELECT *,
               last_value(_login_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_login_value
        FROM tagged
    )
    SELECT event_id, user_id, ts, value, last_login_value
    FROM filled WHERE side = 1
    """,
)
def asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-spread pattern: merge two keyed streams, carry latest state from
    one onto the other (as-of join). Purchases enriched with the most recent
    login's value per user."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    logins = ev.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("value").alias("login_value")
    )
    return asof.asof_join(
        purchases,
        logins,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["login_value"],
    ).withColumnRenamed("login_value", "last_login_value")


# ---------------------------------------------------------------------------
# Merge / union (S13)
# ---------------------------------------------------------------------------

@query(
    "merge_streams",
    oracle="""
    SELECT event_id, ts, user_id, 'purchase' AS stream, value AS amount
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, ts, user_id, 'error' AS stream, CAST(-1.0 AS DOUBLE) AS amount
    FROM events WHERE event_type = 'error'
    """,
)
def merge_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 merge of heterogeneous pipelines via tagged unionByName."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.lit("purchase").alias("stream"), F.col("value").alias("amount")
    )
    b = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id", F.lit("error").alias("stream"), F.lit(-1.0).alias("amount")
    )
    return a.unionByName(b)
