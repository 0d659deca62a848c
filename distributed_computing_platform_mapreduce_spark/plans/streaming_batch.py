"""Event-time windowed aggregations over the events table (batch form).

The reference is strictly batch with a hard maple→juice barrier
(``/root/reference/README.md:12``) and has no time semantics at all
(SURVEY.md §2.6). These queries define tumbling / sliding / session
window semantics on event time; ``streaming/windows.py`` runs the same
logic as Structured Streaming with watermarks (tested via availableNow).

The batch forms are SQL-expressible → full DuckDB oracles; the streaming
twins are asserted equal to the batch forms in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling windows per event type. ``F.window`` buckets are
    epoch-aligned — identical to floor(epoch/900). (Unregistered plain
    form — the driver row is the folded ``window_time_suite``; the
    streaming twin tests compare against this function directly.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min — each event lands in exactly 2
    windows. (Unregistered plain form, same note as ``window_tumbling``.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via ``F.session_window``.
    Session start = min event ts in session (session_window.start equals
    it for gap-based sessions). (Unregistered plain form since the r8
    fold — the driver row is ``window_time_suite``; the streaming twin
    tests compare against this function directly.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("user_id"), F.col("w.start").alias("session_start"), "n_events", "total_value")
    )


@query(
    "window_time_suite",
    # r8 fold of window_tumbling_sliding + window_session (slot freed for
    # the r8 registry additions; every leg's oracle intact under the
    # normalized (side, window_start, key, n_events, total_value) schema
    # — key = event_type / NULL / user_id-as-string per leg). The
    # session oracle is the classic gaps-and-islands rewrite.
    oracle="""
    SELECT 'tumbling' AS side,
           CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS window_start,
           event_type AS key,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS side, window_start, NULL AS key,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
               AS window_start, value FROM events
      UNION ALL
      SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
               AS window_start, value FROM events
    )
    GROUP BY 2
    UNION ALL
    SELECT 'session' AS side, session_start, key, n_events, total_value FROM (
      WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      ),
      sess AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
      )
      SELECT CAST(user_id AS VARCHAR) AS key,
             CAST(min(ts) AS TIMESTAMP) AS session_start,
             count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM sess
      GROUP BY user_id, session_id
    )
    """,
)
def window_time_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (15-min, per event type) + sliding (1-h / 30-min) +
    session (30-min gap per user) window aggregations under one driver
    row, tagged by ``side`` (r8 fold of ``window_tumbling_sliding`` —
    itself the r5 fold — and ``window_session``; all three oracles
    intact; the sliding oracle materializes each event's two window
    assignments explicitly, the session oracle is gaps-and-islands).
    The streaming twins still assert equality against the unregistered
    plain forms. bench.py's ``window_session`` point times
    ``filter(side = 'session')`` — the other legs' union branches prune
    to nothing under the literal filter."""
    t = window_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("side"),
        "window_start",
        F.col("event_type").alias("key"),
        "n_events",
        "total_value",
    )
    s = window_sliding(spark, sf_dir).select(
        F.lit("sliding").alias("side"),
        "window_start",
        F.lit(None).cast("string").alias("key"),
        "n_events",
        "total_value",
    )
    sess = window_session(spark, sf_dir).select(
        F.lit("session").alias("side"),
        F.col("session_start").alias("window_start"),
        F.col("user_id").cast("string").alias("key"),
        "n_events",
        "total_value",
    )
    return t.unionAll(s).unionAll(sess)


@query(
    "stream_tumbling",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of ``window_tumbling``, executed for real:
    ``readStream`` over the events parquet → watermarked 15-min tumbling
    aggregation → ``trigger(availableNow)`` into a memory sink — then the
    drained result is oracle-checked against the same SQL as the batch
    form. This is Structured Streaming verified by the driver's hard
    signal, not just unit tests."""
    from distributed_computing_platform_mapreduce_spark.streaming.windows import (
        run_to_memory,
        stream_events,
        tumbling_counts_stream,
    )

    return run_to_memory(
        spark, tumbling_counts_stream(stream_events(spark, sf_dir)), "stream_tumbling_mem"
    )
