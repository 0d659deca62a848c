"""Time-series queries: as-of join and interval join over the events
stream.

The reference cannot express any time-based operator (SURVEY.md §2.6);
these are north-star additions with exact oracles (DuckDB has a native
ASOF JOIN — the ideal differential check for our union+window rewrite —
and evaluates the interval-overlap predicate directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators.asof import asof_join_backward
from distributed_computing_platform_mapreduce_spark.operators.intervals import interval_join
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


@query(
    "asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           p.purchase_value AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase value at or before
    the click (NULL if none yet) — checked against DuckDB's native ASOF
    JOIN. The right side is pre-aggregated to one row per (user, ts) so
    ties are deterministic in both engines."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join_backward(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="purchase_value",
        out_col="last_purchase_value",
    )


@query(
    "interval_join",
    oracle="""
    WITH e AS (
      SELECT event_id AS err_id,
             epoch_us(ts) AS err_start,
             epoch_us(ts) + 600000000 AS err_end
      FROM events WHERE event_type = 'error'
    ),
    c AS (
      SELECT event_id AS click_id,
             epoch_us(ts) AS click_start,
             epoch_us(ts) + 120000000 AS click_end
      FROM events WHERE event_type = 'click'
    )
    SELECT err_id, click_id
    FROM e JOIN c ON err_start <= click_end AND click_start <= err_end
    """,
)
def interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval (range-overlap) join: every click window [t, t+2m]
    overlapping an error window [t, t+10m] — no equality key exists, so
    a naive plan is a nested-loop cartesian; the banded operator
    manufactures one (time bucket, width = 10 min) and the plan becomes
    an ordinary shuffle equi-join on ``__bkt`` with exact-overlap filter
    + first-live-bucket dedup (``operators/intervals.py``). Timestamps
    go through ``unix_micros`` ↔ DuckDB ``epoch_us`` — exact integers,
    so the overlap predicate is oracle-exact."""
    e = load_table(spark, sf_dir, "events")
    errs = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.unix_micros("ts").alias("err_start"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("err_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_start"),
        (F.unix_micros("ts") + F.lit(120_000_000)).alias("click_end"),
    )
    return interval_join(
        errs,
        clicks,
        "err_start",
        "err_end",
        "click_start",
        "click_end",
        bucket_width=600_000_000,
    ).select("err_id", "click_id")
