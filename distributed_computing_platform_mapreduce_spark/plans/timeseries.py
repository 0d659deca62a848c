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


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase value at or before
    the click (NULL if none yet). The right side is pre-aggregated to one
    row per (user, ts) so ties are deterministic in both engines.
    (Unregistered plain form since the r8 fold — the driver row is
    ``temporal_join_suite``.)"""
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


def interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval (range-overlap) join: every click window [t, t+2m]
    overlapping an error window [t, t+10m] — no equality key exists, so
    a naive plan is a nested-loop cartesian; the banded operator
    manufactures one (time bucket, width = 10 min) and the plan becomes
    an ordinary shuffle equi-join on ``__bkt`` with exact-overlap filter
    + first-live-bucket dedup (``operators/intervals.py``). Timestamps
    go through ``unix_micros`` ↔ DuckDB ``epoch_us`` — exact integers,
    so the overlap predicate is oracle-exact. (Unregistered plain form
    since the r8 fold — the driver row is ``temporal_join_suite``; the
    bench's ``interval_join`` point times this function.)"""
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


@query(
    "temporal_join_suite",
    # r8 fold of asof_join + interval_join (slot freed for dedup_spans;
    # both oracles intact under the normalized (leg, id_a, id_b, user_id,
    # ts, value, joined_value) schema — the as-of leg carries NULL id_b,
    # the interval leg NULL user/ts/value columns).
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT 'asof' AS leg, c.event_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
           c.user_id, c.ts, c.value,
           p.purchase_value AS joined_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    UNION ALL
    SELECT 'interval', err_id, click_id, CAST(NULL AS BIGINT),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM (
      SELECT e.event_id AS err_id, c.event_id AS click_id
      FROM (SELECT event_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e2
            FROM events WHERE event_type = 'error') e
      JOIN (SELECT event_id, epoch_us(ts) AS s, epoch_us(ts) + 120000000 AS e2
            FROM events WHERE event_type = 'click') c
        ON e.s <= c.e2 AND c.s <= e.e2
    )
    """,
)
def temporal_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join + banded interval join as tagged legs under one driver
    row (r8 fold of ``asof_join`` and ``interval_join``; both checks
    intact):

    - ``asof``: for every click, the user's most recent purchase value
      at or before the click (NULL if none yet) — Spark has no ASOF
      operator, so the rewrite is union + ranking window
      (``operators/asof.py``); DuckDB's NATIVE ``ASOF LEFT JOIN`` is
      the ideal differential check.
    - ``interval``: every click window [t, t+2m] overlapping an error
      window [t, t+10m] — no equality key exists, so the banded
      operator manufactures one (time bucket, width = 10 min) and the
      plan is an ordinary shuffle equi-join with exact-overlap filter +
      first-live-bucket dedup; DuckDB evaluates the overlap predicate
      directly. Timestamps go through ``unix_micros`` ↔ ``epoch_us``
      (exact integers).

    bench.py's ``interval_join`` point times the plain pre-fold form."""
    a = asof_join(spark, sf_dir).select(
        F.lit("asof").alias("leg"),
        F.col("event_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        "user_id",
        "ts",
        "value",
        F.col("last_purchase_value").alias("joined_value"),
    )
    i = interval_join_q(spark, sf_dir).select(
        F.lit("interval").alias("leg"),
        F.col("err_id").alias("id_a"),
        F.col("click_id").alias("id_b"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("double").alias("joined_value"),
    )
    return a.unionAll(i)
