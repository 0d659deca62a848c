"""Time-series queries: as-of join over the events stream.

The reference cannot express any time-based operator (SURVEY.md §2.6);
these are north-star additions with exact oracles (DuckDB has a native
ASOF JOIN — the ideal differential check for our union+window rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators.asof import asof_join_backward
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
