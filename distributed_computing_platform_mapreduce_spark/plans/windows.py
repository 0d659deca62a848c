"""Window/analytic function coverage (SURVEY.md §2.6 — absent in reference).

Ranking, offset (lag/lead), and frame-based running aggregates. Windows
partition-shuffle once on their PARTITION BY key; within a partition the
sort is local. At 100 TB the partition key (custkey/user_id) has high
cardinality → even distribution; no global sort is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_computing_platform_mapreduce_spark.functions.numeric import money
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


@query(
    "window_ranking_suite",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk, quartile,
           pct_rnk, cdist, sum_nearby
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number()   OVER w AS rn,
             rank()         OVER w AS rnk,
             dense_rank()   OVER w AS drnk,
             ntile(4)       OVER w AS quartile,
             percent_rank() OVER w AS pct_rnk,
             cume_dist()    OVER w AS cdist,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                        RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS sum_nearby
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    """,
)
def window_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SQL ranking/distribution function over one window
    (row_number/rank/dense_rank/ntile + percent_rank/cume_dist, r7) +
    per-group top-k + a genuine value-based RANGE frame (100 orderkeys
    back — gaps matter, unlike ROWS) — the distributed replacement for
    the reference's global-only sort (E10). One shuffle on the group
    key; the six ranking functions share a single sort, the RANGE frame
    adds one more sort on the same partitioning (no extra exchange).
    percent_rank/cume_dist are exact small-int ratios in double — both
    engines compute them bit-identically, so they hash-compare."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    nearby = (
        Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.sum(money("o_totalprice")).over(nearby).cast("double").alias("sum_nearby"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_offset_frames_suite",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_seq,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
           min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3
    FROM events
    WHERE user_id < 50
    """,
)
def window_offset_frames_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset functions (lag/lead — the sessionization building block)
    plus running (unbounded-preceding) and sliding (2-preceding) ROWS
    frames, all over ONE event-time ordering — folded from the round-2
    ``window_lag_lead``/``window_frames_suite`` pair to free a registry
    slot; identical function coverage. Decimal accumulation keeps every
    prefix sum exact; every window shares one shuffle + sort on
    user_id (a single Window physical operator)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = ordered.rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(ordered).alias("prev_value"),
        F.lead("value").over(ordered).alias("next_value"),
        F.sum(money("value")).over(running).cast("double").alias("running_sum"),
        F.count("*").over(running).alias("event_seq"),
        F.sum(money("value")).over(sliding).cast("double").alias("sum3"),
        F.min("value").over(sliding).alias("min3"),
    )
