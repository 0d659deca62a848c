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
    "window_rank_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the distributed replacement for the reference's
    global-only sort (E10). One shuffle on the group key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    WHERE user_id < 50
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset functions over an event-time ordering — the sessionization
    building block."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_running_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    WHERE o_custkey < 100
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: running sum + sequence number per customer.
    Decimal accumulation keeps the running sum exact at any prefix."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


@query(
    "window_sliding_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
           min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min3
    FROM events
    WHERE user_id < 50
    """,
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding ROWS frame (3-row moving sum/min)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.sum(money("value")).over(w).cast("double").alias("sum3"),
        F.min("value").over(w).alias("min3"),
    )
