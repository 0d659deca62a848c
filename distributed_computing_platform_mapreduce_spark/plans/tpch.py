"""TPC-H-style analytical queries over the driver's star schema.

The reference never demonstrates multi-table analytics (single-input jobs
only — SURVEY.md §2.6); these queries are the capability statement for
the new engine: scan → filtered fact → broadcast dims → shuffle agg →
top-k, the canonical 100 TB shapes.

Float policy: every money aggregate sums in DECIMAL (exact, order-free)
and converts the exact result to double at the end — bit-identical to
the DuckDB oracle (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.functions.numeric import dsum, money
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

def _one():
    # Built lazily: Column construction needs an active SparkContext.
    return F.lit(1).cast("decimal(18,2)")


def _net(price: str = "l_extendedprice", disc: str = "l_discount"):
    """l_extendedprice * (1 - l_discount) — exact decimal(·,4)."""
    return money(price) * (_one() - money(disc))


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: the headline scan+agg. One shuffle over a
    6-value grouping key; partial aggregation collapses each input
    partition to ≤6 rows before it — shuffle volume is O(partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(_net()).cast("double").alias("sum_disc_price"),
            F.sum(_net() * (_one() + money("l_tax"))).cast("double").alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(money("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: filtered 3-way join → agg → top-10.

    customer filtered on segment is ~1/5 of customers — broadcast-able at
    any realistic scale (customer keys only); orders⋈lineitem shuffles on
    orderkey. Top-10 is TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_net()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join. supplier/nation/region broadcast;
    the only shuffles are orders⋈customer (custkey) and lineitem⋈orders
    (orderkey) — both on the natural fact keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_net()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure scan+filter+global agg — every
    predicate pushes to the parquet reader; zero shuffle (partial sums +
    single-row final)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        ).agg(F.sum(money("l_extendedprice") * money("l_discount")).cast("double").alias("revenue"))
    )


# Re-registered in round 3 (the fn/window suite folds freed the slot).
@query(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: fact-fact join + broadcast dim + top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_net()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "subquery_shapes_suite",
    oracle="""
    SELECT 'q17_avg_threshold' AS tag, l.l_partkey AS key,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS val
    FROM lineitem l
    JOIN (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    GROUP BY l.l_partkey
    UNION ALL
    SELECT 'q18_big_orders' AS tag, o.o_custkey AS key,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val
    FROM orders o
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 180
    )
    GROUP BY o.o_custkey
    UNION ALL
    SELECT 'q2_min_cost' AS tag, l.l_partkey AS key,
           CAST(min(l.l_suppkey) AS DOUBLE) AS val
    FROM lineitem l
    JOIN (
      SELECT l_partkey, min(l_extendedprice) AS minp
      FROM lineitem GROUP BY l_partkey
    ) m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.minp
    GROUP BY l.l_partkey
    """,
)
def subquery_shapes_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three classic correlated-subquery optimizer shapes in one
    tagged suite (``subquery_avg_threshold`` widened in r6 — same slot,
    two more decorrelation patterns):

    * ``q17_avg_threshold`` — correlated SCALAR subquery (quantity below
      half the per-part average) decorrelated into a self-join against a
      per-key aggregate, exactly what Catalyst does to the SQL form;
      both sides shuffle on l_partkey, co-partitioned.
    * ``q18_big_orders`` — semi-join against a grouped-HAVING subquery
      (orders whose lineitems total > 180 units): the IN-subquery
      becomes LEFT SEMI after the aggregate, so orders never duplicate.
    * ``q2_min_cost`` — correlated MIN subquery (which supplier ships a
      part at its minimum price): per-group min join + equality filter,
      min(l_suppkey) as the deterministic tie-break — the TPC-H q2
      pattern re-expressed on the lineitem star (this schema has no
      partsupp table).

    Exact-money policy throughout: sums in DECIMAL, doubles only at the
    boundary. HAVING compares a sum of integer-valued doubles — exact
    and order-independent under IEEE, so cross-engine safe; the q2
    equality compares raw parquet doubles bit-for-bit on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    avg_q = li.groupBy("l_partkey").agg(
        (F.sum(money("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    q17 = (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "val"))
        .select(
            F.lit("q17_avg_threshold").alias("tag"),
            F.col("l_partkey").alias("key"),
            "val",
        )
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 180)
        .select("l_orderkey")
    )
    q18 = (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "val"))
        .select(
            F.lit("q18_big_orders").alias("tag"), F.col("o_custkey").alias("key"), "val"
        )
    )
    minp = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("minp"))
    q2 = (
        li.join(minp, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("minp"))
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").cast("double").alias("val"))
        .select(
            F.lit("q2_min_cost").alias("tag"), F.col("l_partkey").alias("key"), "val"
        )
    )
    return q17.unionByName(q18).unionByName(q2)
