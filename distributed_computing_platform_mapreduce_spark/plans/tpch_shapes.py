"""Extra TPC-H optimizer shapes, pytest-verified beyond the 50-query cap.

The driver registry is capped at 50 rows (plans/__init__.py), so these
fourteen canonical shapes — the ones the registered q1/q3/q5/q6/q10 +
subquery suite do NOT yet exercise — live outside it and are verified
by ``tests/test_oracle_parity.py::test_tpch_shape_matches_oracle``
instead, with the SAME compare (rowcount + schema + order-insensitive
values) the driver applies.

Each shape is ONE ANSI-SQL text executed verbatim by BOTH engines
(``spark.sql`` over temp views of the catalog tables, and DuckDB over
parquet views): dialect-shared SQL makes the oracle trivially equivalent
and pins Spark's SQL front end — correlated EXISTS/NOT EXISTS
decorrelation (RewritePredicateSubquery), scalar subqueries, disjunctive
join predicates, and conditional aggregation — not just the DataFrame
API the rest of the repo leans on.

Shapes and why they're distinct (TPC-H analogues adapted to the test
schema, which lacks partsupp/shipmode/commitdate):

- ``q4_exists_semi``     — correlated EXISTS → left-semi decorrelation
                           (TPC-H q4's plan shape).
- ``q12_conditional_agg``— join + CASE-sum conditional aggregation
                           (q12's shape without l_shipmode).
- ``q14_promo_ratio``    — aggregate-over-aggregate ratio with CASE
                           numerator (q14), decimal-exact then rounded.
- ``q19_disjunctive``    — OR-of-conjunction-groups join predicate
                           (q19): the optimizer must push the common
                           equi-key through the disjunction.
- ``q22_anti_scalar``    — NOT EXISTS anti-join + scalar subquery
                           threshold + substring grouping (q22). The
                           anti predicate is "never placed an URGENT
                           order": in the synthetic data every customer
                           has orders, so q22's literal "no orders"
                           form would be vacuously empty.
- ``q7_volume_shipping`` — six-table snowflake with a symmetric
                           nation-pair disjunction and year extraction
                           (q7): join-order freedom across two nation
                           roles of the same dim.
- ``q8_market_share``    — agg-over-agg CASE ratio inside a
                           seven-table join, region filter via a
                           scalar subquery (q8's shape).
- ``q9_profit_by_nation_year`` — LIKE-filtered part join + per
                           (nation, year) rollup (q9 minus
                           ps_supplycost).
- ``q13_custdist``       — LEFT OUTER join with an ON-clause filter +
                           two-level aggregation (count distribution —
                           q13 verbatim in shape).
- ``q15_top_supplier``   — CTE revenue view joined back + scalar MAX
                           subquery over the SAME CTE (q15): exercises
                           CTE reuse and decimal-exact equality.
- ``q21_waiting_supplier``— EXISTS and NOT EXISTS both correlated to
                           the same fact row (q21's double
                           correlation), adapted to returnflag.

r9 completes the classic set (22 of 22 expressible shapes, the three
the r8 verdict called out):

- ``q11_important_parts`` — GROUP BY + HAVING against a scalar
                           subquery that re-aggregates the SAME
                           filtered join (q11's "value fraction of
                           the national total" without partsupp:
                           lineitem×supplier×nation stands in for
                           partsupp value). The cut is SCALE-ADAPTIVE
                           like TPC-H's own 0.0001/SF: parts above 2×
                           the average per-part value (15/126/1235
                           rows at sf0.001/0.01/0.1 — a fixed fraction
                           degenerates to zero rows as the part count
                           grows, which the parity test rightly
                           rejects as proving nothing).
- ``q16_supplier_cnt``   — count(DISTINCT) per part attributes with a
                           NOT IN subquery excluding suppliers (q16's
                           shape; the null-aware anti join rewrite).
- ``q20_excess_suppliers``— the nested correlated-subquery-over-agg:
                           IN over a GROUPED subquery whose HAVING
                           compares against a scalar subquery
                           CORRELATED to the group key (share > 12% of
                           a part's total quantity — threshold chosen
                           non-vacuous at every sf dir: 1/2/3
                           suppliers at sf0.001/0.01/0.1). The one
                           decorrelation pattern the r8 sweep lacked;
                           plan-linted in tests/test_plan_lint.py.

Scale notes: every shape is a filtered fact join a dim (broadcast-able)
or a self-contained agg; no shape introduces a shuffle the registered
queries don't already carry. The EXISTS/NOT EXISTS forms decorrelate to
semi/anti hash joins on the fact's join key — the 100 TB-safe plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

_NET = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

SHAPES: dict[str, str] = {
    "q4_exists_semi": f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    "q12_conditional_agg": """
        SELECT l.l_returnflag,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag
    """,
    "q14_promo_ratio": f"""
        SELECT ROUND(
                 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_NET} ELSE CAST(0 AS DECIMAL(18,2)) END)
                          AS DOUBLE)
                       / CAST(SUM({_NET}) AS DOUBLE),
                 6) AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "q19_disjunctive": f"""
        SELECT CAST(SUM({_NET}) AS DOUBLE) AS revenue, count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
    """,
    "q22_anti_scalar": """
        SELECT SUBSTRING(c.c_name, 10, 1) AS name_digit,
               count(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT AVG(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                FROM customer c2 WHERE c2.c_acctbal > 0.0
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
              )
        GROUP BY SUBSTRING(c.c_name, 10, 1)
    """,
    # --- r7 additions: the remaining canonical shapes the schema can
    # express (no partsupp/shipmode/commitdate in the test tables) -----
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
                 {_NET} AS volume
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM (
          SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                 {_NET} AS volume,
                 n2.n_name AS nation
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = (SELECT MIN(r_name) FROM region)
            AND p.p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year
    """,
    "q9_profit_by_nation_year": f"""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n.n_name AS nation,
                 EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                 {_NET} AS amount
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE p.p_name LIKE '%e%'
        ) profit
        GROUP BY nation, o_year
    """,
    "q13_custdist": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, SUM({_NET}) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    # --- r9 additions: the last three classic shapes ------------------
    "q11_important_parts": f"""
        SELECT l.l_partkey, CAST(SUM({_NET}) AS DOUBLE) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
        HAVING SUM({_NET}) > (
          SELECT SUM({_NET}) * 2.0 / COUNT(DISTINCT l2.l_partkey)
          FROM lineitem l2
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          WHERE n2.n_name = 'NATION_3'
        )
    """,
    "q16_supplier_cnt": """
        SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#2'
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0
          )
        GROUP BY p.p_brand, p.p_size
    """,
    "q20_excess_suppliers": """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING SUM(l.l_quantity) > (
              SELECT 0.12 * SUM(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
            )
          )
    """,
    "q21_waiting_supplier": """
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
        JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R'
              )
        GROUP BY s.s_name
    """,
}

_SHAPE_TABLES = ("orders", "lineitem", "part", "customer", "supplier", "nation", "region")


def run_shape(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Execute one shape through Spark's SQL front end (temp views over
    the catalog loaders, so timestamp normalization still applies)."""
    for t in _SHAPE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SHAPES[name])
