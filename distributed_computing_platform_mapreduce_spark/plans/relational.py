"""Core relational operators (SURVEY.md §2.6).

The reference has no built-in relational algebra — users hand-write each
op as a Maple/Juice executable, and two-dataset ops (joins, set ops) are
impossible in a single job (one ``sdfs_src_directory``,
``src/MapReduceMaster.java:56``). Here each is a first-class declarative
plan: Catalyst picks broadcast-hash vs sort-merge, pushes predicates into
the parquet scan, and prunes columns.

Scale notes per operator are in the docstrings — the design target is a
1000-executor cluster on 100 TB, where dimension tables (region/nation/
supplier/part) stay broadcast-able and fact-fact joins shuffle on their
join keys with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.functions.numeric import avg_money, dsum, money
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


# --- filter / project -------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
           l_quantity * 2.0 AS double_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 10.0
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection (plain and computed, exact decimal math).

    Both conjuncts and the 6-column ReadSchema push into the parquet scan
    (PushedFilters — verified via .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 10.0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (money("l_extendedprice") * (F.lit(1) - money("l_discount")))
        .cast("double")
        .alias("net_price"),
        (F.col("l_quantity") * F.lit(2.0)).alias("double_qty"),
    )


# --- joins ------------------------------------------------------------------


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: explicit broadcast() of the dims — at 100 TB the customer
    side streams through without a shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_variants_suite",
    # r8 fold of join_outer_suite + join_semi_anti (slot freed for the
    # r8 registry additions; all four join variants' oracles intact
    # under the normalized (side, left_key, right_key, right_label)
    # schema — semi/anti legs carry NULL right columns by construction).
    oracle="""
    SELECT 'left' AS side, c.c_custkey AS left_key,
           o.o_orderkey AS right_key, o.o_orderpriority AS right_label
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000.0
    UNION ALL
    SELECT 'full', s.s_suppkey, t.n_nationkey, t.n_name
    FROM supplier s
    FULL OUTER JOIN (SELECT * FROM nation WHERE n_nationkey < 20) t
      ON s.s_nationkey = t.n_nationkey
    UNION ALL
    SELECT 'semi', c_custkey, CAST(NULL AS BIGINT), c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
    UNION ALL
    SELECT 'anti', c_custkey, CAST(NULL AS BIGINT), c_name
    FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
    """,
)
def join_variants_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer, full-outer, left-semi and left-anti joins as tagged
    legs under one driver row (r8 fold of ``join_outer_suite`` — itself
    the r6 fold — and ``join_semi_anti``; all four checks intact).

    Left leg: join-side predicate kept in ON, not WHERE — semantics
    differ; unmatched customers are preserved with NULL order columns.
    Full leg: nation filtered below key 20 so BOTH null sides are
    non-vacuous (suppliers of filtered-out nations, nations with no
    supplier). Semi leg: EXISTS/IN rewrite; never duplicates the probe
    side. Anti leg: customers with no high-value order (NOT IN,
    non-null keys); its lower 300k threshold keeps the anti side
    non-empty at every SF — every customer has *some* order in this
    corpus. Semi/anti legs put the customer name in ``right_label`` (a
    label slot, not a join output — those variants produce no right
    columns by definition)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    left = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000.0), "left"
    ).select(
        F.lit("left").alias("side"),
        F.col("c_custkey").alias("left_key"),
        F.col("o_orderkey").alias("right_key"),
        F.col("o_orderpriority").alias("right_label"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    full = s.join(n, s.s_nationkey == n.n_nationkey, "full_outer").select(
        F.lit("full").alias("side"),
        F.col("s_suppkey").alias("left_key"),
        F.col("n_nationkey").alias("right_key"),
        F.col("n_name").alias("right_label"),
    )
    semi = c.join(
        load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select(
        F.lit("semi").alias("side"),
        F.col("c_custkey").alias("left_key"),
        F.lit(None).cast("long").alias("right_key"),
        F.col("c_name").alias("right_label"),
    )
    anti = c.join(
        load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0),
        c.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select(
        F.lit("anti").alias("side"),
        F.col("c_custkey").alias("left_key"),
        F.lit(None).cast("long").alias("right_key"),
        F.col("c_name").alias("right_label"),
    )
    return left.unionAll(full).unionAll(semi).unionAll(anti)


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between tiny dims (5×25 here);
    physical plan is broadcast nested loop."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, b.bucket_id
    FROM part p
    JOIN (SELECT r_regionkey AS bucket_id,
                 r_regionkey * 400.0 AS lo,
                 (r_regionkey + 1) * 400.0 AS hi
          FROM region) b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: fact rows bucketed by value intervals from a tiny
    broadcast side → broadcast-nested-loop, no shuffle of the fact."""
    p = load_table(spark, sf_dir, "part")
    r = load_table(spark, sf_dir, "region")
    buckets = r.select(
        F.col("r_regionkey").alias("bucket_id"),
        (F.col("r_regionkey") * 400.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 400.0).alias("hi"),
    )
    return p.join(
        F.broadcast(buckets),
        (p.p_retailprice >= buckets.lo) & (p.p_retailprice < buckets.hi),
    ).select("p_partkey", "p_retailprice", "bucket_id")


# --- aggregation ------------------------------------------------------------


@query(
    "agg_full_suite",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
           count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_full_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/count/min/max/avg/countDistinct in one pass (countDistinct adds
    an expand+reshuffle; all others partial-aggregate map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        avg_money("l_quantity", "avg_qty"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@query(
    "agg_grouping_suite",
    # r8 fold of agg_rollup_having + agg_cube_grouping_sets (one registry
    # row frees a slot at the 50 cap for heavy_hitters; every leg's
    # oracle survives intact under the normalized (tag, g1, g2, cnt,
    # total) schema — grouping columns as nullable strings, one metric
    # column per aggregate family).
    oracle="""
    SELECT 'rollup_having' AS tag, o_orderstatus AS g1, o_orderpriority AS g2,
           CAST(count(*) AS DOUBLE) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    HAVING count(*) > (SELECT count(*) FROM orders) / 10.0
    UNION ALL
    SELECT 'gsets', l_returnflag, l_linestatus,
           CAST(count(*) AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'pivot_roundtrip', l_returnflag, l_linestatus, CAST(NULL AS DOUBLE),
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_grouping_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP+HAVING, CUBE-as-GROUPING-SETS, and PIVOT/UNPIVOT as tagged
    legs under one registry row (r8 fold — formerly ``agg_rollup_having``
    and ``agg_cube_grouping_sets``, both oracles intact):

    - ``rollup_having``: the hierarchy ((status,priority) → (status) →
      ()) with a scalar-subquery HAVING (count > 10% of all orders) that
      drops every leaf cell, so the filter is non-vacuous at every SF;
      the threshold joins in as a broadcast single-row aggregate — no
      driver-side count.
    - ``gsets``: the Spark side enumerates the cube as explicit GROUPING
      SETS ((f,s),(f),(s),()) while the oracle uses CUBE — their
      equality is exactly the algebraic identity the two operators
      share. Physical plan is a single Expand + one shuffle.
    - ``pivot_roundtrip``: ``groupBy(l_returnflag).pivot(l_linestatus,
      [explicit values]).sum(l_quantity)`` — the real Pivot logical
      operator, value list pinned so the planner never runs the hidden
      distinct-collect job (the 100 TB rule for pivot) — then
      ``unpivot`` (melt) back to long form, algebraically a plain GROUP
      BY on both keys, which is what the oracle states. Null cells
      (absent combinations) are filtered after the melt; money sums
      stay DECIMAL until the final DOUBLE cast on both engines."""
    o = load_table(spark, sf_dir, "orders")
    total = o.agg(F.count("*").alias("__total"))
    rollup_leg = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("__cnt"), dsum("o_totalprice", "__tot"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__cnt") > F.col("__total") / 10.0)
        .select(
            F.lit("rollup_having").alias("tag"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            F.col("__cnt").cast("double").alias("cnt"),
            F.col("__tot").alias("total"),
        )
    )

    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS tag, l_returnflag AS g1, l_linestatus AS g2,
               CAST(count(*) AS DOUBLE) AS cnt, CAST(NULL AS DOUBLE) AS total
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(money("l_quantity")))
    )
    pivot_rt = (
        wide.unpivot("l_returnflag", ["F", "O"], "l_linestatus", "__q")
        .filter(F.col("__q").isNotNull())
        .select(
            F.lit("pivot_roundtrip").alias("tag"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            F.lit(None).cast("double").alias("cnt"),
            F.col("__q").cast("double").alias("total"),
        )
    )
    return rollup_leg.unionByName(gsets).unionByName(pivot_rt)


# --- distinct / dedup / set ops / sort / limit ------------------------------


@query(
    "set_ops_suite",
    oracle="""
    SELECT CAST(nationkey AS VARCHAR) AS val, 'union_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT CAST(nationkey AS VARCHAR) AS val, 'intersect' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT CAST(nationkey AS VARCHAR) AS val, 'except' AS op FROM (
      SELECT n_nationkey AS nationkey FROM nation
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 10)
    UNION ALL
    SELECT o_orderstatus || '|' || o_orderpriority AS val, 'distinct' AS op FROM (
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
    UNION ALL
    SELECT CAST(nationkey AS VARCHAR) AS val, 'except_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT CAST(nationkey AS VARCHAR) AS val, 'intersect_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT / EXCEPT ALL / INTERSECT ALL /
    multi-column DISTINCT in one tagged result (``distinct_rows`` folded
    in r6 to free a registry slot for ``curation_recipe`` — the value
    column is a string so the orders status|priority pairs union with
    the nationkey legs).

    EXCEPT uses ``subtract()`` — true EXCEPT DISTINCT semantics (the
    earlier ``exceptAll().distinct()`` form diverges when a value appears
    on both sides with higher left multiplicity). The supplier filter
    keeps the EXCEPT branch non-empty at every SF.

    The bag-semantic legs (r6) are non-trivial at every SF because
    customer carries far higher per-nationkey multiplicity than
    supplier: EXCEPT ALL keeps ``max(m_left - m_right, 0)`` copies and
    INTERSECT ALL ``min(m_left, m_right)`` copies per value — both
    diverge from their DISTINCT twins on this data, so a wrong
    implementation cannot hash-match."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    as_val = lambda df: df.select(F.col("nationkey").cast("string").alias("val"))  # noqa: E731
    union_all = as_val(c.unionByName(s)).withColumn("op", F.lit("union_all"))
    inter = as_val(c.intersect(s)).withColumn("op", F.lit("intersect"))
    exc = as_val(n.subtract(s.filter(F.col("nationkey") < 10))).withColumn("op", F.lit("except"))
    o = load_table(spark, sf_dir, "orders")
    dist = (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .select(
            F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("val"),
            F.lit("distinct").alias("op"),
        )
    )
    exc_all = as_val(c.exceptAll(s)).withColumn("op", F.lit("except_all"))
    inter_all = as_val(c.intersectAll(s)).withColumn("op", F.lit("intersect_all"))
    return (
        union_all.unionByName(inter)
        .unionByName(exc)
        .unionByName(dist)
        .unionByName(exc_all)
        .unionByName(inter_all)
    )


@query(
    "approx_ops",
    oracle="""
    SELECT 'agg' AS leg, event_type AS key,
           count(DISTINCT user_id) AS n_users_exact,
           true AS approx_distinct_ok,
           true AS approx_p50_ok
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'hll_table', event_type,
           count(DISTINCT user_id), true, true
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'bloom', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS BIGINT),
           true, true
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def approx_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates with a tolerance-band oracle, tagged legs.

    - **agg**: ``approx_count_distinct`` (HLL++) and
      ``approx_percentile`` (KLL/GK sketch) are the 100 TB path —
      mergeable sketches, one shuffle of O(sketch) bytes per group
      instead of an exact distinct expand. The sketches don't bit-match
      any other engine, so the oracle checks a tolerance flag: the
      query computes BOTH the approximate and the exact value in Spark
      and emits ``ok = |approx − exact| ≤ band``; the oracle emits the
      exact value and a literal ``true``. A sketch drifting out of
      tolerance turns the row red.
    - **hll_table** (r10 fold, ``operators/sketches.py``): the
      PERSISTED-sketch-table workflow — the corpus splits into two
      deterministic increments, each gets its own
      ``hll_sketch_table`` (DataSketches HLL, mergeable binary blobs),
      ``hll_merge_tables`` unions them, and the merged readout must
      (a) agree with the one-shot whole-corpus sketch within 2% of the
      exact count — in sparse mode the union is exactly the one-shot
      sketch (the pytest pins equality there), but once the sketches
      densify the union path resolves registers differently and the
      two estimates drift ~0.5% apart (measured at sf0.1: merged 1488
      vs one-shot 1480–1499 on exact 1500) — and (b) land within the
      5% band of the exact count the oracle recomputes. This is the
      incremental shape: per-increment raw data is read once; every
      later distinct-count question is answered from kilobyte
      sketches.
    - **bloom** (r11 fold, ``sketches.bloom_filter_table`` /
      ``bloom_probe``): the explicit runtime-prefilter sketch — this
      build's ``bloom_filter_agg`` is not a public SQL function, so the
      repo carries its own mergeable Bloom filter. The leg builds a
      2^20-bit / 7-hash filter over the BUILDING customers (a fixed
      128 KB artifact however many keys — the regime where an exact
      broadcast key set stops scaling) and prefilters orders at the
      scan; the oracle is the EXACT semi join. Promotion argument: no
      false negatives by construction, and the false-positive rate at
      this operating point is (1−e^(−kn/m))^k ≈ 1e-11 per probe —
      measured 0 across every SF — so the admitted set must equal the
      exact one ROW-FOR-ROW (one sneaked false positive = rows
      mismatch, red)."""
    from distributed_computing_platform_mapreduce_spark.operators import sketches

    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy(F.col("event_type").alias("key")).agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__acd"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__p50_approx"),
        F.expr("percentile(value, 0.5)").alias("__p50_exact"),
    )
    agg_leg = agg.select(
        F.lit("agg").alias("leg"),
        "key",
        "n_users_exact",
        (
            F.abs(F.col("__acd") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * F.lit(0.05)
        ).alias("approx_distinct_ok"),
        (
            F.abs(F.col("__p50_approx") - F.col("__p50_exact"))
            <= F.abs(F.col("__p50_exact")) * F.lit(0.05) + F.lit(0.5)
        ).alias("approx_p50_ok"),
    )

    # two deterministic row-increments sharing users/types, so the
    # union genuinely merges overlapping registers
    inc = F.pmod(F.xxhash64(F.col("ts").cast("string")), F.lit(2))
    t1 = sketches.hll_sketch_table(e.filter(inc == 0), ["event_type"], "user_id")
    t2 = sketches.hll_sketch_table(e.filter(inc == 1), ["event_type"], "user_id")
    merged_est = sketches.hll_estimate(
        sketches.hll_merge_tables([t1, t2], ["event_type"]), ["event_type"]
    ).withColumnRenamed("n_distinct", "__merged")
    oneshot_est = sketches.hll_estimate(
        sketches.hll_sketch_table(e, ["event_type"], "user_id"), ["event_type"]
    ).withColumnRenamed("n_distinct", "__oneshot")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    hll_leg = (
        exact.join(merged_est, "event_type")
        .join(oneshot_est, "event_type")
        .select(
            F.lit("hll_table").alias("leg"),
            F.col("event_type").alias("key"),
            "n_users_exact",
            (
                (
                    F.abs(F.col("__merged") - F.col("__oneshot"))
                    <= F.col("n_users_exact") * F.lit(0.02)
                )
                & (
                    F.abs(F.col("__merged") - F.col("n_users_exact"))
                    <= F.col("n_users_exact") * F.lit(0.05)
                )
            ).alias("approx_distinct_ok"),
            F.lit(True).alias("approx_p50_ok"),
        )
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING")
    bloom = sketches.bloom_filter_table(dim, "c_custkey")
    bloom_leg = sketches.bloom_probe(orders, "o_custkey", bloom).select(
        F.lit("bloom").alias("leg"),
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_custkey").cast("long").alias("n_users_exact"),
        F.lit(True).alias("approx_distinct_ok"),
        F.lit(True).alias("approx_p50_ok"),
    )
    return agg_leg.unionAll(hll_leg).unionAll(bloom_leg)


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: physical plan is TakeOrderedAndProject — per-partition
    heaps, no global sort, no full shuffle. Tie-broken for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(100)
