"""Scalar function coverage: string / date / math / array / conditional.

The reference has no scalar function library — all row-level computation
lives inside user Python executables (SURVEY.md §2.6). Here every
function is a built-in ``pyspark.sql.functions`` expression that stays
inside whole-stage codegen; no Python is executed per row.

Oracle notes: only functions with identical Spark/DuckDB semantics are
used (substr is 1-indexed in both; upper/lower/trim/concat identical;
date_part/extract identical on timestamps; floor/ceil/abs/round-away-
from-zero on positive values identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


@query(
    "fn_scalar_suite",
    oracle="""
    SELECT o.o_orderkey,
           upper(c.c_name) AS name_upper,
           lower(c.c_mktsegment) AS seg_lower,
           length(c.c_name) AS name_len,
           substr(c.c_name, 1, 8) AS name_prefix,
           concat(c.c_name, ':', c.c_mktsegment) AS tagged,
           replace(c.c_name, 'Customer', 'Cust') AS renamed,
           CASE WHEN c.c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
           trim('  pad  ') AS trimmed,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(extract(month FROM o.o_orderdate) AS INT) AS order_month,
           CAST(extract(day FROM o.o_orderdate) AS INT) AS order_day,
           CAST(extract(quarter FROM o.o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o.o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o.o_orderdate) AS BIGINT)
             AS days_since_epoch_95,
           abs(p.p_retailprice - 1000.0) AS dev_from_1k,
           CAST(floor(p.p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p.p_retailprice) AS BIGINT) AS price_ceil,
           round(p.p_retailprice, 0) AS price_round,
           CAST(p.p_size % 7 AS INT) AS size_mod7,
           sqrt(CAST(p.p_size AS DOUBLE)) AS size_sqrt,
           power(CAST(p.p_size AS DOUBLE), 2.0) AS size_sq,
           greatest(p.p_size, 25) AS size_floor25,
           least(p.p_size, 25) AS size_cap25
    FROM orders o
    JOIN part p ON o.o_orderkey = p.p_partkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey <= 1000
    """,
)
def fn_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date/time + math scalar functions in ONE row stream
    (orders ⋈ part on the shared contiguous key range ⋈ customer on
    custkey, both dims broadcast) — folded from the round-2
    ``fn_string_suite``/``fn_datetime_math_suite`` pair to free a
    registry slot; identical function coverage.

    sqrt/pow are IEEE-correctly-rounded in both engines; ln/log are
    libm-dependent (observed 1-ulp Java-vs-C divergence) so transcendental
    fns beyond sqrt/pow are exercised in unit tests, not the oracle gate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(p), o.o_orderkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws(":", "c_name", "c_mktsegment").alias("tagged"),
            F.regexp_replace("c_name", "Customer", "Cust").alias("renamed"),
            F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
            F.trim(F.lit("  pad  ")).alias("trimmed"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("days_since_epoch_95"),
            F.abs(F.col("p_retailprice") - 1000.0).alias("dev_from_1k"),
            F.floor("p_retailprice").alias("price_floor"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.round("p_retailprice", 0).alias("price_round"),
            (F.col("p_size") % 7).alias("size_mod7"),
            F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
            F.pow(F.col("p_size").cast("double"), 2.0).alias("size_sq"),
            F.greatest("p_size", F.lit(25)).alias("size_floor25"),
            F.least("p_size", F.lit(25)).alias("size_cap25"),
        )
    )


@query(
    "fn_array_suite",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(text, '\\s+'))) AS n_distinct_tokens,
           list_sort(list_distinct(regexp_split_to_array(text, '\\s+')))[1] AS first_token,
           list_contains(regexp_split_to_array(text, '\\s+'), 'data') AS has_data,
           len(list_distinct(regexp_split_to_array(text, '\\s+'))) AS n_map_keys,
           CASE WHEN list_contains(regexp_split_to_array(text, '\\s+'), 'data')
                THEN 4 END AS data_token_len
    FROM documents
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + map functions over tokenized text: size/distinct/sort/
    contains, then a token→length map (map_from_arrays / map_keys /
    element_at lookup). The oracle states the map results directly —
    key count == distinct tokens, lookup of 'data' == its length when
    present else NULL — so the map path is still hash-checked."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    dtoks = F.array_distinct(toks)
    tok_len_map = F.map_from_arrays(dtoks, F.transform(dtoks, lambda t: F.length(t)))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(dtoks).alias("n_distinct_tokens"),
        F.array_sort(dtoks).getItem(0).alias("first_token"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.map_keys(tok_len_map)).alias("n_map_keys"),
        F.element_at(tok_len_map, "data").alias("data_token_len"),
    )


@query(
    "fn_conditional_json_suite",
    oracle="""
    SELECT e.event_id,
           CASE e.event_type
             WHEN 'purchase' THEN 'revenue'
             WHEN 'signup'   THEN 'growth'
             ELSE 'engagement'
           END AS category,
           coalesce(nullif(e.event_type, 'error'), 'recovered') AS cleaned_type,
           CAST(trunc(e.value) AS INT) AS value_int,
           CAST(e.user_id AS VARCHAR) AS user_str,
           if(e.value > 100.0, 'high', 'low') AS value_band,
           CAST(json_extract_string(e.props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(e.props, '$.missing') AS VARCHAR) AS absent
    FROM events e
    WHERE e.event_id <= 2000
    """,
)
def fn_conditional_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/if + casts + JSON path extraction over the
    events.props payload (``props`` holds ``{"k": <int>}``; missing path
    → NULL; double→int truncates toward zero in both engines for
    positive values)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "signup", "growth")
        .otherwise("engagement")
        .alias("category"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("recovered")).alias(
            "cleaned_type"
        ),
        F.col("value").cast("int").alias("value_int"),
        F.col("user_id").cast("string").alias("user_str"),
        F.when(F.col("value") > 100.0, "high").otherwise("low").alias("value_band"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )
