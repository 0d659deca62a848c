"""SQL API surface: the engine is equally drivable via ``spark.sql``
over registered views — same Catalyst plans as the DataFrame API.
"""

from __future__ import annotations

from distributed_computing_platform_mapreduce_spark.plans import QUERIES
from distributed_computing_platform_mapreduce_spark.sources.catalog import register_views


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_sql_text_equals_dataframe_tpch_q1(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    df = QUERIES["tpch_q1"](spark, sf_dir)
    assert sorted(sql.columns) == sorted(df.columns)
    assert _rows(sql.select(*sorted(sql.columns))) == _rows(df.select(*sorted(df.columns)))


def test_sql_join_topk_equals_dataframe(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        """
    )
    df = QUERIES["join_inner_broadcast"](spark, sf_dir)
    assert _rows(sql) == _rows(df)
