"""Bucketed table layout: shuffle-free co-located joins.

The reference re-reads and re-partitions every input on every job
(whole files shipped to workers, ``/root/reference/src/MapReduceWorker.java:64-68``).
The Spark-native fix for repeated joins on the same key is to pay the
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows
into a fixed bucket count inside each table; two tables bucketed the
same way join with ZERO Exchange — at 100 TB that's the difference
between an every-query terabyte shuffle and none.

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet()`` writes can't record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sorted) managed
    table. Sorting within buckets additionally removes the sort from
    downstream sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    either side (asserted in tests via the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
