"""Hive-style partitioned parquet layout: prune-at-plan-time scans.

The reference ships every file of ``sdfs_src_directory`` to workers on
every job (``/root/reference/src/MapReduceWorker.java:64-68``) — there
is no way to read less than the whole dataset. The columnar twin of
that directory layout is partitioning by a low-cardinality column
(``date=.../region=...``): a filter on the partition column is resolved
against directory names during planning, so a day-slice query over a
100 TB / 3-year events table opens ~0.1% of the files instead of all of
them. ``PartitionFilters`` in the scan node is the proof (tested).

Partition columns must be low-cardinality (days, regions — not user
ids): every distinct value is a directory, and millions of tiny
directories are their own scale bug. Pair with ``maxRecordsPerFile`` or
a pre-write ``repartition`` on the partition column to keep file counts
sane at 1000-executor write parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    One shuffle-free pass: each task writes into the directories its
    rows belong to. For a skewed partition column, repartition on it
    first so one task isn't left writing the hot partition alone.
    """
    w = df.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a partitioned layout. Partition columns come back as real
    columns (encoded in directory names, absent from the files); filters
    on them become ``PartitionFilters`` — pruned before any file opens."""
    return spark.read.parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-clustered parquet: ``repartitionByRange`` on
    ``cluster_cols`` then sort within each partition — files carry
    DISJOINT value ranges and every parquet row group gets tight
    min/max statistics on the cluster columns.

    This is the high-cardinality complement to hive partitioning
    (``write_partitioned``): a timestamp or id column can't be a
    directory per value, but clustered this way a range predicate
    prunes at TWO levels — Spark skips whole files whose footer range
    misses, and the parquet reader skips non-matching row groups inside
    the rest. Same idea as Delta/Iceberg ``CLUSTER BY`` / Z-order's
    1-D case, expressed with stock Spark writes.

    The range exchange samples the column distribution, so skew (a hot
    day) widens one partition rather than breaking pruning; pair with
    ``n_files`` sized so partitions stay near the row-group size."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    part = (
        df.repartitionByRange(n_files, *cluster_cols)
        if n_files is not None
        else df.repartitionByRange(*cluster_cols)
    )
    part.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)
