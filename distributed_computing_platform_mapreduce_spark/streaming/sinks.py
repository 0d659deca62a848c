"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming's file sinks are append-only; real pipelines need
upserts, partition overwrites, and multi-table fan-out — the documented
pattern for all three is ``foreachBatch`` + an IDEMPOTENT write keyed
by ``batch_id`` (Spark replays a batch after failure with the SAME id,
so "write if this batch_id hasn't landed" makes the sink effectively
exactly-once even though delivery is at-least-once).

This module implements that pattern with a parquet directory layout
partitioned by ``__batch_id``: a replayed batch overwrites its own
partition (dynamic partition overwrite) instead of appending
duplicates. At 100 TB the same shape holds — the idempotence unit is
the batch partition, commits are directory renames, and readers see
either the whole batch or none of it. A production deployment swaps
the parquet layout for a transactional table format (Delta/Iceberg)
with MERGE; the foreachBatch contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def idempotent_parquet_sink(path: str):
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``path`` under ``__batch_id=<id>`` with dynamic partition
    overwrite — replays of the same batch_id replace, never duplicate."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("__batch_id", F.lit(int(batch_id)).cast("long"))
                .write.mode("overwrite")
                .partitionBy("__batch_id")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write_batch



def run_foreach_batch(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_path: str,
    query_name: str = "fb_sink",
) -> None:
    """Drain ``stream_df`` with availableNow through the idempotent
    parquet sink; blocks until the trigger completes."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_sink(out_path))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sink(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the sink back, dropping the bookkeeping column."""
    return spark.read.parquet(out_path).drop("__batch_id")


def topk_per_window_sink(path: str, k: int, window_col: str = "window_start", order_col: str = "n_events"):
    """``foreachBatch`` writer maintaining the TOP-``k`` rows per event
    window: streaming aggregations cannot rank in-query (no window
    functions over a streaming agg), so the documented pattern is
    update-mode counts → foreachBatch ranks the batch's UPDATED windows
    and overwrites just those windows' partitions (dynamic overwrite —
    a later update or a replay of the same batch REPLACES a window's
    top-k, never duplicates it). The readout is always the current
    top-k per window; at 100 TB the idempotence/commit unit is one
    window directory."""
    from pyspark.sql.window import Window

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        w = Window.partitionBy(window_col).orderBy(
            F.col(order_col).desc(), *[F.col(c) for c in batch_df.columns if c not in (window_col, order_col)]
        )
        top = (
            batch_df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__rk")
        )
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            top.write.mode("overwrite").partitionBy(window_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write_batch
