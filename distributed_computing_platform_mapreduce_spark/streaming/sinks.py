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
