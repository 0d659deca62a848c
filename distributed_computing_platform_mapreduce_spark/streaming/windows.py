"""Structured Streaming operators: watermarked windowed aggregations.

The reference has no streaming at all (hard batch barrier,
``/root/reference/README.md:12``). Here the events table doubles as a
replayable stream source (``readStream`` over its parquet directory),
and the windowed aggregations are the streaming twins of the batch
queries in ``plans/streaming_batch.py`` — tests run them with
``trigger(availableNow=True)`` into a memory sink and assert equality
with the batch results.

Watermarks bound state: late events beyond the watermark are dropped,
which is what makes these plans runnable indefinitely at production
rates (state per key·window, not per event).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.sources.catalog import (
    ensure_nanos_conf,
    nanos_to_ts,
    table_path,
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a file stream (schema pinned from the RAW batch
    read — ts arrives as nanos-long under the session's ``nanosAsLong``
    default, then converts to a µs timestamp exactly like the batch path
    in ``catalog.load_table``). The file-stream source lists a directory,
    so we stream the sf dir with a glob filter for the events file."""
    ensure_nanos_conf(spark)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return nanos_to_ts(raw, "ts")


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming 15-min tumbling counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming 1h/30min sliding window totals."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows (gap-based) per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "total_value")
    )


def run_to_memory(spark: SparkSession, stream_df: DataFrame, name: str) -> DataFrame:
    """Drain a stream with availableNow into a memory sink; return the
    materialized result as a batch DataFrame (complete output mode)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
