"""Streaming dedup and stream-stream joins — the streaming halves of the
training-data-pipeline story.

The reference's only dedup is a batch-side key race (E9); here exact
dedup runs ON the stream with bounded state: watermark + per-key state
eviction means an infinite stream dedups in O(keys inside the watermark
horizon) memory, which is what makes continuous ingestion feasible.
Likewise the stream-stream interval join keeps only the watermark-bound
slice of each side in the state store — the streaming twin of the batch
range join (``plans/relational.join_theta_range``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup: first occurrence of each key wins;
    duplicates arriving within the watermark horizon are dropped and the
    key's state is evicted once the watermark passes — so state is
    bounded by the horizon, not the stream length.

    ``dropDuplicatesWithinWatermark`` (Spark 3.5+) only requires dups to
    land within the horizon of each other — the right contract for
    at-least-once sources, where redelivery happens close to the
    original.
    """
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    window: str = "30 minutes",
    click_watermark: str = "1 hour",
    purchase_watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: purchases within ``window`` after
    each click, per user. Both sides are watermarked so the state store
    holds only the join-window slice of each stream; the time-range
    predicate is what lets Spark evict (an unconstrained stream-stream
    join would buffer forever).
    """
    c = clicks.select(
        F.col(key).alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", click_watermark)
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", purchase_watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {window}"
        ),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def stream_interval_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    window: str = "30 minutes",
    click_watermark: str = "1 hour",
    purchase_watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join (late-r6): clicks with no
    purchase inside the window still emit — with null purchase columns
    — but only once the watermark proves no match can still arrive
    (Spark holds the unmatched row in state until
    ``click_ts + window`` is past both watermarks, then emits the
    null-padded row and evicts). Same bounded-state story as the inner
    form; the null rows are the part a batch left join gets for free
    and a stream has to EARN from the watermark."""
    c = clicks.select(
        F.col(key).alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", click_watermark)
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", purchase_watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {window}"
        ),
        "leftOuter",
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def stream_enrich_static(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: the streaming fact joined to a batch
    dimension table — THE production lookup shape (events × users,
    clicks × catalog). Spark plans the static side as a broadcast per
    micro-batch (re-resolved each batch, so slowly-changing dims pick
    up storage updates between batches without restarting the query);
    no state store is involved and no watermark is needed because the
    static side never grows. Stream-STREAM joins (see
    ``stream_interval_join``) are the stateful cousin; reach for this
    form whenever one side is a table."""
    return events.join(dim, on, how)
