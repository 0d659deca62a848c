"""Batch interval (range-overlap) join.

The reference has no join operator at all (a user would hand-roll one as
a Maple/Juice program over concatenated inputs — SURVEY.md §2.6 joins
row); the stream-stream form lives in ``streaming/joins_dedup.py``. This
is the BATCH form, with the banding strategy that survives 100×:

A naive overlap join ``l.start <= r.end AND r.start <= l.end`` has no
equality key, so Spark can only plan a nested-loop join — O(|L|·|R|)
comparisons. Banding manufactures the equality key: slice time into
fixed-width buckets, explode each interval to the buckets it covers,
hash-join on (bucket [, keys]), and keep exact-overlap matches. Each
overlapping pair shares at least one bucket, so recall is exact; to
avoid emitting a pair once per shared bucket, a pair is kept only in
the bucket containing ``greatest(l.start, r.start)`` (the first bucket
where both are live) — no ``distinct`` pass needed, so nothing holds
the full output in a shuffle for dedup.

Bucket width tunes the explode factor vs bucket density trade-off: width
≈ the typical interval length keeps the explode ≤2× while buckets stay
selective. Skewed hot buckets (a burst hour) are ordinary join skew —
AQE skew-join splits them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _buckets(start: Column, end: Column, width: int) -> Column:
    """All bucket ids [floor(start/width) .. floor(end/width)]."""
    return F.sequence(
        F.floor(start / F.lit(width)).cast("long"),
        F.floor(end / F.lit(width)).cast("long"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Inner join of rows whose [start, end] intervals overlap (closed
    bounds), optionally also matching equality ``on`` keys.

    Start/end columns must be numeric (cast timestamps to epoch ms/s
    first) and satisfy start <= end. With ``bucket_width`` the banded
    plan above is used (required when ``on`` is empty — otherwise the
    only possible plan is a nested-loop join); without it, the join
    relies on the ``on`` equality keys and applies the overlap predicate
    as a join filter.

    Column names must be disjoint between the two sides except the
    ``on`` keys (standard join hygiene; alias beforehand).
    """
    on = list(on or [])
    # Same reserved-name hygiene as asof_join_backward: a user __bkt
    # column would silently corrupt the manufactured join key.
    for side, df in (("left", left), ("right", right)):
        if "__bkt" in df.columns:
            raise ValueError(f"interval_join reserves column name '__bkt' ({side} side)")
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    if bucket_width is None:
        if not on:
            raise ValueError(
                "interval_join without equality keys needs bucket_width "
                "(the alternative is a cartesian nested-loop join)"
            )
        return left.join(right, on).filter(overlap)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    l = left.withColumn("__bkt", F.explode(_buckets(F.col(l_start), F.col(l_end), bucket_width)))
    r = right.withColumn("__bkt", F.explode(_buckets(F.col(r_start), F.col(r_end), bucket_width)))
    first_live = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bucket_width)
    ).cast("long")
    return (
        l.join(r, on + ["__bkt"])
        .filter(overlap & (F.col("__bkt") == first_live))
        .drop("__bkt")
    )
