"""As-of (backward) join: for each left row, the latest right value at or
before the left row's timestamp, per key.

The reference has no time semantics at all (SURVEY.md §2.6); this is the
standard time-series operator every tick/event pipeline needs. Spark has
no native ASOF JOIN, so we express it as the classic union + ordered
window trick:

    union(left rows, right rows) sorted by (key, ts, right-first)
    → last(right_value, ignorenulls) over rows-unbounded-preceding
    → keep left rows

One shuffle on the key, one local sort — the same cost as a sort-merge
join, with no range-explosion. This scales to arbitrarily wide time
ranges because no per-pair candidate set is ever materialized (a naive
range join would be |left|·|right matches in range|).

Ties: a right row at exactly the left timestamp IS visible (ASOF
semantics ``l.ts >= r.ts``) — the sort places right rows before left
rows at equal timestamps. Callers must pre-aggregate the right side to
one row per (key, ts) for deterministic output (same requirement DuckDB
ASOF has when the right side has duplicate timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Left as-of join: all left columns + ``out_col`` = latest right
    ``value_col`` with ``right_ts <= left_ts`` for the same ``on`` key
    (NULL when no prior right row exists — LEFT ASOF semantics)."""
    left_cols = list(left.columns)
    # The rewrite routes right-side data through internal columns merged
    # into the left schema via unionByName; a collision would silently mix
    # left data into the value stream.
    reserved = {"__t", "__v", "__is_right", out_col}
    clash = reserved.intersection(left_cols)
    if clash:
        raise ValueError(
            f"asof_join_backward: left columns {sorted(clash)} collide with "
            "internal/output columns — rename them before joining"
        )
    l2 = (
        left.withColumn("__t", F.col(left_ts))
        .withColumn("__is_right", F.lit(0))
    )
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.col(value_col).alias("__v"),
        F.lit(1).alias("__is_right"),
    )
    merged = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(out_col, F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
        .select(*left_cols, out_col)
    )
