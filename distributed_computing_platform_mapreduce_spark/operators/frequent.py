"""Heavy hitters (frequent items) without a full-key shuffle.

The 100 TB question "what are the most frequent values of this column"
is usually answered with ``groupBy(col).count().orderBy(desc)`` — a
shuffle carrying EVERY distinct key. At web-corpus cardinalities
(10⁹–10¹¹ distinct tokens/URLs/hosts) that shuffle dwarfs the answer,
which only wants the top handful. The classical fix is a two-pass
summary + recount:

1. **Candidate pass** — Misra–Gries with ``k`` counters per partition
   (Misra & Gries 1982, "Finding repeated elements"): one Arrow-batched
   streaming pass, O(k) memory per task, no shuffle. The merged
   candidate list is ≤ partitions·k values, and the MG guarantee
   transfers: any value with global frequency > n/(k+1) survives in at
   least one partition's summary, so the candidate set is a SUPERSET of
   every such heavy hitter.
2. **Recount pass** — exact counts for candidates only: the candidate
   list broadcasts (bounded), the corpus is scanned once more, and the
   groupBy shuffles only candidate rows.

Output = exact counts for every true heavy hitter above the guarantee
threshold (plus possibly some lighter candidates — callers threshold or
``limit`` as needed). Deterministic given the data and partitioning of
the candidate pass is NOT required for correctness of the guarantee:
any partitioning yields a superset; the exact recount makes the final
counts partitioning-independent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_update(counters: dict, value, budget: int) -> None:
    """One MG step: increment if tracked, insert if room, else decrement
    every counter (dropping zeros)."""
    if value in counters:
        counters[value] += 1
    elif len(counters) < budget:
        counters[value] = 1
    else:
        dead = []
        for v in counters:
            counters[v] -= 1
            if counters[v] == 0:
                dead.append(v)
        for v in dead:
            del counters[v]


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 100,
    min_count: int | None = None,
) -> DataFrame:
    """Exact counts for the column's heavy hitters → ``(col, count
    long)``, guaranteed to include EVERY value with frequency >
    n/(k+1), via per-partition Misra–Gries summaries + an exact
    broadcast-filtered recount (module docstring has the plan shape).

    ``min_count`` filters the output (exact counts, so the filter is
    exact); by default everything recounted is returned — callers
    typically ``orderBy(desc("count")).limit(...)`` which is a bounded
    top-k (TakeOrderedAndProject), not a sort of the candidate set.
    """
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ensure_shipped(df.sparkSession)

    # The candidate pass runs over a STRING cast of the column: Arrow→
    # pandas converts a nullable int64 batch to float64, which (a) turns
    # nulls into NaN values `v is not None` would mis-count (each float
    # NaN is a distinct dict key) and (b) rounds integer values above
    # 2^53 so the recount join would MISS a guaranteed heavy hitter.
    # Strings survive the round-trip exactly for every atomic type; the
    # recount joins on the same cast, so final counts key the ORIGINAL
    # column values.
    as_str = df.select(F.col(col).cast("string").alias(col))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col].dropna():
                _misra_gries_update(counters, v, k)
        yield pd.DataFrame({col: list(counters.keys())}, dtype=object)

    candidates = (
        as_str.mapInPandas(summarize, f"{col} string").distinct()
    )  # ≤ partitions·k rows — broadcast-bounded by construction
    cand = candidates.select(F.col(col).alias("__cand"))
    counted = (
        df.select(col)
        .join(
            F.broadcast(cand),
            F.col(col).cast("string") == F.col("__cand"),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count("*").alias("count"))
    )
    if min_count is not None:
        counted = counted.filter(F.col("count") >= min_count)
    return counted
