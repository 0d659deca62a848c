"""Mergeable distinct-count sketches: incremental corpus statistics.

"How many distinct tokens / users / URLs does the corpus have" is a
full shuffle of every distinct value when asked exactly — and at 100 TB
it gets asked after EVERY increment. The mergeable answer is the
Apache DataSketches HLL family Spark 4 ships natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):
sketch each increment once (bytes per group, not values), persist the
sketch table, and answer every later question — per-group counts,
whole-corpus rollups, increment-over-increment growth — by merging
kilobyte blobs. The relative error is ~1.04/√2^lgK (~1.6% at the
default lgK=12); the exact pipeline never needs to re-run.

Same storage pattern as ``dedup.minhash_index``: the sketch table IS
the persisted artifact; raw increments are never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_table(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` → ``(*group_cols,
    sketch binary)``. One scan, partial-aggregated shuffle (sketches
    merge map-side — the whole point); write the result to parquet as
    the increment's distinct-count artifact."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def hll_merge_tables(tables: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge per-increment sketch tables → ``(*group_cols, sketch)``
    covering the union. Kilobytes per group move; the raw data does
    not."""
    if not tables:
        raise ValueError("hll_merge_tables needs at least one table")
    unioned = tables[0]
    for t in tables[1:]:
        unioned = unioned.unionAll(t)
    return unioned.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )


def hll_estimate(table: DataFrame, group_cols: list[str]) -> DataFrame:
    """Readout: ``(*group_cols, n_distinct long)`` from a sketch table."""
    return table.select(
        *group_cols, F.hll_sketch_estimate("sketch").alias("n_distinct")
    )


def hll_total(table: DataFrame) -> int:
    """Whole-table distinct estimate: union every group's sketch into
    one and read it — a single bounded-driver scalar."""
    row = table.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n")
    ).collect()[0]
    # an EMPTY sketch table unions to NULL — zero distinct, not a crash
    return int(row["n"]) if row["n"] is not None else 0
