"""Deterministic numeric aggregation helpers.

Summing doubles is order-dependent; Spark's partial aggregation and
DuckDB's scan order differ, so a naive ``SUM(double)`` can hash-mismatch
the oracle. All money columns in the test data carry exactly 2 decimals,
so we sum in DECIMAL (exact integer arithmetic — associative, order-free)
and cast the exact result back to double. Both engines then produce
bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a 2-decimal double column → double."""
    return F.sum(money(col)).cast("double").alias(alias)


def avg_money(col: Column | str, alias: str) -> Column:
    """avg = exact decimal sum / count — one deterministic IEEE division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)
