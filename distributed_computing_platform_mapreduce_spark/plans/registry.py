"""Registry of named queries and their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 registers here with a PySpark
implementation and (where SQL-expressible) an ANSI-SQL oracle. The
driver runs both sides at sf=0.01 and compares row-count + schema +
order-insensitive value hash — the automated version of the reference's
MapleJuice-vs-Hadoop differential testing (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL over the same tables.

    Omit ``oracle`` only for genuinely non-SQL-expressible ops (the driver
    then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
