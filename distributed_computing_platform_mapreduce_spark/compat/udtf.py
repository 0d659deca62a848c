"""Maple as a SQL-registered Python UDTF — the third §2.4 mapping.

The reference's Maple contract is a user function from one input line
to 0..N ``(key, value)`` pairs (``/root/reference/src/MapReduceWorker.java:114-115``).
``compat.maplejuice.maple`` gives it to DataFrame users via
``mapInPandas``; this module gives the *SQL* surface the same
extensibility: wrap the callable in a Python UDTF (Spark 3.5+) so a
plain-SQL user can run their Maple inline —

    SELECT f.key, f.value FROM lines, LATERAL maple_wc(value) f
    SELECT * FROM maple_wc(TABLE(lines))

Arrow-batched like ``mapInPandas`` (``spark.sql.execution.pythonUDTF.
arrow.enabled``); the two forms are asserted row-equal to the
DataFrame maple in tests. Juice needs no UDTF twin — SQL grouped
aggregation over the UDTF output is the declarative Juice, and custom
reducers stay on ``applyInPandas`` (grouped-map has no SQL-function
form).
"""

from __future__ import annotations

from collections.abc import Iterable, Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

MapFn = Callable[[str], Iterable[tuple[str, str]]]


def maple_udtf(map_fn: MapFn):
    """Build a UDTF class for a Maple callable.

    ``eval`` receives a plain string in the LATERAL per-row form and a
    Row in the ``TABLE(...)`` form (whole-relation argument); both feed
    ``map_fn`` one line at a time, preserving its per-line contract.
    """

    @udtf(returnType="key string, value string")
    class MapleUDTF:
        def eval(self, line):
            if line is None:
                return
            if not isinstance(line, str):  # TABLE(...) form passes a Row
                line = line[0]
                if line is None:
                    return
            yield from map_fn(str(line))

    return MapleUDTF


def register_maple(spark: SparkSession, name: str, map_fn: MapFn) -> None:
    """Expose a Maple callable to SQL as table function ``name``."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.udtf.register(name, maple_udtf(map_fn))
