"""RDD-level Maple/Juice — the imperative twin of ``compat.maplejuice``.

The north star names an "RDD/DataFrame API"; the DataFrame path
(mapInPandas/applyInPandas, Arrow-batched) is the production surface,
but the raw-RDD form is the most literal rendering of the reference's
dataflow (flatMap ≙ Maple — ``applications/wc-maple.py``; groupByKey +
per-key reduce ≙ Juice — ``applications/wc-juice.py``; sortByKey ≙ the
master's TreeMap gather, ``src/MapReduceMaster.java:450-451``) and is
occasionally the right tool for per-partition imperative logic.

Scale note: ``juice_rdd`` uses ``groupByKey`` deliberately — the Juice
contract hands the reducer ALL values of a key as an iterable, which is
exactly groupByKey's (shuffle-heavy) semantics. Reductions that are
associative should instead go through the declarative engine, where
partial aggregation happens map-side for free.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark import RDD
from pyspark.sql import SparkSession

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import MapFn, ReduceFn


def maple_rdd(
    spark: SparkSession, map_fn: MapFn, src: str | RDD, num_tasks: int | None = None
) -> RDD:
    """E1 on RDDs: one input line → 0..N (key, value) pairs via flatMap."""
    rdd = spark.sparkContext.textFile(src) if isinstance(src, str) else src
    if num_tasks is not None:
        rdd = rdd.repartition(num_tasks)
    return rdd.flatMap(lambda line: list(map_fn(line)))


def juice_rdd(kv: RDD, reduce_fn: ReduceFn, sort: bool = True) -> RDD:
    """E7/E8 on RDDs: per-key grouped reduce; ``sort`` reproduces the
    E10 lexicographic key order of the reference's single-file gather."""

    def run(item: tuple[str, Iterable[str]]):
        key, values = item
        return list(reduce_fn(key, values))

    out = kv.groupByKey().flatMap(run)
    return out.sortByKey() if sort else out
