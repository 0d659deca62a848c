"""MapleJuice compatibility layer: the reference's user API on Spark.

The reference runs user logic as forked Python executables — a Maple exe
gets batches of ≤10 text lines and prints ``key,value`` lines
(``/root/reference/src/MapReduceWorker.java:109-158``); a Juice exe gets
one key plus a file of its values and prints ``key,value``
(``/root/reference/src/MapReduceWorker.java:228-262``). We reproduce the
*contract* with Python callables over Arrow batches:

- ``maple(spark, map_fn, src)``: flatMap semantics via ``mapInPandas`` —
  the vectorized analog of the 10-line subprocess batching (SURVEY.md
  E1/§2.4); ``num_tasks`` maps to a repartition only if asked (Spark's
  own file splitting is normally better).
- ``juice(kv, reduce_fn)``: per-key reduce via ``applyInPandas`` over
  ``groupBy(key)`` — the engine-accurate contract (values as iterable,
  not the README's argv string; see SURVEY.md §2.4 note).
- last-write-wins gather (E9), lexicographic key sort (E10), and the
  single-file tab-separated sink (E11) as explicit opt-ins —
  ``write_sorted_tsv`` is the only place the engine ever coalesces to 1.

Worker failure re-scheduling, progress tracking, SDFS replication
(E3/E4/E13, S1-S9) are Spark/storage built-ins and have no API here.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.window import Window

KV_SCHEMA = StructType(
    [StructField("key", StringType(), False), StructField("value", StringType(), True)]
)

MapFn = Callable[[str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, Iterable[str]], Iterable[tuple[str, str]]]


def maple(
    spark: SparkSession,
    map_fn: MapFn,
    src: str | DataFrame,
    num_tasks: int | None = None,
    line_col: str = "value",
) -> DataFrame:
    """Run a Maple (map) phase: one input line → 0..N (key, value) pairs.

    ``src`` is a text directory (read like the reference's
    ``sdfs_src_directory``) or an existing single-string-column DataFrame.
    ``map_fn(line)`` yields ``(key, value)`` string pairs — the per-line
    equivalent of the exe's stdout contract.
    """
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    df = spark.read.text(src) if isinstance(src, str) else src
    if num_tasks is not None:
        # The reference's ⌊n/m⌋ contiguous chunking (MapReduceMaster.java:60-83);
        # normally leave partitioning to the file scan + AQE.
        df = df.repartition(num_tasks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            vals: list[str] = []
            for line in pdf[line_col]:
                if line is None:
                    continue
                for k, v in map_fn(str(line)):
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    return df.mapInPandas(run, schema=KV_SCHEMA)


def juice(
    kv: DataFrame,
    reduce_fn: ReduceFn,
    num_tasks: int | None = None,
    dedup: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Run a Juice (reduce) phase over a (key, value) DataFrame.

    ``reduce_fn(key, values)`` yields ``(key, value)`` pairs — the values
    arrive as an in-order iterable, matching the engine's values-file
    contract. ``dedup="last"`` is an explicit opt-in reproducing the
    master's last-write-wins gather (E9); the default keeps every pair a
    reducer yields (the reference's race only collapses values across
    juice *task outputs*, not within one reducer's output — a lossy
    default would silently drop legitimate multi-pair reducers).
    ``sort`` reproduces the TreeMap key sort (E10).
    """
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(kv.sparkSession)
    if num_tasks is not None:
        kv = kv.repartition(num_tasks, "key")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf["key"].iloc[0])
        keys: list[str] = []
        vals: list[str] = []
        for k, v in reduce_fn(key, [str(v) for v in pdf["value"]]):
            keys.append(k)
            vals.append(v)
        return pd.DataFrame({"key": keys, "value": vals})

    out = kv.groupBy("key").applyInPandas(run, schema=KV_SCHEMA)
    if dedup == "last":
        # E9: one surviving value per key. The reference keeps whichever
        # juice output happened to arrive last (a race); we keep the
        # lexicographic max for determinism.
        w = Window.partitionBy("key").orderBy(F.col("value").desc())
        out = out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if sort:
        out = out.orderBy("key")
    return out


def write_sorted_tsv(kv: DataFrame, dest: str) -> None:
    """E10+E11 sink: key-sorted, tab-separated, ONE output file.

    The single-file gather is the reference's bottleneck-by-design
    (master writes everything — ``MapReduceMaster.java:453-489``); kept
    only behind this explicit compat call. Engine queries never do this.
    """
    kv.orderBy("key").coalesce(1).write.mode("overwrite").option("sep", "\t").csv(dest)


def maple_exe(
    spark: SparkSession,
    exe: list[str],
    src: str | DataFrame,
    lines_per_batch: int = 10,
    line_col: str = "value",
) -> DataFrame:
    """E1 subprocess contract: run an arbitrary executable as the Maple.

    The reference forks the user exe per ≤10-line batch, feeding lines as
    argv and reading ``key,value`` stdout lines
    (``/root/reference/src/MapReduceWorker.java:109-158``). Here each
    Arrow batch is re-chunked to ``lines_per_batch`` and the exe is
    invoked once per chunk with the lines as argv — same observable
    contract, but executors fork in parallel instead of one worker queue.
    """

    def run_exe(lines: list[str]) -> Iterable[tuple[str, str]]:
        import subprocess

        out = subprocess.run(
            [*exe, *lines], capture_output=True, text=True, check=True
        ).stdout
        for ln in out.splitlines():
            if ln:
                k, _, v = ln.partition(",")
                yield k, v

    df = spark.read.text(src) if isinstance(src, str) else src

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = [str(x) for x in pdf[line_col] if x is not None]
            keys: list[str] = []
            vals: list[str] = []
            for i in range(0, len(lines), lines_per_batch):
                for k, v in run_exe(lines[i : i + lines_per_batch]):
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    return df.mapInPandas(run, schema=KV_SCHEMA)


def juice_exe(kv: DataFrame, exe: list[str]) -> DataFrame:
    """E7 subprocess contract: run an executable as the Juice.

    The reference invokes the exe with the key and a file of its values
    (``/root/reference/src/MapReduceWorker.java:228-262``); we pass the
    key as argv[1] and the values on stdin (one per line) and read
    ``key,value`` stdout lines — file-free but contract-equivalent.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import subprocess

        key = str(pdf["key"].iloc[0])
        stdin = "\n".join(str(v) for v in pdf["value"])
        out = subprocess.run(
            [*exe, key], input=stdin, capture_output=True, text=True, check=True
        ).stdout
        keys: list[str] = []
        vals: list[str] = []
        for ln in out.splitlines():
            if ln:
                k, _, v = ln.partition(",")
                keys.append(k)
                vals.append(v)
        return pd.DataFrame({"key": keys, "value": vals})

    return kv.groupBy("key").applyInPandas(run, schema=KV_SCHEMA)


def wc_maple(line: str) -> Iterable[tuple[str, str]]:
    """Reference word-count Maple (``applications/wc-maple.py:6-7``)."""
    for w in line.split():
        yield w, "1"


def wc_juice(key: str, values: Iterable[str]) -> Iterable[tuple[str, str]]:
    """Reference word-count Juice (``applications/wc-juice.py:6-14``)."""
    yield key, str(sum(int(v) for v in values))


def rwlg_maple(line: str) -> Iterable[tuple[str, str]]:
    """Reference RWLG Maple: ``src,dst`` → (dst, src)
    (``applications/rwlg-maple.py:6-7``)."""
    parts = line.split(",")
    if len(parts) >= 2:
        yield parts[1], parts[0]


def rwlg_juice(key: str, values: Iterable[str]) -> Iterable[tuple[str, str]]:
    """Reference RWLG Juice, intended semantics (sorted, no newline bug —
    SURVEY.md §2.5 item 6): (dst, 'src1,src2,...')."""
    yield key, ",".join(sorted(values))
