"""Table catalog over the driver-provided parquet test data.

The reference's only source is SDFS line-text directories read via quorum
``get`` (``/root/reference/src/SDFSServer.java:495-544``); replication and
quorum are storage-layer concerns we delegate to the filesystem. Our
sources are columnar parquet scans — Catalyst pushes filters and prunes
columns into the scan, which the reference cannot do (it always ships
whole files to workers, ``/root/reference/src/MapReduceWorker.java:64-68``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make timestamp handling deterministic on ANY session — including
    the external driver's plain SparkSession, which doesn't go through
    ``get_spark()``'s defaults. Two knobs, both idempotent:

    - ``nanosAsLong`` so TIMESTAMP(NANOS) parquet (the legacy testdata
      encoding) reads as long instead of throwing;
    - session timezone pinned UTC so the ``TIMESTAMP_NTZ → timestamp``
      re-tag in ``nanos_to_ts`` and every window/epoch computation agree
      with DuckDB regardless of the host JVM's default zone. Timestamp
      semantics must not depend on where the cluster happens to run.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # No fallback arg here: conf.get(key, fallback) VALIDATES the fallback
    # for this key and an empty/None sentinel throws INVALID_CONF_VALUE on
    # a plain session (caught by the driver-sim verify, invisible to the
    # pytest suite whose get_spark() pre-sets the zone). timeZone always
    # resolves to a value, so the no-default form is safe everywhere.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def nanos_to_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize any on-disk ``ts`` encoding to a session-TZ ``timestamp``.

    The ingest layer owns timestamp normalization — every downstream
    operator (watermarks, ``unix_micros``, interval banding) assumes a
    plain ``TimestampType``. Three encodings seen across testdata
    generations, all mapped here:

    - ``LongType`` (legacy nanos-as-long via ``nanosAsLong``): integer
      div — nanos ~1.7e18 exceed double's 53-bit mantissa, so no float
      path. DuckDB truncates ns→µs identically.
    - ``TimestampNTZType`` (``timestamp[us]`` with no timezone): cast to
      ``timestamp``. The session timezone is pinned UTC (``session.py``),
      so the cast is an exact re-tag — wall-clock values are unchanged
      and DuckDB (which reads the same NTZ µs values) agrees.
    - ``TimestampType``: already normalized, no-op.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dtype, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet → predicate pushdown + column pruning free.

    events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; the session default ``spark.sql.legacy.parquet.nanosAsLong``
    reads nanos as long and ``nanos_to_ts`` converts (same path batch and
    streaming — see ``streaming/windows.py``).
    """
    if name == "events":
        ensure_nanos_conf(spark)
        return nanos_to_ts(spark.read.parquet(table_path(sf_dir, name)), "ts")
    return spark.read.parquet(table_path(sf_dir, name))


def load_text_dir(spark: SparkSession, path: str, line_col: str = "value") -> DataFrame:
    """The reference's ONLY input mode: a directory of line-text files
    (``sdfs_src_directory`` — ``/root/reference/src/MapReduceMaster.java:56``).
    One row per line; Spark splits files across tasks instead of the
    reference's ⌊n/m⌋ whole-file assignment."""
    df = spark.read.text(path)
    return df if line_col == "value" else df.withColumnRenamed("value", line_col)


def load_csv(
    spark: SparkSession, path: str, header: bool = True, infer: bool = True, **options
) -> DataFrame:
    """CSV scan (S10+: columnar/structured formats beyond the reference's
    text-only surface). Schema inference off → pass an explicit schema
    via options for production scans (inference reads the data twice)."""
    return spark.read.options(
        header=str(header).lower(), inferSchema=str(infer).lower(), **options
    ).csv(path)


def load_json(spark: SparkSession, path: str, **options) -> DataFrame:
    """JSON-lines scan (S10+). Same schema-inference caveat as CSV."""
    return spark.read.options(**options).json(path)


def load_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC scan (S10+, r6): the other columnar format large warehouses
    ship; Spark's native reader gives the same predicate-pushdown and
    column-pruning behavior the parquet path gets (plan-asserted in
    ``test_orc_roundtrip_and_pushdown``). Schema travels in the file —
    no inference caveat."""
    return spark.read.options(**options).orc(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` plans work too."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
