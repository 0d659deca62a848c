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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet → predicate pushdown + column pruning free.

    events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; read nanos as long and convert to a microsecond timestamp
    (integer div — nanos ~1.7e18 exceed double's 53-bit mantissa, so no
    float path). DuckDB truncates ns→µs identically.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` plans work too."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
