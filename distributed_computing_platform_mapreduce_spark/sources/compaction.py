"""Small-file compaction: rewrite a fragmented dataset at a target
file size.

The endemic 100 TB layout bug: streaming sinks, per-batch appends, and
over-parallel writes leave datasets as 10⁵–10⁷ kilobyte-scale files.
Every subsequent scan then pays per-file open/footer/seek costs that
dwarf the data read, and the driver pays listing + split planning for
every file. The fix is mechanical — read, coalesce to
``ceil(total_bytes / target)`` partitions, rewrite — but sizing the
partition count needs the dataset's actual on-disk byte size, which
this module gets from the filesystem (via Hadoop's FileSystem API, so
HDFS/S3A/local all work), not from guesses.

Compaction rewrites to a NEW path: an in-place overwrite that fails
midway destroys the only copy, and object stores have no atomic
directory swap — the caller promotes the compacted path (rename /
catalog repoint) as its final, separately-recoverable step.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_files) for every data file under ``path``, via
    the JVM Hadoop FileSystem (works for any supported scheme). Hidden
    and metadata files (``_SUCCESS``, ``.crc``) are excluded."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        total += status.getLen()
        n += 1
    return total, n


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> dict:
    """Rewrite the dataset at ``src_path`` into ``dst_path`` with
    ``ceil(total_bytes / target_file_bytes)`` output files. Returns a
    small report dict (sizes, file counts before/after) the caller can
    log or assert on.

    Uses ``repartition(n)`` (round-robin, one shuffle) rather than
    ``coalesce``: coalesce merges without a shuffle but chains the
    upstream parallelism down to n for the READ as well, so compacting
    a million-file dataset through coalesce(8) would scan on 8 tasks.
    The shuffle costs one pass over the data — the price of reading
    with full parallelism and writing at the target size."""
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be positive, got {target_file_bytes}")
    total, n_before = dataset_bytes(spark, src_path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df: DataFrame = spark.read.format(fmt).load(src_path)
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(dst_path)
    total_after, n_after = dataset_bytes(spark, dst_path)
    return {
        "bytes_before": total,
        "files_before": n_before,
        "bytes_after": total_after,
        "files_after": n_after,
        "target_file_bytes": target_file_bytes,
        "partitions_written": n_out,
    }
