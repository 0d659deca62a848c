from distributed_computing_platform_mapreduce_spark.compat.maplejuice import (
    juice,
    juice_exe,
    maple,
    maple_exe,
    write_sorted_tsv,
)
from distributed_computing_platform_mapreduce_spark.compat.rdd import juice_rdd, maple_rdd
from distributed_computing_platform_mapreduce_spark.compat.udtf import maple_udtf, register_maple

__all__ = [
    "maple",
    "juice",
    "maple_exe",
    "juice_exe",
    "maple_rdd",
    "juice_rdd",
    "maple_udtf",
    "register_maple",
    "write_sorted_tsv",
]
