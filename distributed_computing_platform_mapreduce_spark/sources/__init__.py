from distributed_computing_platform_mapreduce_spark.sources import bucketing, partitioned
from distributed_computing_platform_mapreduce_spark.sources.catalog import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views", "bucketing", "partitioned"]
