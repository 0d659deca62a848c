from distributed_computing_platform_mapreduce_spark.compat.maplejuice import juice, maple, write_sorted_tsv

__all__ = ["maple", "juice", "write_sorted_tsv"]
