from distributed_computing_platform_mapreduce_spark.functions.numeric import avg_money, dsum, money

__all__ = ["money", "dsum", "avg_money"]
