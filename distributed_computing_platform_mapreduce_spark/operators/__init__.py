from distributed_computing_platform_mapreduce_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
