from distributed_computing_platform_mapreduce_spark.operators import (
    asof,
    dedup,
    multimodal,
    similarity,
    skew,
    text,
)

__all__ = ["asof", "dedup", "similarity", "skew", "text", "multimodal"]
