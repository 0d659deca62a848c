from distributed_computing_platform_mapreduce_spark.operators import (
    asof,
    dedup,
    intervals,
    multimodal,
    ranking,
    sampling,
    similarity,
    skew,
    text,
)

__all__ = [
    "asof",
    "dedup",
    "intervals",
    "multimodal",
    "ranking",
    "sampling",
    "similarity",
    "skew",
    "text",
]
