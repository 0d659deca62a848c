"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the reference's two benchmark queries (wordcount, rwlg —
BASELINE.md measures exactly these) plus the canonical analytical shapes
(scan-agg q1, join-agg q3/q5, filter-agg q6) and the scale-path extension
ops (minhash dedup, LSH similarity).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_computing_platform_mapreduce_spark import get_spark
from distributed_computing_platform_mapreduce_spark.plans import QUERIES

BENCH_QUERIES = [
    "wordcount",
    "rwlg",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "window_ranking_suite",
    "window_session",
    "dedup_minhash_lsh",
    "similarity_topk_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("distributed-computing-platform-mapreduce-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/catalyst paths once so per-query numbers measure the
    # engine, not first-call classloading.
    QUERIES["tpch_q6"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count() if name not in ("wordcount", "rwlg") else len(df.collect())
        times[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    total = round(sum(times.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
