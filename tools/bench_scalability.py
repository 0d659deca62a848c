"""Core-count scalability worker: one Spark JVM at ``local[N]``, timing
the reference's two benchmark queries plus one shuffle-heavy extension
op, printing ONE JSON line.

Why this exists (r13): the reference publishes TWO benchmark axes — job
time vs data size AND phase time vs worker count
(``/root/reference/plots/plot-wc-scalability.py:7-10`` and
``plot-rwlg-scalability.py:7-10``, measured at 2/4/6/8 workers). The
repo benched only at one parallelism (local[32]); this worker produces
the missing strong-scaling curve. ``bench.py`` orchestrates it at
local[2/4/8/16/32] inside the canary-gated sweep, so the points land in
the round's BENCH record; it also runs standalone:

    python tools/bench_scalability.py --cores 4 [--sf-dir /root/testdata/sf0.1]

Design choices, pinned so the curve measures what it claims:

- **One subprocess per core count.** A SparkContext's master is fixed
  for the JVM's lifetime; in-process re-mastering is impossible, and a
  fresh JVM per point also makes every point pay identical JVM/codegen
  warmup (amortized by the untimed warm run, identically).
- **Strong scaling, fixed decomposition.** ``spark.sql.shuffle.
  partitions`` stays at the engine default (32) at EVERY core count —
  the work splits into the same tasks; only the executor thread pool
  varies. Varying partitions with cores would conflate scheduling
  granularity with parallelism (the reference's worker-count sweep
  holds its ⌊n/m⌋ chunking policy fixed the same way).
- **Identical plans.** wordcount/rwlg come from ``bench.wc_plan`` /
  ``bench.rwlg_uncapped_plan`` — the same module-level builders the
  BASELINE.md comparison points time — over the same materialized
  200 MB replica corpora; minhash is the same
  ``dedup.minhash_lsh_pairs`` call the headline ``dedup_minhash_lsh``
  point times, at the same sf dir, materialized with the same
  hash-struct discipline.
- **Warm + median.** Each query runs once untimed (Catalyst analysis +
  janino codegen + JIT are one-time per plan shape), then
  ``SPARK_GRAFT_BENCH_SCAL_RUNS`` (default 2) timed passes; the JSON
  carries median + min/max.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import bench
    from distributed_computing_platform_mapreduce_spark import get_spark
    from distributed_computing_platform_mapreduce_spark.operators import dedup
    from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SCAL_RUNS", "2")))
    spark = get_spark(
        f"distributed-computing-platform-mapreduce-spark-scal-c{args.cores}",
        master=f"local[{args.cores}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_path, edges_path = bench._ensure_ref_corpora(
        spark, args.sf_dir, "200mb", bench.REF_SCALES["200mb"]
    )

    def run_wc():
        bench.wc_plan(spark, docs_path).write.format("noop").mode("overwrite").save()

    def run_rwlg():
        bench.rwlg_uncapped_plan(spark, edges_path).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_minhash():
        # cold-by-design like the headline point: each call evicts the
        # previous call's persisted shingle table (operators/dedup.py)
        docs = load_table(spark, args.sf_dir, "documents")
        pairs = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
        )
        n = pairs.agg(F.bit_xor(F.xxhash64(F.struct(*pairs.columns)))).collect()[0][0]
        assert n is None or isinstance(n, int)

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for key, fn in (
        ("scal_wc200", run_wc),
        ("scal_rwlg200", run_rwlg),
        ("scal_minhash", run_minhash),
    ):
        try:
            fn()  # untimed warm: plan analysis + codegen + JIT
            samples = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            errors[key] = f"{type(exc).__name__}: {str(exc)[:200]}"
            continue
        times[key] = round(statistics.median(samples), 3)
        spread[key] = [round(min(samples), 3), round(max(samples), 3)]

    print(
        json.dumps(
            {
                "cores": args.cores,
                "queries": times,
                "spread": spread,
                "errors": errors,
                "runs": n_runs,
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
