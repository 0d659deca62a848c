"""1 GB skew-drill worker: run bench._skew_times_1gb in its OWN JVM and
print one JSON line.

Why (r13): the naive collect-per-key leg funnels the hot key's 10M
values through a single task — deliberately, that is the pathology the
A/B measures — and at the engine's 8 g default heap it OOMs
occasionally (one r12 record, one r13 record). In-process, that OOM
kills the WHOLE bench JVM: the post-sweep canary never runs and the
entire record ships unverifiable. Isolated here, a heap death costs
exactly the points it earned: the worker's errors ride back in the
JSON, the main sweep's canary discipline survives, and the drill gets
a clean dedicated heap (better determinism than inheriting whatever
storage/GC state ~40 prior queries left behind — the r12 pre-section
unpersist was the half-measure this replaces).
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import bench
    from distributed_computing_platform_mapreduce_spark import get_spark

    spark = get_spark("distributed-computing-platform-mapreduce-spark-skew1gb")
    spark.sparkContext.setLogLevel("ERROR")

    def _flush(times, spread, errors):
        # cumulative per-leg record (r15, ADVICE r14): the parent's
        # salvage takes the LAST parseable line, so a straggler kill
        # keeps every completed leg instead of zeroing the worker
        print(json.dumps({"times": times, "spread": spread, "errors": errors}))
        sys.stdout.flush()

    times, spread, errors = bench._skew_times_1gb(spark, progress=_flush)
    _flush(times, spread, errors)
    # a naive-leg OOM can leave the JVM wedged — the record is already
    # printed, so exit hard UNCONDITIONALLY rather than hang in a
    # post-OOM stop() until the parent's budget discards the data
    # (r13 ADVICE: stop() hanging, not raising, was the uncovered path)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
