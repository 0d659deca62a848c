"""Fault injection: the Spark analog of the reference's failure drills.

The reference platform's headline claim is that worker failures do not
change query output — it re-schedules a failed worker's Maple/Juice
tasks on the survivors (``/root/reference/src/MapReduceMaster.java:211-263``)
and ships a message-loss injection knob to prove it (3/10/30% drop
rates, ``/root/reference/src/MembershipListMaintainer.java:64-65,170-177``;
SURVEY.md §5 item 4). In this engine the equivalent machinery is
Spark's task retry + shuffle-replay: a lost task is re-run from its
lineage, deterministic tasks re-produce identical partitions, and the
job's output is byte-identical to a failure-free run.

This module is the injection knob: ``inject_task_failures`` wraps any
DataFrame in an identity ``mapInPandas`` stage that RAISES on the first
attempt(s) of chosen partitions (``TaskContext.attemptNumber()`` /
``partitionId()``), so a retry-enabled scheduler (``local[N, F]`` with
F ≥ attempts+1, or a cluster's default ``spark.task.maxFailures=4``)
must recover through re-execution for the query to finish at all.
Tests then assert the recovered output equals the clean run row-for-row
(``tests/test_fault_tolerance.py``).

Scale note: the injected stage is a zero-copy Arrow passthrough — it
exists to place a failure point into the physical plan, pre- or
post-shuffle, not to transform data. Production code never imports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def inject_task_failures(
    df: DataFrame,
    every_nth_partition: int = 2,
    attempts: int = 1,
    marker_dir: str | None = None,
) -> DataFrame:
    """Identity stage that fails the first ``attempts`` attempts of every
    ``every_nth_partition``-th partition with a RuntimeError.

    ``marker_dir`` (optional): each injected failure touches
    ``{marker_dir}/p{partitionId}_a{attemptNumber}`` before raising,
    letting a test assert the drill actually fired (a vacuously-clean
    run proves nothing). A file, not an accumulator, because Spark
    discards accumulator updates from failed task attempts — the
    failure evidence must escape through a channel the failure cannot
    revoke. Deterministic given a fixed partitioning: the SAME
    partitions fail in every run, and the retried attempt processes the
    SAME rows — exactly the property that makes recovery output
    byte-identical.
    """
    if every_nth_partition <= 0:
        raise ValueError(f"every_nth_partition must be positive, got {every_nth_partition}")
    if attempts <= 0:
        raise ValueError(f"attempts must be positive, got {attempts}")

    def passthrough(batches):
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            ctx is not None
            and ctx.partitionId() % every_nth_partition == 0
            and ctx.attemptNumber() < attempts
        ):
            if marker_dir is not None:
                with open(
                    os.path.join(
                        marker_dir,
                        f"p{ctx.partitionId()}_a{ctx.attemptNumber()}",
                    ),
                    "w",
                ):
                    pass
            raise RuntimeError(
                "chaos: injected task failure "
                f"(partition={ctx.partitionId()}, attempt={ctx.attemptNumber()})"
            )
        yield from batches

    return df.mapInPandas(passthrough, schema=df.schema)
