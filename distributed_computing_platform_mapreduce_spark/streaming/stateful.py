"""Custom stateful streaming via ``applyInPandasWithState``.

The reference engine has a hard batch barrier and no state between jobs
(``/root/reference/README.md:12``); Structured Streaming's arbitrary
stateful operator is the modern replacement for "run another MapleJuice
job over the previous job's output". State lives per key in the state
store (RocksDB/HDFS-backed on a real cluster), so an unbounded stream
runs in bounded memory: O(keys · state row), never O(events).

``running_user_totals`` keeps a running (count, total) per user and
emits the updated aggregate each micro-batch — the canonical
update-mode pattern. Arrow-batched: the update function sees pandas
DataFrames per key, never Python rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum(value)) per user_id.

    Emits one updated row per key per micro-batch (update mode). With a
    single availableNow batch this equals the batch groupBy — asserted
    in tests.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_update_to_memory(spark, stream_df: DataFrame, name: str) -> DataFrame:
    """Drain an update-mode stateful stream with availableNow into a
    memory sink; returns the sink contents (one row per key per batch)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- transformWithStateInPandas (Spark 4 arbitrary-state API) ---------------


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running (count, sum) per user on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-49187): typed per-key value state
    via a ``StatefulProcessor``, schema evolution and timers supported
    by the engine, RocksDB state store required. Kept beside the
    classic form so both arbitrary-state APIs are exercised; the twin
    test asserts they produce identical results on the same stream.

    Dependency note: ``google.protobuf`` (the wire protocol of the API's
    state server) is not pip-installed in the build container; the twin
    test runs there via ``tests/_pbshim`` (routes ``google.protobuf`` to
    the protobuf 6.32 runtime already on the image's disk, with a
    narrowly-scoped gencode-version waiver — see that file). In
    environments with neither an installed protobuf nor the on-disk
    runtime, the twin test skips and the classic
    ``applyInPandasWithState`` form carries the verified coverage.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
