"""Mirror of the driver's correctness gate: every registered query with
an oracle is run via Spark AND via DuckDB on the same parquet tables;
row count, column names, and order-insensitive values must match
exactly (floats bit-for-bit — the plans are designed for that via
decimal-exact aggregation and order-defined folds).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from distributed_computing_platform_mapreduce_spark.plans import ORACLES, QUERIES
from distributed_computing_platform_mapreduce_spark.sources.catalog import TABLES, table_path


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLE_QUERIES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(__import__(
    "distributed_computing_platform_mapreduce_spark.plans.tpch_shapes",
    fromlist=["SHAPES"],
).SHAPES))
def test_tpch_shape_matches_oracle(spark, sf_dir, name):
    """The extra TPC-H optimizer shapes (14 as of r9) (plans/tpch_shapes.py) ride
    OUTSIDE the 50-query driver cap but get the identical compare: the
    same SQL text runs through Spark's SQL front end and DuckDB, pinning
    EXISTS/NOT-EXISTS decorrelation, scalar subqueries, disjunctive join
    predicates, and conditional aggregation."""
    from distributed_computing_platform_mapreduce_spark.plans import tpch_shapes

    sdf = tpch_shapes.run_shape(spark, sf_dir, name)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    assert spark_rows, f"{name}: degenerate shape — zero rows proves nothing"

    con = _duck(sf_dir)
    res = con.execute(tpch_shapes.SHAPES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"


def test_all_oracle_names_have_queries():
    assert set(ORACLES) <= set(QUERIES)


# Types DuckDB can emit that the driver's pandas/Arrow conversion renders
# lossily (HUGEINT/UHUGEINT -> float64), hash-mismatching against Spark's
# bigint even when every value is identical. The r10 `dedup_spans` para
# leg's untyped sum() went red exactly this way (CORRECTNESS_r10.json) —
# this lint makes the class unrepresentable in committed oracles.
_PANDAS_LOSSY_TYPES = ("HUGEINT", "UHUGEINT")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_types_survive_pandas(sf_dir, name):
    con = _duck(sf_dir)
    rel = con.sql(ORACLES[name])  # lazy: resolves types without executing
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        for bad in _PANDAS_LOSSY_TYPES:
            assert bad not in t, (
                f"{name}.{col} is {t}: DuckDB {bad} arrives as float64 through "
                f"the driver's pandas path and hash-mismatches Spark's bigint "
                f"(cast the SQL expression, e.g. CAST(sum(...) AS BIGINT))"
            )


def test_driver_sim_canon_contract():
    """The committed sim's value canon is the parity gate's preimage —
    pin its invariants: row-order insensitivity, column-name ordering,
    NaN/None normalization, date==midnight-timestamp equivalence (duckdb
    .df() hands DATE back as datetime64[ns]), bytes, arrays, bools."""
    import datetime
    import importlib.util
    import os

    import numpy as np
    import pandas as pd

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "drive_driver_contract.py")
    spec = importlib.util.spec_from_file_location("drive_driver_contract_c", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    a = pd.DataFrame({"x": [1, 2], "y": ["p", "q"]})
    b = pd.DataFrame({"y": ["q", "p"], "x": [2, 1]})  # shuffled rows AND cols
    assert mod.canon_frame(a) == mod.canon_frame(b)

    # date (Spark toPandas object-dtype) == midnight datetime64 (duckdb .df())
    spark_side = pd.DataFrame({"d": [datetime.date(2024, 3, 1)]})
    duck_side = pd.DataFrame({"d": pd.to_datetime(["2024-03-01"])})
    assert mod.canon_frame(spark_side) == mod.canon_frame(duck_side)
    # but a REAL time-of-day is not erased
    with_time = pd.DataFrame({"d": pd.to_datetime(["2024-03-01 01:00:00"])})
    assert mod.canon_frame(duck_side) != mod.canon_frame(with_time)

    # float NULL (NaN) on both sides normalizes identically; NaN != 0.0
    assert mod.canon_frame(pd.DataFrame({"v": [float("nan")]})) == mod.canon_frame(
        pd.DataFrame({"v": [np.nan]})
    )
    assert mod.canon_cell(float("nan")) != mod.canon_cell(0.0)

    # arrays: numpy (Spark toPandas) == python list (duckdb), elementwise typed
    assert mod.canon_cell(np.array([1.5, 2.5])) == mod.canon_cell([1.5, 2.5])
    assert mod.canon_cell([1]) != mod.canon_cell([1.0])

    # bytes and bools round through stable forms; numpy scalars unwrap
    assert mod.canon_cell(b"\x01\xff") == mod.canon_cell(bytearray(b"\x01\xff"))
    assert mod.canon_cell(np.bool_(True)) == mod.canon_cell(True)
    assert mod.canon_cell(np.int64(7)) == mod.canon_cell(7)
    assert mod.canon_cell(np.float64(7.25)) == mod.canon_cell(7.25)
    # bool is not the string/int it prints like
    assert mod.canon_cell(True) != mod.canon_cell(1)
    assert mod.canon_cell(True) != mod.canon_cell("true")


def test_driver_sim_canon_distinguishes_int_from_float():
    """The committed driver-sim (tools/drive_driver_contract.py) must keep
    the int-vs-float distinction the external driver's value-hash has —
    `8 == 8.0` via fetchall() is exactly how the r10 red row passed the
    old builder gate."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "drive_driver_contract.py")
    spec = importlib.util.spec_from_file_location("drive_driver_contract", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.canon_cell(8) != mod.canon_cell(8.0)
    assert mod.canon_cell(8) == mod.canon_cell(8)
    assert mod.canon_cell(8.5) == mod.canon_cell(8.5)
    import pandas as pd

    spark_side = pd.DataFrame({"n": pd.array([8, 9], dtype="int64")})
    oracle_side = pd.DataFrame({"n": pd.array([8.0, 9.0], dtype="float64")})  # HUGEINT via .df()
    assert mod.canon_frame(spark_side) != mod.canon_frame(oracle_side)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without oracles must still execute and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
