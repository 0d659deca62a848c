"""Driver simulation: plain SparkSession, every registered query vs its
DuckDB oracle — mirrors the EXTERNAL driver's comparison path.

Crucial difference from the pre-r11 /tmp version of this script (and
from ``tests/test_oracle_parity.py``): both sides are fetched **through
pandas** (`DataFrame.toPandas()` / duckdb `.df()`), not `collect()` /
`fetchall()`.  The external driver converts via pandas/Arrow, where a
DuckDB HUGEINT column arrives as float64 — so a Spark bigint ``8`` vs
an oracle HUGEINT ``8`` hash-mismatches (``'8'`` vs ``'8.0'``) even
though ``fetchall()`` would hand back a Python int and ``8 == 8.0``
passes.  That exact gap let the r10 ``dedup_spans`` para-leg oracle go
red in CORRECTNESS_r10.json while the builder's gate stayed green.
Cell canonicalization here therefore preserves the int-vs-float
distinction (repr-level), matching the driver's value-hash semantics.

Usage:  python tools/drive_driver_contract.py [sf_dir] [name_filter...]
Default sf_dir is /root/testdata/sf0.01 (the driver's gate SF).
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    """Canonical string for one cell, driver-faithful.

    - int-family and float-family render DIFFERENTLY (``'8'`` vs
      ``'8.0'``) — this is the property that catches oracle-side
      HUGEINT/float widening the old fetchall() compare missed.
    - NaN/None/NaT all normalize explicitly; datetime-likes normalize
      to isoformat with a midnight-timestamp == date equivalence
      (duckdb .df() hands DATE back as datetime64[ns]).
    - arrays/lists recurse.
    """
    if v is None:
        return "None"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        # Spark MapType arrives via toPandas as a python dict, whose
        # repr is INSERTION-ordered — canonicalize by sorted key so two
        # value-identical maps can't hash apart. NOTE: the external
        # driver's canonicalization of map columns is unknown, so
        # registered queries must not OUTPUT map-typed columns (the
        # oracle type lint enforces this); this branch keeps ad-hoc
        # sim runs honest rather than licensing map outputs.
        items = sorted(v.items(), key=lambda kv: canon_cell(kv[0]))
        return "{" + ",".join(f"{canon_cell(a)}:{canon_cell(b)}" for a, b in items) + "}"
    if isinstance(v, decimal.Decimal):
        # Spark DecimalType arrives as decimal.Decimal while duckdb
        # .df() widens to float64 — render through the float rules so a
        # value-equal pair can't false-fail. Same caveat as dicts: the
        # external driver's Decimal handling is unverified, so the type
        # lint keeps decimal outputs out of registered queries.
        return repr(float(v))
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "None"
        s = v.isoformat()
        return s[:10] if s.endswith("T00:00:00") else s
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:10] if s.endswith("T00:00:00") else s
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    return repr(v)


def canon_frame(df: pd.DataFrame) -> list[str]:
    """Column-name-sorted, row-sorted canonical lines — the driver's
    value-hash preimage."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        cells = []
        for v in row:
            # pandas renders SQL NULL as NaN/NaT even in object columns
            if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                cells.append("NaN")
            else:
                cells.append(canon_cell(v))
        out.append("|".join(cells))
    out.sort()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    import __spark_entry__ as e

    edf = e.entry(spark)
    print(f"entry: {len(edf.collect())} rows, schema ok", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    names = [n for n in queries if not name_filter or any(f in n for f in name_filter)]
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"spark err: {exc}"))
            print(f"FAIL {name}: spark err {str(exc)[:200]}", flush=True)
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spdf)} rows {time.time() - t0:.1f}s", flush=True)
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"duckdb err: {exc}"))
            print(f"FAIL {name}: duckdb err {str(exc)[:200]}", flush=True)
            continue
        if sorted(spdf.columns) != sorted(dpdf.columns):
            bad.append((name, f"cols {list(spdf.columns)} vs {list(dpdf.columns)}"))
            print(f"FAIL {name}: col mismatch", flush=True)
            continue
        if len(spdf) != len(dpdf):
            bad.append((name, f"rows {len(spdf)} vs {len(dpdf)}"))
            print(f"FAIL {name}: rowcount {len(spdf)} vs {len(dpdf)}", flush=True)
            continue
        a, b = canon_frame(spdf), canon_frame(dpdf)
        diff = sum(1 for x, y in zip(a, b) if x != y)
        if diff:
            first = next((x, y) for x, y in zip(a, b) if x != y)
            bad.append((name, f"{diff} value rows differ; first {first}"))
            print(f"FAIL {name}: {diff} differing rows; first {str(first)[:300]}", flush=True)
        else:
            print(f"ok {name}: {len(spdf)} rows {time.time() - t0:.1f}s", flush=True)

    print(f"\n{len(names) - len(bad)}/{len(names)} green")
    for name, why in bad:
        print(f"  BAD {name}: {why[:300]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
