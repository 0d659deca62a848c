"""Source coverage: the reference's text-directory input mode feeding a
full maple→juice pipeline, plus the CSV/JSON structured scans.
"""

from __future__ import annotations

import collections
import json

from distributed_computing_platform_mapreduce_spark.compat.maplejuice import juice, maple, wc_juice, wc_maple
from distributed_computing_platform_mapreduce_spark.sources.catalog import (
    load_csv,
    load_json,
    load_text_dir,
)


def test_maple_over_text_directory(spark, tmp_path):
    """E1+S2: maple consumes a directory of line-text files — the
    reference's sdfs_src_directory contract — and wordcount through the
    compat pipeline matches a host-side count."""
    lines0 = ["the quick brown fox", "jumps over the lazy dog"]
    lines1 = ["the dog sleeps", "", "quick quick"]
    (tmp_path / "part0.txt").write_text("\n".join(lines0) + "\n")
    (tmp_path / "part1.txt").write_text("\n".join(lines1) + "\n")

    expected = collections.Counter(
        w for ln in lines0 + lines1 for w in ln.split()
    )
    kv = maple(spark, wc_maple, str(tmp_path))
    out = juice(kv, wc_juice, sort=True).collect()
    got = {r["key"]: int(r["value"]) for r in out}
    assert got == dict(expected)
    keys = [r["key"] for r in out]
    assert keys == sorted(keys)  # E10 key sort

    df = load_text_dir(spark, str(tmp_path), line_col="line")
    assert df.columns == ["line"]
    assert df.count() == 5  # empty line included; text source keeps it


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Same-bucketed tables must join with zero Exchange — the pay-the-
    shuffle-once layout for repeated key joins. The unbucketed plan for
    the same join IS allowed its exchanges; the contrast is the point."""
    from distributed_computing_platform_mapreduce_spark.sources.bucketing import (
        co_located_join,
        write_bucketed,
    )
    from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

    customers = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        customers.withColumnRenamed("c_custkey", "custkey"),
        "bkt_customer", ["custkey"], n_buckets=8, sort_cols=["custkey"],
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "bkt_orders", ["custkey"], n_buckets=8, sort_cols=["custkey"],
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # These test tables are tiny enough to broadcast, which would beat
        # bucketing and hide the property under test; at the layout's real
        # scale both sides are far beyond any broadcast threshold.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = co_located_join(spark, "bkt_customer", "bkt_orders", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        expected = customers.join(
            orders, customers.c_custkey == orders.o_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_partitioned_write_prunes_at_plan_time(spark, sf_dir, tmp_path):
    """A filter on the partition column must become PartitionFilters —
    resolved against directory names, zero data files of other
    partitions opened. This is the columnar twin of not shipping the
    whole source directory to every worker."""
    from pyspark.sql import functions as F

    from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table
    from distributed_computing_platform_mapreduce_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    dest = str(tmp_path / "events_by_day")
    write_partitioned(events, dest, ["day"])

    one_day = events.select(F.min(F.to_date("ts"))).first()[0]
    scan = read_partitioned(spark, dest).filter(F.col("day") == F.lit(one_day))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf and "isnotnull" in pf
    # pruning is real: the filtered scan reads exactly that day's rows
    expected = events.filter(F.col("day") == F.lit(one_day)).count()
    assert scan.count() == expected > 0
    # and the layout round-trips the full dataset
    assert read_partitioned(spark, dest).count() == events.count()


def test_csv_and_json_scans(spark, tmp_path):
    csv_path = tmp_path / "t.csv"
    csv_path.write_text("id,name,score\n1,a,1.5\n2,b,2.5\n")
    df = load_csv(spark, str(csv_path))
    assert df.columns == ["id", "name", "score"]
    assert {(r["id"], r["name"], r["score"]) for r in df.collect()} == {
        (1, "a", 1.5),
        (2, "b", 2.5),
    }

    json_path = tmp_path / "t.jsonl"
    json_path.write_text(
        "\n".join(json.dumps(x) for x in [{"id": 1, "tags": ["x"]}, {"id": 2, "tags": []}])
    )
    dj = load_json(spark, str(json_path))
    rows = {r["id"]: list(r["tags"]) for r in dj.collect()}
    assert rows == {1: ["x"], 2: []}


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC (S10+, r6): write the orders table to ORC, read it back
    identical, and confirm the native reader gives the same
    filter-pushdown + column-pruning the parquet path gets."""
    from distributed_computing_platform_mapreduce_spark.sources.catalog import (
        load_orc,
        load_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)

    back = load_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0 and orders.exceptAll(back).count() == 0

    q = back.filter(back.o_totalprice > 400000.0).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    read_schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "o_orderpriority" not in read_schema and "o_custkey" not in read_schema


def test_events_ts_normalized_across_encodings(spark, tmp_path):
    """Schema contract: ``load_table(events).ts`` is a plain TimestampType
    no matter how the driver regenerated the parquet — nanos-as-long
    (TIMESTAMP(NANOS)), µs with no timezone (TIMESTAMP_NTZ), or µs UTC.
    Round 4 regression: the testdata moved from nanos to µs-NTZ and the
    ingest layer silently passed NTZ through, breaking watermarks and
    unix_micros downstream. The ingest layer owns normalization; this
    pins it for every encoding.
    """
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    wall = [base + dt.timedelta(minutes=i) for i in range(3)]
    micros = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in wall]

    encodings = {
        "nanos_long": pa.array([m * 1000 for m in micros], type=pa.timestamp("ns")),
        "us_ntz": pa.array(micros, type=pa.timestamp("us")),
        "us_utc": pa.array(micros, type=pa.timestamp("us", tz="UTC")),
    }
    for name, arr in encodings.items():
        sf = tmp_path / name
        sf.mkdir()
        tbl = pa.table({"event_id": pa.array([1, 2, 3], type=pa.int64()), "ts": arr})
        pq.write_table(tbl, str(sf / "events.parquet"))

        df = load_table(spark, str(sf), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), (
            f"{name}: got {df.schema['ts'].dataType}"
        )
        # values are identical wall-clock instants across encodings
        # (session TZ pinned UTC), and micro-precision survives
        got = sorted(r["ts"] for r in df.select("ts").collect())
        assert got == wall, f"{name}: {got}"
        # watermark assignment — the round-4 failure mode — must analyze
        df.withWatermark("ts", "1 hour").groupBy("ts").count().schema

    # the ingest layer pins the session timezone: a driver session left on
    # a non-UTC zone must be corrected by load_table so the NTZ re-tag
    # (and every epoch/window computation) stays DuckDB-consistent
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sf = tmp_path / "us_ntz"
        df = load_table(spark, str(sf), "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = sorted(r["ts"] for r in df.select("ts").collect())
        assert got == wall
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_catalog_works_on_bare_session(spark, tmp_path):
    """The external driver uses a PLAIN SparkSession without our
    defaults. ``newSession()`` shares the SparkContext but starts a
    fresh SQLConf — the same bare-conf shape — so this pins that
    ``ensure_nanos_conf``/``load_table`` self-configure: the r5
    regression was ``conf.get(key, "")`` VALIDATING the fallback for
    session.timeZone and throwing on exactly (and only) bare sessions.
    """
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

    bare = spark.newSession()
    # newSession() inherits builder-time options, so strip them to get the
    # true bare-conf shape (unset timeZone is what triggered the bug)
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    bare.conf.unset("spark.sql.session.timeZone")

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    micros = [int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)]
    sf = tmp_path / "bare"
    sf.mkdir()
    pq.write_table(
        pa.table({"event_id": pa.array([1], type=pa.int64()),
                  "ts": pa.array(micros, type=pa.timestamp("us"))}),
        str(sf / "events.parquet"),
    )
    df = load_table(bare, str(sf), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert bare.conf.get("spark.sql.session.timeZone") == "UTC"
    assert [r["ts"] for r in df.collect()] == [base]


def test_compact_files_hits_target_and_preserves_data(spark, sf_dir, tmp_path):
    """Small-file compaction: a deliberately fragmented dataset (64
    files for ~100 KB of data) rewrites to the byte-sized partition
    count, every row preserved, and the report reflects the layout."""
    from distributed_computing_platform_mapreduce_spark.sources.compaction import (
        compact_files,
        dataset_bytes,
    )

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.read.parquet(sf_dir + "/lineitem.parquet")
    df.repartition(64).write.parquet(src)
    total, n_files = dataset_bytes(spark, src)
    assert n_files == 64 and total > 0

    report = compact_files(spark, src, dst, target_file_bytes=total // 3 + 1)
    assert report["files_before"] == 64
    assert report["partitions_written"] == 3
    assert report["files_after"] == 3
    # every row survives, byte size stays the same order (codec jitter)
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # degenerate target: everything in one file
    dst1 = str(tmp_path / "one")
    r1 = compact_files(spark, src, dst1, target_file_bytes=1 << 40)
    assert r1["files_after"] == 1
    try:
        compact_files(spark, src, dst, target_file_bytes=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_write_clustered_disjoint_ranges_enable_skipping(spark, sf_dir, tmp_path):
    """Range-clustered layout: files carry disjoint cluster-column
    ranges (verified from parquet footer statistics via pyarrow), so a
    range predicate could skip all but the overlapping files/row
    groups; data round-trips exactly."""
    import glob

    import pyarrow.parquet as pq

    from distributed_computing_platform_mapreduce_spark.sources.partitioned import write_clustered

    df = spark.read.parquet(sf_dir + "/orders.parquet").select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "clustered")
    write_clustered(df, path, ["o_orderkey"], n_files=8)

    ranges = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max  # stats present → skipping possible
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    # disjoint file ranges: sort by min, every max < next min
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0

    try:
        write_clustered(df, path, [])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
