"""Skew-mitigation primitives: salting for hot keys.

Partial (map-side) aggregation already neutralizes skew for algebraic
aggregates (sum/count/min/max — each partition collapses before the
shuffle). The two places skew still bites, and their fixes here:

- ``collect_list``-style holistic aggregation: one Zipf-hot key funnels
  its whole fan-in through a single task. ``salted_collect_sorted``
  two-phases it: (key, salt) partials first (bounded ≤ |key|/n_salts per
  task), then a merge of ≤ n_salts pre-sorted arrays per key.
- Shuffle joins where one side has hot keys: ``salted_join`` salts the
  skewed side and replicates the other side once per salt — the classic
  pre-AQE skew join, still useful when AQE's runtime splitting can't see
  the skew (e.g. skew created mid-stage by an explode). With AQE on,
  prefer letting ``spark.sql.adaptive.skewJoin`` handle storage-visible
  skew; this helper is for the planner-invisible cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
    as_string: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Two-phase sorted collect per key (the rwlg shape, generalized).

    Phase 1 groups by (key, salt=hash(value)%n_salts) into sorted
    partial arrays; phase 2 merges ≤ n_salts arrays per key. Output is
    globally sorted: the final ``array_sort`` runs over one in-memory
    array instead of a single-task row sort. Truly unbounded keys still
    need a cap (``F.slice``) or a sink-side layout — same caveat as any
    group-concat."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(value_col), F.lit(n_salts)))
    partial = salted.groupBy(key_col, "__salt").agg(
        F.array_sort(F.collect_list(value_col)).alias("__part")
    )
    merged = F.array_sort(F.flatten(F.collect_list("__part")))
    out = F.concat_ws(sep, merged) if as_string else merged
    return partial.groupBy(key_col).agg(out.alias(out_col))


def capped_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_values: int,
    out_col: str = "values",
    as_string: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Sorted collect per key CAPPED at the ``max_values`` smallest
    values — the bounded-output layout for the group-concat growth
    regime (SCALE.md policy: past ~10⁶ values/key the uncapped concat
    row itself is the bottleneck, salted or not).

    Plan shape: a ``row_number`` ranking window with ``rank ≤
    max_values`` — Spark recognizes it as WindowGroupLimit, so every
    map partition keeps only its LOCAL top-``max_values`` per key
    before the exchange; the shuffle carries ≤ max_values·partitions
    rows per key no matter how hot the key, and the final per-key array
    is bounded by construction. On keys with ≤ ``max_values`` values
    the output equals :func:`salted_collect_sorted` exactly (the
    same-answer contract pinned in tests); above the cap it is the
    lexicographically-smallest ``max_values`` — a deterministic
    multiset even under value ties."""
    if max_values <= 0:
        raise ValueError(f"max_values must be positive, got {max_values}")
    w = Window.partitionBy(key_col).orderBy(F.col(value_col).asc())
    top = (
        df.select(key_col, value_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_values)
    )
    merged = F.array_sort(F.collect_list(value_col))
    out = F.concat_ws(sep, merged) if as_string else merged
    return top.groupBy(key_col).agg(out.alias(out_col))


def write_values_bucketed(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    n_buckets: int = 256,
) -> None:
    """The SINK-SIDE layout for truly unbounded keys: no per-key concat
    row exists at all. Rows land in ``n_buckets`` hash-of-key parquet
    directories (``__kb=<bucket>/``), sorted by (key, value) WITHIN each
    file, so every key's values are one contiguous sorted run that a
    reader streams — the analogue of the reference writing each key's
    values file to SDFS, minus the per-key file explosion (millions of
    keys → 256 directories, not millions).

    Memory shape: the hot key's rows stream through one write task as
    ROWS (sequential IO), never materializing the 10⁶-element array /
    giant string the concat layouts build — that array is exactly what
    caps ``salted_collect_sorted`` at scale."""
    (
        df.select(
            key_col, value_col, F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).alias("__kb")
        )
        .repartition(n_buckets, "__kb")
        # __kb leads the sort so the writer's required partition-column
        # ordering is already satisfied — otherwise FileFormatWriter
        # inserts its own (non-stable) sort on __kb and destroys the
        # (key, value) run order
        .sortWithinPartitions("__kb", key_col, value_col)
        .write.partitionBy("__kb")
        .mode("overwrite")
        .parquet(path)
    )


def read_values_bucketed(
    spark, path: str, key_col: str, value_col: str, key=None, n_buckets: int = 256
) -> DataFrame:
    """Read a :func:`write_values_bucketed` dataset; with ``key`` given,
    partition pruning reads ONE bucket directory (the bucket id is
    recomputed with a one-row jvm job — xxhash64 has no Python twin),
    not the corpus."""
    df = spark.read.parquet(path)
    if key is not None:
        # CAST the literal to the stored key column's type before
        # hashing: xxhash64 is type-sensitive (xxhash64(int 5) !=
        # xxhash64(bigint 5)), so an untyped literal of a different
        # width would compute the WRONG bucket and silently return an
        # empty read for a key that exists on disk
        key_dtype = dict(df.select(key_col).dtypes)[key_col]
        lit = F.lit(key).cast(key_dtype)
        b = (
            spark.range(1)
            .select(F.pmod(F.xxhash64(lit), F.lit(n_buckets)).alias("b"))
            .collect()[0]["b"]
        )
        df = df.filter((F.col("__kb") == b) & (F.col(key_col) == key))
    return df.select(key_col, value_col, "__kb")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``: salt the
    skewed side (splitting each hot key into n_salts shuffle keys) and
    explode ``other`` once per salt so every fragment finds its match.
    Shuffle volume of ``other`` grows ×n_salts — use when ``other`` is
    much smaller than the hot key's row count but too big to broadcast.

    Supported ``how``: inner / left / left_semi / left_anti — join types
    where unmatched ``other`` rows are never emitted. Right/full joins
    would emit each unmatched ``other`` row once per salt (it was
    replicated n_salts times); rejected rather than silently duplicated.
    """
    normalized = how.replace("_", "").replace("outer", "")
    if normalized not in ("inner", "left", "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins; got how={how!r} "
            "(right/full would duplicate unmatched rows of `other` once per salt)"
        )
    s = skewed.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return s.join(o, [on, "__salt"], how).drop("__salt")
