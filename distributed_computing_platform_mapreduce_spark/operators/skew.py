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

Which collect layout wins is a property of the CORPUS SHAPE, not the
query (r13 measured both failure directions: the window/capped plan
degenerates on uniform fan-in, the salted merge dies past ~16M
values/key). ``estimate_collect_shape`` + ``choose_collect_layout``
turn those measured boundaries into a decision procedure;
``grouped_collect_sorted`` is the single-shuffle layout the uniform
regime wants.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Past ~10⁶ values/key the single-task collect / concat row is the
#: bottleneck (SCALE.md group-concat regime table; the 1 GB skew drill
#: measured naive 39.1 s vs salted 19.3 s at a 10M-value hot key) — at
#: or above this fan-in the salted two-phase layout is worth its second
#: shuffle; below it a plain single-shuffle collect wins.
SALTED_HOT_THRESHOLD = 1_000_000

#: The salted merge's measured termination boundary (r13, SCALE.md):
#: phase 2 funnels a hot key's whole fan-in into ONE merge task — a
#: 10M-value key survives (1 GB drill, 16–19 s), a 40M-value key dies
#: (≈0.9 GB in a single concat cell, executor OOM three stages in).
#: 16M sits between the measured sides, conservative toward the
#: survivor. Past it NO concat layout terminates: cap the output
#: (``capped_collect_sorted``) or drop the concat row entirely
#: (``write_values_bucketed``).
SALTED_MERGE_LIMIT = 16_000_000

#: Raw value bytes one reduce task of a grouped collect should own.
#: Collect buffers are UNMANAGED Java objects (ObjectHashAggregate's
#: whole reason for a 128-key fallback threshold), so they neither
#: spill nor count against Spark's memory manager — the r14 4 GB
#: measurement: 480M 16-char values over 32 reduce tasks ≈ 250 MB raw
#: → ~1 GB of Java strings per task × 32 concurrent = heap death at
#: the engine's 8 g local JVM. Budget A/B on the 1 GB replica corpus
#: (12-char values — object overhead is ~5× on short strings, worst
#: case): 32 MB/task (36 parts) DIED in GC-locker thrash, 16 MB
#: (72 parts) 29.9 s, 8 MB (144 parts) 23.7 s — 8 MB is both the
#: safest and the fastest measured point (narrower tasks overlap GC),
#: and small corpora never widen at all (the rule returns None when
#: the session width suffices).
GROUPED_TASK_VALUE_BYTES = 8 * 1024 * 1024
#: Java object/UnsafeRow overhead multiplier on raw string bytes
#: (measured ~5× on 12-char strings — headers dominate short payloads).
COLLECT_BYTES_OVERHEAD = 5
#: Fraction of one task's heap share the collect buffer's LIVE bytes
#: may own (budget = fraction × share ÷ overhead, so live = budget ×
#: overhead = fraction × share). The r14 A/B at 16 g / 32 cores
#: (0.5 GB/task share) measured the boundary directly: live 31% of the
#: share (32 MB budget) died in GC-locker thrash, 15.6% (16 MB) was
#: GC-bound-slow, 7.8% (8 MB) was safest AND fastest. 0.05 sits under
#: the measured-good point with margin, keeps the 8 MB floor binding at
#: both measured local configs (8 g/32 and 16 g/32 — the 4 GB bench
#: point's plan is unchanged), and widens the budget ~10× at a
#: cluster-normal 8 GB/core executor instead of hardcoding a local-JVM
#: constant into a general operator (r14 VERDICT #3).
GROUPED_TASK_HEAP_FRACTION = 0.05
#: Ceiling on the widened exchange: past ~32k reduce partitions the
#: shuffle's per-partition file/connection overhead dominates any
#: buffer-safety gain (est_value_bytes / budget at true 100 TB shapes
#: would otherwise ask for millions of partitions).
GROUPED_MAX_SHUFFLE_PARTITIONS = 32_768

_MEM_UNITS = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_mem_bytes(s) -> int | None:
    """Parse a Spark memory conf string ('8g', '512m', '16384') to
    bytes. Bare numbers are MiB — Spark's convention for memory confs
    (``spark.executor.memory`` etc.). None/unparseable → None."""
    if s is None:
        return None
    s = str(s).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    if not s:
        return None
    if s[-1] in _MEM_UNITS:
        try:
            return int(float(s[:-1]) * _MEM_UNITS[s[-1]])
        except ValueError:
            return None
    try:
        return int(float(s) * 1024**2)
    except ValueError:
        return None


def _mem_per_task_bytes(spark) -> int | None:
    """Heap bytes one concurrently-running task can claim: executor
    memory / executor cores on a cluster, driver memory / local[N]
    threads in local mode. None when the confs aren't readable — the
    caller falls back to the measured local floor."""
    try:
        master = spark.conf.get("spark.master", "") or ""
    except Exception:  # noqa: BLE001 — conf unreadable mid-teardown
        return None
    try:
        # plain local mode ONLY — 'local-cluster[n,cores,mem]' runs real
        # executors and must take the executor-conf path below, not read
        # the driver heap (r15 review)
        if master == "local" or master.startswith("local["):
            mem = _parse_mem_bytes(spark.conf.get("spark.driver.memory", None))
            if "[" not in master:
                # bare 'local' runs ONE task thread owning the whole
                # heap — dividing by cpu_count here underestimated
                # heap-per-task ~cpu_count× (r15 review)
                cores = 1
            else:
                inside = master[master.find("[") + 1 : master.find("]")]
                if inside in ("*", ""):
                    import os

                    cores = os.cpu_count() or 1
                else:
                    cores = max(1, int(inside.split(",")[0]))
        else:
            mem = _parse_mem_bytes(spark.conf.get("spark.executor.memory", None))
            # spark.executor.cores has NO portable default: YARN/k8s use 1,
            # but standalone gives an executor ALL worker cores — dividing
            # by an assumed 1 there would OVERestimate heap-per-task by the
            # core count and re-introduce the exact unmanaged-buffer death
            # this formula prevents (r15 review). Errors must point DOWN
            # (a too-small budget only over-partitions, clamped at 32k),
            # so without an EXPLICIT cores conf, report unknown and let
            # the caller fall back to the safe floor.
            cores_conf = spark.conf.get("spark.executor.cores", None)
            if cores_conf is None or str(cores_conf).strip() == "":
                return None
            cores = max(1, int(cores_conf))
    except Exception:  # noqa: BLE001 — exotic master strings / conf values
        return None
    if not mem:
        return None
    return mem // cores


def grouped_task_value_bytes(
    spark=None,
    mem_per_task_bytes: int | None = None,
    fraction: float = GROUPED_TASK_HEAP_FRACTION,
    floor_bytes: int = GROUPED_TASK_VALUE_BYTES,
) -> int:
    """Raw value bytes one grouped-collect reduce task may own, derived
    from the execution environment (r15, VERDICT r14 #3):

        max(floor, fraction × heap-per-task ÷ COLLECT_BYTES_OVERHEAD)

    The 8 MB floor is the measured local-mode operating point (r14 A/B
    at 16 g/32 cores: 32 MB died in GC-locker thrash, 8 MB was fastest);
    the formula is what generalizes it — at the engine's local 8 g/32
    and the 4 GB worker's 16 g/32 the floor binds (measured plans
    unchanged), at a cluster-normal 8 GB/core executor it widens to
    ~82 MB/task, so the operator no longer asks a 1000-executor cluster
    for millions of reduce partitions (with
    :func:`grouped_shuffle_partitions`'s 32k clamp as the backstop)."""
    if mem_per_task_bytes is None and spark is not None:
        mem_per_task_bytes = _mem_per_task_bytes(spark)
    if not mem_per_task_bytes:
        return floor_bytes
    return max(floor_bytes, int(fraction * mem_per_task_bytes / COLLECT_BYTES_OVERHEAD))


#: Session-local shape-estimate cache keyed by the input plan's
#: semanticHash (the ``dedup._shingle_cache`` pattern — r14 VERDICT
#: stretch #7) PLUS a hash of the plan's resolved input-file list
#: (r15 review): repeated adaptive collects over the same corpus
#: (bench re-runs, iterative pipelines) pay the sampling job once,
#: while appending/compacting/overwriting a file-backed table changes
#: the file list and forces a fresh probe — the estimate also feeds
#: the SALTED_MERGE_LIMIT safety raise, so a stale smaller estimate
#: must not let a grown corpus sail past the measured OOM boundary.
#: The one remaining stale window is an in-place rewrite that keeps
#: every file NAME identical (parquet writers emit fresh
#: ``part-<uuid>`` names, so this takes deliberate effort) — call
#: :func:`clear_shape_cache` after such rewrites.
_SHAPE_CACHE: "OrderedDict[tuple, dict]" = OrderedDict()
_SHAPE_CACHE_MAX = 64


def clear_shape_cache() -> None:
    """Drop every cached shape estimate (after in-place input rewrites)."""
    _SHAPE_CACHE.clear()


def _shape_cache_key(
    df: DataFrame,
    key_col: str,
    value_col: str | None,
    sample_fraction: float,
    seed: int,
):
    """(semanticHash of the analyzed plan, hash of the resolved input
    files, cols, fraction, seed) — None when the JVM handle isn't
    reachable (then the caller just recomputes). Seed is part of the
    key: re-sampling with a new seed to cross-check an estimate must
    draw a fresh sample (r15 review). The file-list hash is part of the
    key because for file sources semanticHash covers the root PATH, not
    the data under it — without it an append/compact would keep serving
    the old (smaller) estimate to the termination-safety guards."""
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 — exotic/py4j-less DataFrames
        return None
    try:
        # plan-only (reads the already-materialized FileIndex, no job);
        # [] for non-file sources — then semanticHash alone is the key
        files_h = hash(tuple(sorted(df.inputFiles())))
    except Exception:  # noqa: BLE001 — exotic sources without a file index
        files_h = None
    return (h, files_h, key_col, value_col, sample_fraction, seed)


def estimate_collect_shape(
    df: DataFrame,
    key_col: str,
    value_col: str | None = None,
    sample_fraction: float = 0.01,
    seed: int = 41,
    use_cache: bool = True,
) -> dict:
    """One cheap sampled pass estimating the group-fan-in shape that
    decides which collect layout terminates (and which wins):
    ``{"est_max_fanin": int, "n_partitions": int, "sample_fraction": f,
    "est_rows": int, "est_value_bytes": int | None}``.

    ``est_max_fanin`` = (max per-key count in a ``sample_fraction``
    Bernoulli sample) / fraction. The estimator is deliberately biased
    HIGH on uniform corpora (the max over many Poisson draws sits in
    the tail — e.g. true fan-in 800 at 1% sampling reads ≈2–3×), which
    errs toward the skew-safe layouts; on genuinely hot keys the
    sampled count is large and the estimate is tight. Column pruning
    makes the pass read only the named columns. ``n_partitions`` is the
    scan partition count — the denominator in the WindowGroupLimit
    map-side prune test (values-per-key-PER-PARTITION vs the cap).
    With ``value_col`` given, ``est_value_bytes`` extrapolates the
    total value payload — the input to
    :func:`grouped_shuffle_partitions`, which sizes the collect
    stage's shuffle width so no reduce task's unmanaged buffer
    outgrows the heap (the r14 4 GB OOM)."""
    if not 0 < sample_fraction <= 1:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    cache_key = (
        _shape_cache_key(df, key_col, value_col, sample_fraction, seed)
        if use_cache
        else None
    )
    if cache_key is not None and cache_key in _SHAPE_CACHE:
        _SHAPE_CACHE.move_to_end(cache_key)
        return _SHAPE_CACHE[cache_key]
    cols = [key_col] + ([value_col] if value_col else [])
    keyed = df.select(*cols)
    sampled = keyed if sample_fraction == 1 else keyed.sample(False, sample_fraction, seed)
    per_key = [F.count("*").alias("n")]
    if value_col:
        per_key.append(
            F.sum(F.length(F.col(value_col).cast("string"))).alias("vb")
        )
    top = [F.max("n").alias("mx"), F.sum("n").alias("rows")]
    if value_col:
        top.append(F.sum("vb").alias("vbytes"))
    row = sampled.groupBy(key_col).agg(*per_key).agg(*top).collect()[0]
    est = int((row["mx"] or 0) / sample_fraction)
    try:
        # NOTE (r14 VERDICT minor): df.rdd wraps the analyzed plan in an
        # RDD conversion — plan-only, no job runs, and since r15 the
        # whole estimate is cached per plan, so the conversion happens
        # once per (plan, cols, fraction) per session. Documented rather
        # than replaced: the py4j-free alternatives all reach into
        # private JVM handles this helper otherwise avoids.
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — exotic plans; scheduling default is close enough
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    shape = {
        "est_max_fanin": est,
        "n_partitions": max(1, int(n_parts)),
        "sample_fraction": sample_fraction,
        "est_rows": int((row["rows"] or 0) / sample_fraction),
        "est_value_bytes": (
            int((row["vbytes"] or 0) / sample_fraction) if value_col else None
        ),
    }
    if cache_key is not None:
        _SHAPE_CACHE[cache_key] = shape
        while len(_SHAPE_CACHE) > _SHAPE_CACHE_MAX:
            _SHAPE_CACHE.popitem(last=False)
    return shape


def grouped_shuffle_partitions(
    est_value_bytes: int | None,
    session_shuffle_partitions: int,
    task_value_bytes: int = GROUPED_TASK_VALUE_BYTES,
    max_partitions: int = GROUPED_MAX_SHUFFLE_PARTITIONS,
) -> int | None:
    """Width the grouped collect's shuffle so each reduce task owns at
    most ``task_value_bytes`` of raw value payload (see
    ``GROUPED_TASK_VALUE_BYTES`` for why the session default is not
    enough: collect buffers are unmanaged heap that never spills;
    derive ``task_value_bytes`` with :func:`grouped_task_value_bytes`
    so cluster executors use their real heap share, not the local
    floor). Returns ``None`` when the session's own shuffle width
    already suffices — widening below it would only add scheduling
    overhead. Clamped at ``max_partitions``: past ~32k the shuffle's
    per-partition overhead dominates, and a corpus that still exceeds
    the budget there needs bigger executors or the bucketed sink, not
    a wider exchange."""
    if not est_value_bytes:
        return None
    needed = -(-est_value_bytes // task_value_bytes)  # ceil
    needed = min(needed, max_partitions)
    return needed if needed > session_shuffle_partitions else None


def _session_shuffle_partitions(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int, guarded: platforms
    may set the conf to a non-numeric value (e.g. ``'auto'`` under
    vendor AQE forks — ADVICE r14), and a bare ``int()`` there would
    crash every adaptive collect. Falls back to the scheduler's default
    parallelism, then 200 (Spark's own default)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except Exception:  # noqa: BLE001 — non-numeric conf OR the conf.get
        pass  # itself failing (py4j error mid-teardown — r15 review)
    try:
        return int(spark.sparkContext.defaultParallelism)
    except Exception:  # noqa: BLE001 — context unreachable mid-teardown
        return 200


def choose_collect_layout(
    est_max_fanin: int,
    n_partitions: int,
    max_values: int | None = None,
    hot_threshold: int = SALTED_HOT_THRESHOLD,
    merge_limit: int = SALTED_MERGE_LIMIT,
) -> str:
    """Pick the group-concat layout from the corpus shape — the
    executable form of the regime boundaries SCALE.md measured (r13:
    the capped/window layout blew a 15-minute straggler budget on a
    uniform 4 GB corpus whose per-partition fan-in sat far UNDER the
    cap, while terminating linearly on the hot-key corpus the cap
    exists for).

    Capped (``max_values`` set — output is the smallest-k per key
    either way; only the PLAN differs):

    - ``'window'`` when the hot key's values-per-partition exceed the
      cap — WindowGroupLimit prunes each map partition to its local
      top-k BEFORE the exchange, bounding shuffle fan-in at
      k·partitions however hot the key — OR when the hot key's fan-in
      exceeds ``hot_threshold`` in absolute terms (r15, ADVICE r14):
      the grouped layout materializes a key's FULL fan-in in one
      unmanaged collect buffer before the slice, and exchange widening
      cannot split a single key, so a 5M-value hot key over enough
      scan partitions would otherwise slip the per-partition test and
      hit the measured unmanaged-buffer heap death; the window plan
      bounds the buffer at the cap regardless of fan-in.
    - ``'grouped'`` otherwise — the window prunes nothing at this
      shape (every partition already holds ≤ k values of every key),
      so the single-shuffle groupBy + slice skips the degenerate
      full-partition sort the window plan pays.

    Uncapped (``max_values=None`` — exact, every value kept):

    - ``'bucketed'`` past ``merge_limit``: NO concat layout terminates
      (measured: salted dies at a 40M-value key); the caller must use
      the sink-side :func:`write_values_bucketed` or accept a cap.
    - ``'salted'`` past ``hot_threshold``: two-phase merge splits the
      hot key across salts (drill-measured 2× win at 10M values/key).
    - ``'grouped'`` otherwise: one shuffle, no second phase."""
    if max_values is not None:
        if max_values <= 0:
            raise ValueError(f"max_values must be positive, got {max_values}")
        if (
            est_max_fanin > max_values * max(1, n_partitions)
            or est_max_fanin > hot_threshold
        ):
            return "window"
        return "grouped"
    if est_max_fanin > merge_limit:
        return "bucketed"
    if est_max_fanin > hot_threshold:
        return "salted"
    return "grouped"


def grouped_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_values: int | None = None,
    out_col: str = "values",
    as_string: bool = True,
    sep: str = ",",
    num_partitions: int | None = None,
) -> DataFrame:
    """Single-shuffle sorted collect per key — the UNIFORM-shape layout:
    one hash exchange on the key, per-key ``array_sort`` (each array is
    the key's whole fan-in, fine when fan-in is moderate), optional
    ``slice`` to the smallest ``max_values`` (identical output contract
    to :func:`capped_collect_sorted`). No window, no salt phase: on
    corpora where values-per-key-per-partition never exceeds the cap,
    the window plan's map-side prune is a no-op and its full partition
    sort is pure overhead (the measured 4 GB degeneration, SCALE.md).

    ``num_partitions`` widens the key exchange beyond the session
    shuffle width (use :func:`grouped_shuffle_partitions` to size it):
    collect buffers are UNMANAGED Java heap — at large volumes the
    session default concentrates gigabytes of live strings per task
    (the r14 4 GB heap death), and the fix is narrower tasks, not more
    memory. The explicit ``repartition(n, key)`` satisfies the
    aggregation's distribution requirement, so no second exchange is
    planned."""
    if num_partitions is not None:
        df = df.repartition(num_partitions, key_col)
    merged = F.array_sort(F.collect_list(value_col))
    if max_values is not None:
        if max_values <= 0:
            raise ValueError(f"max_values must be positive, got {max_values}")
        merged = F.slice(merged, 1, max_values)
    out = F.concat_ws(sep, merged) if as_string else merged
    return df.groupBy(key_col).agg(out.alias(out_col))


def salted_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    out_col: str = "values",
    as_string: bool = True,
    sep: str = ",",
    max_merge_values: int | None = SALTED_MERGE_LIMIT,
    known_max_fanin: int | None = None,
    fanin_probe: bool = False,
    probe_fraction: float = 0.01,
) -> DataFrame:
    """Two-phase sorted collect per key (the rwlg shape, generalized).

    Phase 1 groups by (key, salt=hash(value)%n_salts) into sorted
    partial arrays; phase 2 merges ≤ n_salts arrays per key. Output is
    globally sorted: the final ``array_sort`` runs over one in-memory
    array instead of a single-task row sort.

    Termination guard (r13): phase 2 still funnels each key's WHOLE
    fan-in through one merge task, and the boundary is measured —
    10M values/key survives, 40M dies (executor OOM in the merge's
    concat cell, SCALE.md). ``max_merge_values`` (default
    ``SALTED_MERGE_LIMIT``) is enforced against ``known_max_fanin``
    when the caller supplies it (zero cost — pass it when the corpus
    shape is known), or against a sampled estimate when
    ``fanin_probe=True`` (one cheap extra pass). With neither, the
    guard cannot see the fan-in and the call proceeds unguarded, same
    as every round before r14 — prefer one of the two. Past the limit
    the raise is immediate and actionable instead of an OOM three
    stages in: use :func:`capped_collect_sorted` (bounded output) or
    :func:`write_values_bucketed` (no concat row at all)."""
    if max_merge_values is not None:
        fanin = known_max_fanin
        if fanin is None and fanin_probe:
            fanin = estimate_collect_shape(df, key_col, sample_fraction=probe_fraction)[
                "est_max_fanin"
            ]
        if fanin is not None and fanin > max_merge_values:
            raise ValueError(
                f"hot key ≈{fanin:,} values exceeds the salted merge limit "
                f"({max_merge_values:,}; measured boundary: a 10M-value key "
                "survives the single-task phase-2 merge, a 40M-value key "
                "OOMs it — SCALE.md r13). Use capped_collect_sorted (keeps "
                "the smallest max_values per key) or write_values_bucketed "
                "(sink-side layout, no concat row), or raise "
                "max_merge_values if your executors are provisioned for it."
            )
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


def adaptive_collect_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    max_values: int | None = None,
    n_salts: int = 16,
    out_col: str = "values",
    as_string: bool = True,
    sep: str = ",",
    layout: str = "auto",
    shape: dict | None = None,
) -> DataFrame:
    """Sorted collect per key with the PLAN chosen from the corpus
    shape — OUTPUT is fixed by ``max_values`` (every value when
    ``None``, the smallest ``max_values`` per key otherwise);
    ``layout`` picks how it is computed:

    - ``'auto'`` (default): one sampled pass
      (:func:`estimate_collect_shape`) feeds
      :func:`choose_collect_layout`'s measured regime boundaries —
      ``'window'`` only when values-per-key-per-partition exceed the
      cap (the sole shape where WindowGroupLimit's map-side prune does
      work; on uniform corpora that plan degenerates to a full
      partition sort — the r13 4 GB straggler), ``'salted'`` only for
      genuinely hot uncapped keys, ``'grouped'`` (single shuffle, no
      window, no salt, exchange widened by
      :func:`grouped_shuffle_partitions` so collect buffers stay flat
      per task) otherwise. An uncapped corpus whose hot key exceeds
      the salted merge's measured termination boundary raises HERE,
      pre-shuffle, pointing at :func:`write_values_bucketed` — no
      concat layout terminates there. Pass ``shape`` to skip the
      sampling job when the caller already knows the corpus.
    - ``'window'`` / ``'grouped'`` / ``'salted'`` force that layout
      (``'window'`` requires a cap; ``'salted'`` is uncapped-only).
      Forced ``'grouped'`` still runs the heap-safety exchange sizing
      (probing the shape if the caller didn't pass one — r15): forcing
      the LAYOUT must not silently force the measured heap death too.

    Shape probes are cached per analyzed-plan semanticHash (r15):
    repeated collects over the same corpus pay the sampling job once
    per session. Every layout yields identical rows for the same
    ``max_values``."""
    if layout == "auto":
        if shape is None:
            shape = estimate_collect_shape(df, key_col, value_col=value_col)
        layout = choose_collect_layout(
            shape["est_max_fanin"], shape["n_partitions"], max_values
        )
        if layout == "bucketed":
            raise ValueError(
                f"estimated hot-key fan-in ≈{shape['est_max_fanin']:,} exceeds "
                f"the salted merge limit ({SALTED_MERGE_LIMIT:,}): no "
                "group-concat layout terminates at this shape (measured, "
                "SCALE.md r13). Use skew.write_values_bucketed (sink-side "
                "layout, no concat row) or set max_values to cap the output."
            )
    grouped_parts = None
    if layout == "grouped":
        # Heap-safety sizing runs for FORCED grouped too (r15, ADVICE
        # r14: a forced grouped call at the 4 GB shape used to bypass
        # the widening and reproduce the measured session-default-width
        # heap death): without a caller-supplied shape, pay the sampled
        # probe — cached per plan, and cheap next to an unmanaged-buffer
        # OOM three stages in.
        if shape is None:
            shape = estimate_collect_shape(df, key_col, value_col=value_col)
        grouped_parts = grouped_shuffle_partitions(
            shape.get("est_value_bytes"),
            _session_shuffle_partitions(df.sparkSession),
            task_value_bytes=grouped_task_value_bytes(df.sparkSession),
        )
    if layout == "window":
        if max_values is None:
            raise ValueError("layout='window' requires max_values")
        return capped_collect_sorted(
            df, key_col, value_col, max_values=max_values,
            out_col=out_col, as_string=as_string, sep=sep,
        )
    if layout == "grouped":
        return grouped_collect_sorted(
            df, key_col, value_col, max_values=max_values,
            out_col=out_col, as_string=as_string, sep=sep,
            num_partitions=grouped_parts,
        )
    if layout == "salted":
        if max_values is not None:
            raise ValueError("layout='salted' is the uncapped layout; max_values=None")
        return salted_collect_sorted(
            df, key_col, value_col, n_salts=n_salts,
            out_col=out_col, as_string=as_string, sep=sep,
            known_max_fanin=shape["est_max_fanin"] if shape else None,
        )
    raise ValueError(f"layout must be auto|window|grouped|salted, got {layout!r}")


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
