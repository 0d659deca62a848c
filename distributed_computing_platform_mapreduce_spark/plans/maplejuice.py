"""MapleJuice parity queries — the reference's demonstrated query corpus.

These reproduce the semantics of the four application scripts plus the
engine-level dataflow behaviors (SURVEY.md §2.1/§2.3/§2.5):

- word count  = tokenize (``applications/wc-maple.py:6-7``) + per-key sum
  (``applications/wc-juice.py:6-14``) + global key sort
  (``src/MapReduceMaster.java:450-451``)
- reverse web-link graph = edge inversion (``applications/rwlg-maple.py:6-7``)
  + collect-values-per-key (``applications/rwlg-juice.py:5-14``); we sort
  the collected array for determinism (collect_list order is not)
- group-sum over a generic (key,value) stream (the wc-juice contract)
- last-write-wins key dedup (``src/MapReduceMaster.java:371-374``)

All expressed declaratively: tokenize is ``explode(split(...))`` (stays in
whole-stage codegen), the group-by shuffles once with map-side partial
aggregation — the reference's combiner (``applications/WordCount.java:73``)
for free. At 100 TB the word keys are low-cardinality/skewed; partial agg
collapses each partition to ~vocab-size rows before the shuffle, so skew
never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A1: whitespace-split each document into one row per token."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )


@query(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+E10: the reference's flagship word-count pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return tokenize(docs).groupBy("word").agg(F.count("*").alias("cnt")).orderBy("word")


#: Default cap for the rwlg collect (r8, SCALE.md policy made code): the
#: group-concat OUTPUT ROW is the scale bottleneck past ~10⁶ values/key,
#: salted or not, so the default path bounds it. 1000 is chosen twice
#: over: it is 10× the widest key in any sf dir (measured max fan-in 99
#: at sf0.001/0.01/0.1 — every oracle-checked answer stays exact,
#: headroom asserted in pytest), AND it is Spark's default
#: ``spark.sql.optimizer.windowGroupLimitThreshold`` — the largest cap
#: for which a default-config session (the driver's plain
#: SparkSession included) still plans the WindowGroupLimit map-side
#: pre-truncation; one more and the rank filter runs post-shuffle,
#: silently giving up the bounded-fan-in property. The cap binds only
#: in the replica-scale regime (bench's 1 GB corpus, ~8·10⁵
#: values/key) where truncation is the documented policy. ``None``
#: selects the exact uncapped collect (the reference's semantics —
#: bench's baseline-comparison points use it so the BASELINE.md ratio
#: compares equal work).
RWLG_MAX_SOURCES = 1000


def rwlg_collect(
    edges: DataFrame,
    max_values: int | None = RWLG_MAX_SOURCES,
    n_salts: int = 16,
    layout: str = "auto",
    shape: dict | None = None,
) -> DataFrame:
    """The rwlg collect over ``(dst, src)`` edges — OUTPUT is fixed by
    ``max_values`` (every source when ``None``, the smallest
    ``max_values`` per key otherwise); ``layout`` picks the PLAN:

    - ``'auto'`` (default, r14): one sampled pass estimates the hot
      key's fan-in (``skew.estimate_collect_shape``), then
      ``skew.choose_collect_layout`` applies the measured regime
      boundaries — ``'window'`` only when values-per-key-per-partition
      actually exceed the cap (the ONLY shape where WindowGroupLimit's
      map-side prune does work; on uniform corpora the same plan
      degenerates to a full partition sort — the r13 4 GB straggler,
      SCALE.md), ``'salted'`` only for genuinely hot uncapped keys,
      ``'grouped'`` (single shuffle, no window, no salt) otherwise.
      An uncapped corpus whose hot key exceeds the salted merge's
      measured termination boundary raises here, pre-shuffle, pointing
      at ``write_values_bucketed`` — no concat layout terminates there.
      Pass ``shape`` (an ``estimate_collect_shape`` dict) to skip the
      sampling job when the caller already knows the corpus.
    - ``'window'`` / ``'grouped'`` / ``'salted'`` force that layout
      (``'window'`` requires a cap; ``'salted'`` is the uncapped
      two-phase merge, guarded by its own ``SALTED_MERGE_LIMIT``).

    Every layout yields identical rows for the same ``max_values``
    (pinned in ``test_rwlg_collect_layouts_agree``). Thin wrapper over
    the general operator ``skew.adaptive_collect_sorted`` — any
    (key, value) collect gets the same policy, not just rwlg."""
    from distributed_computing_platform_mapreduce_spark.operators import skew

    return skew.adaptive_collect_sorted(
        edges,
        "dst",
        "src",
        max_values=max_values,
        n_salts=n_salts,
        out_col="sources",
        layout=layout,
        shape=shape,
    )


@query(
    "rwlg",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS dst,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR)) AS sources
    FROM events
    GROUP BY user_id
    """,
)
def rwlg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4: reverse web-link graph over the events edge projection.

    ``events(user_id, event_id)`` has the same shape as the reference's
    ``src,dst`` edge corpus (FIXTURES.md F2): ~skewed fan-in per key.
    Deterministic variant of ``rwlg-juice.py``: sources sorted then
    joined. Runs the DEFAULT collect policy (capped at
    ``RWLG_MAX_SOURCES``, layout chosen from the estimated corpus
    shape — exact at every sf dir, bounded at scale, and since r14 the
    plan no longer degenerates on uniform fan-in)."""
    events = load_table(spark, sf_dir, "events")
    edges = events.select(
        F.col("user_id").cast("string").alias("dst"),
        F.col("event_id").cast("string").alias("src"),
    )
    return rwlg_collect(edges).orderBy("dst")


@query(
    "mj_group_sum",
    oracle="""
    SELECT event_type AS key,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def mj_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 generalized: sum-per-key over a (key,value) pair stream (F3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("key"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"))
        .orderBy("key")
    )


@query(
    "mj_last_write_wins",
    oracle="""
    SELECT user_id, event_type, value AS last_value
    FROM (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def mj_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: one value per key, last write wins.

    The reference resolves duplicate keys by silently keeping whichever
    juice output arrived last (``src/MapReduceMaster.java:371-374``) — a
    race. We define "last" deterministically as max(ts, event_id) and
    implement it as a ranking window, which shuffles once on the key.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("value").alias("last_value"))
    )


@query(
    "mj_compat_suite",
    oracle="""
    SELECT 'wc' AS leg, word AS key, CAST(count(*) AS VARCHAR) AS value
    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    UNION ALL
    SELECT 'rwlg' AS leg, CAST(user_id AS VARCHAR) AS key,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY CAST(event_id AS VARCHAR)) AS value
    FROM events
    GROUP BY user_id
    """,
)
def mj_compat_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E7/E8 THROUGH the MapleJuice compat layer — the reference's
    actual user contract run as ``maple()`` (mapInPandas flatMap) then
    ``juice()`` (applyInPandas per-key reduce), as two tagged legs under
    one registry row (folded in r7 to free a slot at the 50 cap):

    - ``leg='wc'``: word count (``applications/wc-maple.py:6-7`` +
      ``applications/wc-juice.py:6-14``); also covers the count-variant
      semantics of ``WordCountJuice.java:5`` (count == sum of 1s).
    - ``leg='rwlg'``: reverse web-link graph
      (``applications/rwlg-maple.py:6-7`` + ``applications/rwlg-juice.py``,
      intended sorted semantics — SURVEY.md §2.5 item 6) over the
      reference's ``src,dst`` CSV lines.

    Output stays the engine's string (key, value) pairs per leg,
    oracle-checked against the declarative ``wordcount``/``rwlg``."""
    from distributed_computing_platform_mapreduce_spark.compat.maplejuice import (
        juice,
        maple,
        rwlg_juice,
        rwlg_maple,
        wc_juice,
        wc_maple,
    )

    docs = load_table(spark, sf_dir, "documents")
    kv_wc = maple(spark, wc_maple, docs.select(F.col("text").alias("value")))
    wc = juice(kv_wc, wc_juice, dedup=None, sort=True).select(
        F.lit("wc").alias("leg"), "key", "value"
    )

    events = load_table(spark, sf_dir, "events")
    lines = events.select(
        F.concat_ws(",", F.col("event_id").cast("string"), F.col("user_id").cast("string")).alias(
            "value"
        )
    )
    kv_rw = maple(spark, rwlg_maple, lines)
    rw = juice(kv_rw, rwlg_juice, dedup=None, sort=True).select(
        F.lit("rwlg").alias("leg"), "key", "value"
    )
    return wc.unionAll(rw)
