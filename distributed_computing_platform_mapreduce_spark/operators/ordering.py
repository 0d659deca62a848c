"""Deterministic training-order shuffle: reproducible corpus ordering
without a global sort.

Trainers need the corpus in a shuffled-but-REPRODUCIBLE order: the same
(corpus, seed) must yield the same order on any cluster, any partition
layout, any rerun — else a resumed run drifts from its data schedule and
an ablation is uncomparable. Spark's ``orderBy(rand())`` fails both ways
(nondeterministic AND a global sort), and a global sort of 100 TB is the
single most expensive shuffle shape there is.

The design here derives everything from the GF(2³¹−1) affine hash the
sampling family already uses (``sampling._priority`` — portable integer
arithmetic any SQL engine replays, layout-independent by construction):

- **shard** = a second, independent seed draw mod ``n_shards`` — which
  bucket of the training order a doc lands in;
- **sort key** = the first draw (ties broken by id) — the order WITHIN
  the shard.

Global training order = shard-major, key-minor. At scale the order is
made physical by :func:`write_training_shards`: ONE hash exchange into
``n_shards`` partitions + a LOCAL sort per shard
(``repartition(shard) → sortWithinPartitions``) — no global range
exchange, no single-partition window, no skew (the hash spreads
uniformly whatever the id distribution). Readers stream shard files in
index order and get the full order for free; a resume seeks to
(shard, offset).

:func:`shuffle_rank` MATERIALIZES the within-shard rank as a column —
a per-shard window, so one shard's rows pass through one task's sort.
That is the right tool for oracles, tests, and bounded shards (it backs
the driver-checked ``shard`` leg of ``sample_stratified``), while the
write path above is the 100 TB shape; the two agree by construction and
the agreement is pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_computing_platform_mapreduce_spark.operators.sampling import _priority


def shuffle_keys(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add the two deterministic ordering columns — ``shard`` (int) and
    ``sort_key`` (long) — as pure per-row arithmetic: NO shuffle, prunes
    nothing, composes with any downstream write or window. Independent
    draws: shard uses seed+1 so a doc's position within its shard is
    uncorrelated with which shard it landed in."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        "shard", F.pmod(_priority(id_col, seed + 1), F.lit(n_shards)).cast("int")
    ).withColumn("sort_key", _priority(id_col, seed))


def shuffle_rank(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """``(*, shard, rank)``: the explicit within-shard position, ranked
    by (sort_key, id). One shuffle keyed by shard; each shard sorts in
    one task — use for oracles/tests/bounded shards, and
    :func:`write_training_shards` for the corpus-scale path (same
    order, file-physical)."""
    keyed = shuffle_keys(df, id_col, n_shards, seed)
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return keyed.withColumn("rank", F.row_number().over(w) - 1).drop("sort_key")


def write_training_shards(
    df: DataFrame, id_col: str, path: str, n_shards: int, seed: int = 0
) -> None:
    """Materialize the training order: one parquet directory partitioned
    by ``shard=``, each shard's file(s) internally sorted by
    (sort_key, id). ``repartition(n_shards, shard)`` is a plain hash
    exchange and ``sortWithinPartitions`` a local sort — the global-sort
    shuffle never happens. The local sort leads with ``shard`` ON
    PURPOSE: Spark's partitioned writer requires its input sorted by the
    partition columns and would otherwise insert its own NON-STABLE sort
    on ``shard`` alone, scrambling the training order inside each file
    (caught by the file-order test); with the child ordering already
    prefixed by ``shard`` the writer inserts nothing and the
    (sort_key, id) run survives into the files. The ``sort_key`` column
    is kept: a reader can VERIFY order (or merge shards) without
    recomputing the hash."""
    keyed = shuffle_keys(df, id_col, n_shards, seed)
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
