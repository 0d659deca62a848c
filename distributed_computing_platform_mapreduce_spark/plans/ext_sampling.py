"""Sampling/packing extension queries: heavy hitters, the
stratified/mixture/weighted/temperature sample suite, and sequence
packing (split out of plans/extensions.py in r12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators import (
    packing,
    sampling,
)
from distributed_computing_platform_mapreduce_spark.plans.ext_common import _pinned_cluster_codebook
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

@query(
    "heavy_hitters",
    # Registered r8 (slot freed by the agg_grouping_suite fold): output
    # above the Misra–Gries guarantee threshold is DETERMINISTIC — every
    # value with frequency > n/(k+1) is in some partition summary
    # regardless of partitioning, the recount is exact, and the
    # min_count filter cuts precisely at the guarantee — so plain
    # GROUP-BY-HAVING replays it.
    oracle="""
    WITH w AS (
      SELECT word FROM (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents
      ) WHERE word <> ''
    )
    SELECT word, count(*) AS cnt
    FROM w
    GROUP BY word
    HAVING count(*) > (SELECT count(*) // 33 FROM w)
    """,
)
def heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens WITHOUT a full-key shuffle: per-partition
    Misra–Gries summaries (k=32 counters, one Arrow pass, no shuffle) →
    ≤ partitions·k candidates broadcast → exact recount of candidate
    rows only — thresholded at the guarantee (count > n/33), where the
    output is provably partitioning-independent. At web-corpus
    cardinality the full ``groupBy(token)`` shuffle carries billions of
    distinct keys to answer a top-handful question; this plan's shuffle
    carries candidate rows only. (The sf corpus' small vocabulary makes
    every word a candidate — the guarantee arithmetic, not the
    candidate pruning, is what the oracle exercises; the pruning bound
    is pinned under 1/4/32-partition layouts in pytest.)"""
    from distributed_computing_platform_mapreduce_spark.operators.frequent import (
        heavy_hitters,
    )
    from distributed_computing_platform_mapreduce_spark.plans.maplejuice import tokenize

    docs = load_table(spark, sf_dir, "documents")
    words = tokenize(docs)
    k = 32
    n = words.count()  # one bounded-scalar job (the CC-checksum pattern)
    return heavy_hitters(words, "word", k=k, min_count=n // (k + 1) + 1).select(
        "word", F.col("count").alias("cnt")
    )


@query(
    "sample_stratified",
    # r9 fold: 'lang' = the original exact-budget stratified sample;
    # 'cluster' promotes the previously pytest-only diversity-aware
    # cluster-quota sampler — the codebook is pinned (see
    # _pinned_cluster_codebook), so DuckDB replays the argmax-cosine
    # cell assignment AND the identical GF(2³¹−1) seed-11 rank draw.
    # r10 fold: 'mixture'/'split' replay the same GF arithmetic as
    # stateless filters; 'weighted' replays the A-ES -ln(u)/w key
    # quantized to 6 decimals (round_key — ln's cross-libm ulp cannot
    # survive the rounding, ties resolve by id); 'bins' replays
    # quantile_bins at relative_error=0 — Spark's exact quantile is
    # the sorted value at 1-based rank ceil(p·n) (probed over ties,
    # duplicates, and n∈{4..100}), which the nt/cuts CTEs reproduce,
    # and assign_bins is a pure count-of-cuts-below expression.
    oracle="""
    WITH nt AS (
      SELECT doc_id, lang, source,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT n_tokens,
             row_number() OVER (ORDER BY n_tokens) AS rn,
             count(*) OVER () AS n
      FROM nt
    ),
    cuts AS (
      SELECT
        max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c1,
        max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c2,
        max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c3
      FROM ranked
    ),
    cents AS (
      SELECT c, list_transform(range(0, 64), d -> ((((c*73 + d*37) % 19) - 9))::DOUBLE) AS cv
      FROM (SELECT unnest(range(0, 16)) AS c)
    ),
    sims AS (
      SELECT e.vec_id, c.c,
             list_dot_product(e.embedding::DOUBLE[], c.cv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, c AS cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS rk
        FROM sims) WHERE rk = 1
    )
    SELECT 'lang' AS leg, doc_id AS id, lang AS stratum, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 10
    UNION ALL
    SELECT 'cluster', vec_id, CAST(cell AS VARCHAR), NULL
    FROM (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY cell
               ORDER BY (15330096 * (vec_id % 2147483647) + 1941083619) % 2147483647,
                        vec_id
             ) AS rk
      FROM best)
    WHERE rk <= 10
    UNION ALL
    SELECT 'budget', doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             SUM(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> ''))) OVER (
               PARTITION BY lang
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumtok
      FROM documents)
    WHERE cumtok <= CASE lang WHEN 'en' THEN 3000 WHEN 'es' THEN 2000 ELSE 1000 END
    UNION ALL
    SELECT 'bins', doc_id,
           CAST((CASE WHEN n_tokens > c1 THEN 1 ELSE 0 END
               + CASE WHEN n_tokens > c2 THEN 1 ELSE 0 END
               + CASE WHEN n_tokens > c3 THEN 1 ELSE 0 END) AS VARCHAR),
           source
    FROM nt CROSS JOIN cuts
    UNION ALL
    SELECT 'mixture', doc_id, lang, source
    FROM documents
    WHERE (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647 <
          CASE lang WHEN 'en' THEN 1073741823
                    WHEN 'es' THEN 536870911
                    ELSE 214748364 END
    UNION ALL
    SELECT 'split', doc_id,
           CASE WHEN (15330096 * (doc_id % 2147483647) + 1941083619)
                     % 2147483647 < 429496729
                THEN 'valid' ELSE 'train' END,
           source
    FROM documents
    UNION ALL
    SELECT 'weighted', doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY round(
                 -ln((((15330096 * (doc_id % 2147483647) + 1941083619)
                        % 2147483647) + 1) / 2147483647.0) / n_tokens, 6),
                 doc_id
             ) AS rk
      FROM nt)
    WHERE rk <= 10
    UNION ALL
    SELECT 'temp', doc_id, lang, source
    FROM documents JOIN (
      -- temperature rates replayed bit-exactly: sqrt is IEEE
      -- correctly-rounded in both engines, the normalizer z is a
      -- left-fold in sorted-lang order, divisions associate
      -- left-to-right, and the threshold floors to an integer —
      -- identical thresholds verified at every SF
      SELECT lang,
             CAST(floor(least(1.0, budget * sqrt(n::DOUBLE) / z / n::DOUBLE)
                        * 2147483647.0) AS BIGINT) AS thr
      FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY lang) c
      CROSS JOIN (
        SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(sqrt(n::DOUBLE) ORDER BY lang)), (a, b) -> a + b) AS z,
               CAST(sum(n) // 2 AS DOUBLE) AS budget
        FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY lang)
      ) zz
    ) t USING (lang)
    WHERE (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647 < thr
    UNION ALL
    -- shard (r12, operators/ordering.py): shard = the SEED-12 draw mod
    -- 8 (constants a=2116244152 b=1255777454 — seed+1 of the suite's
    -- seed 11), rank = position within shard ordered by the seed-11
    -- draw with id tie-break; replays the whole training order
    SELECT 'shard', doc_id, CAST(shard AS VARCHAR), CAST(rk - 1 AS VARCHAR)
    FROM (
      SELECT doc_id,
             (2116244152 * (doc_id % 2147483647) + 1255777454) % 2147483647 % 8 AS shard,
             row_number() OVER (
               PARTITION BY (2116244152 * (doc_id % 2147483647) + 1255777454)
                            % 2147483647 % 8
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
             ) AS rk
      FROM documents)
    """,
)
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling suite, tagged legs:

    - **lang**: exact-budget stratified sample — 10 documents per
      language, ranked by an affine hash of doc_id over GF(2^31−1) with
      an id tie-break (seed 11 → multiplier 15330096, offset 1941083619
      — the oracle replays the identical arithmetic, so the SAMPLE SET
      itself is hash-checked, not just its size). Unlike Spark's
      per-partition Bernoulli ``sample``, the draw is a pure function
      of (doc_id, seed): the same subset reproduces on any cluster
      layout — what a training data recipe requires. Plan: one shuffle
      on the stratum column, WindowGroupLimit prunes to 10 rows/stratum
      map-side.
    - **cluster** (r9 promotion): diversity-aware cluster-quota
      sampling (``sampling.cluster_sample``) — k-means cells as strata,
      exactly 10 embeddings per cell via the same GF draw. The driver
      leg pins the codebook so the assignment is replayable arithmetic;
      the Lloyd-TRAINED path (and its rare-mode over-representation
      guarantee) stays pinned in pytest. One Arrow GEMM assignment
      pass; the only shuffle is the per-cell ranking window.
    - **budget** (r9, ``sampling.token_budget_sample``): per-domain
      TOKEN-budget sampling — the DoReMi/Pile mixture contract in the
      unit a trainer pays for: each language contributes the ranked
      prefix of its docs whose inclusive token cumsum fits the budget
      (en 3000 / es 2000 / default 1000 — exercises both mapped and
      default budgets non-vacuously). Rate-based mixtures skew the
      realized token mix when strata have different length
      distributions; this leg pins the token-denominated policy. Same
      one-shuffle window profile; the whitespace token count is the
      SAME expression the text_stats/sequence_packing oracles replay.
    - **bins** (r10, ``sampling.quantile_bins``): equi-population
      quartile binning of the token-count column at
      ``relative_error=0`` — the GK sketch's exact operating point,
      where Spark's quantile is the sorted value at rank ``ceil(p·n)``
      and DuckDB recomputes the identical cuts from rank arithmetic
      (the sketch-approximate path stays pinned in pytest, where both
      sides of the tolerance band live in one engine). Every doc's bin
      is hash-checked, so ``assign_bins``' strictly-below counting
      convention is driver-certified too.
    - **mixture** / **split** (r10, ``sampling.mixture_sample`` /
      ``train_valid_split``): per-source keep-rates (en 0.5 / es 0.25
      / default 0.1) and the 20% held-out split — both stateless
      GF(2³¹−1) filters (no shuffle at all); the oracle replays the
      exact integer cuts ``int(rate·P)``.
    - **weighted** (r10, ``sampling.weighted_sample_stratified``): the
      Efraimidis–Spirakis A-ES draw weighted by token count, 10 docs
      per language, with ``round_key=6`` so the ranking key is
      quantized below any cross-libm ``ln`` ulp (ties → id, total
      order on both engines).
    - **temp** (r11, ``sampling.temperature_mixture_sample``): the
      T5/mT5/XLM-R temperature recipe — per-language rates ∝ n^0.5 at
      a half-corpus budget, flattening the mixture toward low-resource
      languages (en keeps ~0.36, the tail ~0.6). Promotable because at
      alpha = 0.5 the power is IEEE-correctly-rounded ``sqrt`` and the
      normalizer a sorted-order left-fold, so the integer thresholds
      ``int(rate·P)`` are BIT-IDENTICAL across engines (verified at
      all three SFs); non-0.5 alphas go through libm ``pow`` and stay
      pytest-pinned. Same stateless GF filter as mixture/split —
      no shuffle beyond the one bounded count."""
    docs = load_table(spark, sf_dir, "documents")
    lang = sampling.stratified_sample_exact(
        docs, ["lang"], "doc_id", 10, seed=11
    ).select(
        F.lit("lang").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    budget = sampling.token_budget_sample(
        docs,
        "lang",
        "doc_id",
        budgets={"en": 3000, "es": 2000},
        default_budget=1000,
        seed=11,
    ).select(
        F.lit("budget").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    clus = sampling.cluster_sample(
        emb,
        "vec_id",
        "embedding",
        n_clusters=16,
        per_cluster=10,
        seed=11,
        centroids=_pinned_cluster_codebook(),
    ).select(
        F.lit("cluster").alias("leg"),
        F.col("vec_id").alias("id"),
        F.col("cluster_cell").cast("string").alias("stratum"),
        F.lit(None).cast("string").alias("source"),
    )
    docs_nt = docs.withColumn(
        "n_tokens", packing.whitespace_token_count(F.col("text")).cast("bigint")
    )
    binned, _cuts = sampling.quantile_bins(
        docs_nt, "n_tokens", n_bins=4, relative_error=0.0
    )
    bins_leg = binned.select(
        F.lit("bins").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("bin").cast("string").alias("stratum"),
        "source",
    )
    mixture = sampling.mixture_sample(
        docs,
        "lang",
        weights={"en": 0.5, "es": 0.25},
        id_col="doc_id",
        seed=11,
        default_rate=0.1,
    ).select(
        F.lit("mixture").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    train, valid = sampling.train_valid_split(docs, "doc_id", 0.2, seed=11)
    split = train.select(
        F.lit("split").alias("leg"),
        F.col("doc_id").alias("id"),
        F.lit("train").alias("stratum"),
        "source",
    ).unionAll(
        valid.select(
            F.lit("split").alias("leg"),
            F.col("doc_id").alias("id"),
            F.lit("valid").alias("stratum"),
            "source",
        )
    )
    weighted = sampling.weighted_sample_stratified(
        docs_nt, ["lang"], "doc_id", "n_tokens", 10, seed=11, round_key=6
    ).select(
        F.lit("weighted").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    temp = sampling.temperature_mixture_sample(
        docs, "lang", "doc_id", alpha=0.5, budget_frac=0.5, seed=11
    ).select(
        F.lit("temp").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    # r12: the deterministic training-order shuffle (ordering.py) —
    # every doc's (shard, within-shard rank) under seed 11 / 8 shards.
    # Both are pure GF(2³¹−1) arithmetic + a (sort_key, id)-ordered
    # rank, so DuckDB replays the ENTIRE training order position by
    # position; stratum carries the shard, source the rank.
    from distributed_computing_platform_mapreduce_spark.operators import ordering

    shard = ordering.shuffle_rank(docs, "doc_id", n_shards=8, seed=11).select(
        F.lit("shard").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("shard").cast("string").alias("stratum"),
        F.col("rank").cast("string").alias("source"),
    )
    return (
        lang.unionAll(clus)
        .unionAll(budget)
        .unionAll(bins_leg)
        .unionAll(mixture)
        .unionAll(split)
        .unionAll(weighted)
        .unionAll(temp)
        .unionAll(shard)
    )


@query(
    "sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum // 2048 AS BIGINT) AS seq_id,
           CAST(cum % 2048 AS BIGINT) AS seq_offset,
           (cum % 2048) + n_tokens > 2048 AS straddles
    FROM c
    """,
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM sample packing (concat-and-chunk, r6): every document's
    deterministic (sequence, offset) position when the doc_id-ordered
    whitespace-token stream is cut into 2048-token sequences — the
    metadata pass that precedes materializing packed training batches.

    The oracle replays the global exclusive prefix sum as a single
    DuckDB window; the Spark plan must NOT do that (a no-partition
    window is a one-task funnel) — ``operators/packing.py`` runs the
    two-phase distributed scan instead (range partition → per-partition
    offsets, a window over n_partitions rows → parallel local cumsum),
    so the driver compare certifies the distributed scan against the
    sequential definition."""
    docs = load_table(spark, sf_dir, "documents")
    return packing.pack_sequences(docs, max_tokens=2048)
