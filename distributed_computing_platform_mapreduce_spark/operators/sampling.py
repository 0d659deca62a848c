"""Deterministic sampling operators for training-data curation.

Curating a 100 TB corpus means drawing reproducible subsets: fixed
budgets per stratum (language, source, quality bucket) for eval sets,
and proportional rates for mixture tuning. Spark's built-in ``sample``/
``sampleBy`` are per-partition Bernoulli draws — rates are honored only
in expectation, and the draw changes when partitioning changes. These
operators are deterministic functions of (row identity, seed): the same
inputs produce the same sample on any cluster layout, which is what a
reproducible data recipe needs.

Scale shape: the priority is a pure expression over the id (an LCG over
a Mersenne-prime field — same family as the MinHash permutations, so
ANSI-safe: products stay < 2^62); exact-budget sampling is a per-stratum
top-k (window over the stratum, early-pruned by WindowGroupLimit), and
rate sampling is a stateless filter with NO shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_P = (1 << 31) - 1


def _priority(id_col: str, seed: int) -> F.Column:
    """Deterministic pseudo-random priority in [0, P) from (id, seed).

    Affine over GF(P) with seed-derived multiplier: full-period over the
    field, expressible in any SQL dialect (the twin oracle in tests runs
    the same formula in DuckDB), and ANSI-overflow-safe — all operands
    are cast to long EXPLICITLY because with a 32-bit id column the
    literals also stay int and a·(id % P) overflows int32 under ANSI
    (caught by the Hypothesis twin; bigint ids masked it).
    """
    a = (seed * 6364136223846793005 + 1442695040888963407) % _P or 1
    b = (seed * 2862933555777941757 + 3037000493) % _P
    p = F.lit(_P).cast("long")
    return (
        F.lit(a).cast("long") * F.pmod(F.col(id_col).cast("long"), p) + F.lit(b).cast("long")
    ) % p


def sample_rate(df: DataFrame, id_col: str, rate: float, seed: int = 0) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose priority falls
    below ``rate``·P. Stateless filter — no shuffle, prunes at the scan."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_priority(id_col, seed) < F.lit(int(rate * _P)))


def stratified_sample_exact(
    df: DataFrame, strata_cols: list[str], id_col: str, n_per_stratum: int, seed: int = 0
) -> DataFrame:
    """EXACTLY ``min(n, |stratum|)`` rows per stratum, deterministically:
    rank rows within each stratum by (priority, id) — the id tie-break
    makes the order total, so the sample is unique — and keep the top n.

    One shuffle on the strata columns; rank ≤ n is recognized by Spark's
    WindowGroupLimit, so each partition keeps only n rows per stratum
    before the exchange (top-k pushdown, not a full sort).
    """
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    if "__rk" in df.columns:
        raise ValueError("stratified_sample_exact reserves column name '__rk'")
    w = Window.partitionBy(*strata_cols).orderBy(
        _priority(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic data-mixture sampling (r6): keep each stratum at
    its own rate — the Pile/Dolma-style "mixture weights" pass that
    up/down-weights sources before training.

    ``weights`` maps stratum value → keep-rate in [0, 1]; strata not
    listed keep ``default_rate`` (0 drops them — the usual "only these
    sources" recipe). The draw reuses the GF(2³¹−1) priority, so it is
    a pure function of (id, seed): the same mixture reproduces on any
    cluster layout, and a row kept at rate r stays kept at any rate
    ≥ r (nested samples — raising a source's weight only ADDS docs,
    the property mixture tuning loops rely on). Plan shape: a single
    stateless CASE filter fused into the scan — no shuffle, no joins.
    """
    for k, r in weights.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cut = F.lit(int(default_rate * _P))
    for k, r in sorted(weights.items()):
        cut = F.when(F.col(stratum_col) == k, F.lit(int(r * _P))).otherwise(cut)
    return df.filter(_priority(id_col, seed) < cut)


def temperature_mixture_rates(
    counts: dict[str, int],
    alpha: float = 0.5,
    budget_docs: int | None = None,
    budget_frac: float | None = None,
) -> dict[str, float]:
    """Per-stratum keep-rates for temperature-based mixture sampling —
    the multilingual recipe T5/mT5/XLM-R standardized: a stratum with
    ``n`` docs is sampled in proportion ``n^alpha`` (alpha < 1 flattens
    the mixture toward low-resource strata; alpha = 1 is proportional,
    alpha = 0 uniform across strata). Expected kept docs total
    ``budget_docs`` (or ``budget_frac`` of the corpus); per-doc rate
    ``B·n^(α−1)/Σ_m n_m^α`` capped at 1.

    Determinism/replayability: at alpha = 0.5 the power is computed via
    ``math.sqrt`` — correctly rounded per IEEE 754, so a SQL oracle's
    ``sqrt()`` produces the SAME double — and the normalizer is a
    LEFT-FOLD over strata in sorted-key order, so the whole rate
    computation is bit-identical across engines (verified: identical
    ``int(rate·P)`` thresholds in Python and DuckDB at every test SF).
    Other alphas go through ``pow``, which IEEE does not require to be
    correctly rounded — fine for production sampling, but pin such legs
    in one engine rather than hash-comparing across two."""
    import math

    if (budget_docs is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget_docs / budget_frac")
    total = sum(counts.values())
    if budget_docs is None:
        budget_docs = int(total * budget_frac)
    b = float(budget_docs)

    def power(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha

    z = 0.0
    for k in sorted(counts):  # left-fold in sorted-key order (replayable)
        z = z + power(counts[k])
    if z == 0.0:
        return {k: 0.0 for k in counts}
    return {
        k: min(1.0, b * power(n) / z / float(n))
        for k, n in counts.items()
        if n > 0
    }


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.5,
    budget_docs: int | None = None,
    budget_frac: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based data-mixture sampling: compute ``n^alpha``
    keep-rates from the observed per-stratum counts (one bounded
    groupBy — |strata| rows to the driver, the bounded-scalar pattern)
    and apply them through :func:`mixture_sample`'s stateless GF(2³¹−1)
    filter. Same nested-samples property: raising alpha toward 1 (or
    the budget) only ADDS docs within a stratum, never swaps them."""
    rows = df.groupBy(stratum_col).count().collect()  # bounded: |strata|
    counts = {r[stratum_col]: r["count"] for r in rows}
    rates = temperature_mixture_rates(
        counts, alpha=alpha, budget_docs=budget_docs, budget_frac=budget_frac
    )
    return mixture_sample(df, stratum_col, rates, id_col, seed=seed, default_rate=0.0)


def weighted_sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    weight_col: str,
    n_per_stratum: int,
    seed: int = 0,
    round_key: int | None = None,
) -> DataFrame:
    """Deterministic weight-proportional sample: EXACTLY
    ``min(n, |stratum|)`` rows per stratum, where a row's inclusion
    probability scales with ``weight_col`` (quality scores, dedup
    cluster sizes, …) — the A-ES scheme of Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir" (IPL 2006): rank by
    ``-ln(u)/w`` ascending with u the GF(2³¹−1) priority mapped into
    (0, 1]. Same determinism contract as the rest of this module: the
    draw is a pure function of (id, seed, weight), identical on any
    layout — a reproducible quality-weighted eval set.

    Zero/negative weights rank strictly after every positive weight
    (key = +∞), so they are drawn only when a stratum has fewer than n
    positively-weighted rows. Plan shape identical to
    ``stratified_sample_exact``: one shuffle on the strata columns,
    WindowGroupLimit prunes to n rows per stratum map-side.

    ``round_key`` quantizes the A-ES key to that many decimals before
    ranking (ties then resolve on the id). The key is the one
    transcendental in this module — Java and C libm ``ln`` differ by
    1 ulp — so a cross-engine replay (the driver's DuckDB oracle)
    orders by ``round(-ln(u)/w, 6)``: quantization absorbs the ulp the
    same way ``ranking_bm25``/``text_ngram_lm`` round their scores,
    and the id tie-break keeps the quantized order total. Keys live in
    (0, ~30/w]; at 6 decimals two distinct draws collide only when the
    true keys are within 1e-6 — resolved identically by id on both
    engines. Default None ranks by the exact key (single-engine use).
    """
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    if "__wk" in df.columns:
        raise ValueError("weighted_sample_stratified reserves column name '__wk'")
    u = (_priority(id_col, seed) + F.lit(1)).cast("double") / F.lit(float(_P))
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    if round_key is not None:
        key = F.round(key, round_key)
    win = Window.partitionBy(*strata_cols).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__wk", F.row_number().over(win))
        .filter(F.col("__wk") <= n_per_stratum)
        .drop("__wk")
    )


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    budgets: dict[str, int],
    text_col: str = "text",
    count_col: str | None = None,
    seed: int = 0,
    default_budget: int = 0,
    prefilter_rate: float | None = None,
) -> DataFrame:
    """Deterministic per-domain TOKEN-budget sampling — the DoReMi /
    Pile-recipe contract stated in the unit that actually matters to a
    trainer: each stratum (source, language, quality bin …) contributes
    documents until its TOKEN budget is exhausted, not a document count
    or a keep-rate (a rate-based mixture over strata with different
    document-length distributions silently skews the realized token
    mix).

    Policy: rank each stratum's docs by the GF(2³¹−1) (priority, id)
    order — the module's standard pure-function draw — and keep the
    ranked PREFIX whose inclusive token cumsum stays ≤ budget (the
    stream truncates at the first overflow; no knapsack backfill, so
    the kept set is a windowed expression any SQL engine replays).
    Budgets map stratum value → token budget; unlisted strata get
    ``default_budget`` (0 drops them). ``count_col`` supplies a real
    tokenizer's counts, else whitespace counts.

    Plan: one shuffle on the stratum column + one running-sum window
    per stratum — the ``stratified_sample_exact`` profile. For a
    web-scale stratum whose budget keeps only a sliver, pass
    ``prefilter_rate`` to cut the window's input with the stateless
    hash filter first (keep it ≥ budget/stratum_tokens with a healthy
    safety factor — the prefix the window keeps is then identical
    because ``sample_rate`` keeps exactly the lowest-priority... rows
    are NOT rank-prefix-stable under rate cuts in general, so the
    prefilter CHANGES the draw; it is a deliberate operating-point
    knob for enormous strata, off by default, and the oracle leg runs
    without it)."""
    from distributed_computing_platform_mapreduce_spark.operators.packing import (
        whitespace_token_count,
    )

    for k_, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {k_!r} must be ≥ 0, got {b}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be ≥ 0, got {default_budget}")
    if "__cumtok" in df.columns:
        raise ValueError("token_budget_sample reserves column name '__cumtok'")
    base = df
    if prefilter_rate is not None:
        base = sample_rate(base, id_col, prefilter_rate, seed=seed)
    ntok = (
        F.col(count_col) if count_col is not None else whitespace_token_count(F.col(text_col))
    ).cast("bigint")
    budget = F.lit(int(default_budget)).cast("bigint")
    for k_, b in sorted(budgets.items()):
        budget = F.when(F.col(stratum_col) == k_, F.lit(int(b)).cast("bigint")).otherwise(
            budget
        )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(_priority(id_col, seed).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__cumtok", F.sum(ntok).over(w))
        .filter(F.col("__cumtok") <= budget)
        .drop("__cumtok")
    )


def train_valid_split(
    df: DataFrame, id_col: str, valid_frac: float, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Deterministic disjoint-and-exhaustive train/valid split (late-r6):
    the same GF(2³¹−1) priority that drives ``sample_rate`` partitions
    rows by a single threshold, so (train, valid) is a pure function of
    (ids, seed) — stable across reruns, repartitioning, cluster sizes,
    and INCREMENTAL ingestion (a new doc lands on the same side forever,
    which is what keeps a training corpus's held-out set from leaking as
    the corpus grows). Both sides are stateless scan filters — no
    shuffle, no sampling job."""
    if not 0.0 <= valid_frac <= 1.0:
        raise ValueError(f"valid_frac must be in [0, 1], got {valid_frac}")
    cut = F.lit(int(valid_frac * _P))
    pr = _priority(id_col, seed)
    return df.filter(pr >= cut), df.filter(pr < cut)


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str = "bin",
    relative_error: float = 1e-3,
) -> tuple[DataFrame, list[float]]:
    """Equi-population binning of a numeric column → ``(df + out_col
    int, cut_points)`` — the step that turns a continuous quality/score
    column into the low-cardinality stratum the samplers
    (``stratified_sample_exact``, ``mixture_sample``) and partition
    layouts want.

    Scale shape: cut points come from ``approxQuantile`` (the
    Greenwald–Khanna sketch — one pass, mergeable per partition,
    driver collect bounded at n_bins−1 doubles), and the bin assignment
    is a pure JVM expression (sum of ``col > cut`` over the broadcast
    cut list — codegen-friendly at sane n_bins). The exact alternative
    (``ntile`` window) is a GLOBAL sort — the n_bins-quantile answer no
    100 TB plan should buy when a sketch with 1e-3 relative error costs
    one scan.

    Rows with NULL get bin −1. Returns the cut points so callers can
    bin FUTURE increments identically (apply ``assign_bins``) instead
    of re-sketching a moving corpus."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.approxQuantile(col, probs, relative_error)
    return assign_bins(df, col, cuts, out_col), cuts


def assign_bins(
    df: DataFrame, col: str, cut_points: list[float], out_col: str = "bin"
) -> DataFrame:
    """Assign ``out_col`` = number of ``cut_points`` strictly below
    ``col`` (NULL → −1). Pure expression over a broadcast constant
    list; used by :func:`quantile_bins` and directly on later
    increments with the SAME cuts for consistent strata over time."""
    expr = F.lit(0)
    for c in cut_points:
        expr = expr + F.when(F.col(col) > F.lit(float(c)), 1).otherwise(0)
    return df.withColumn(
        out_col, F.when(F.col(col).isNull(), F.lit(-1)).otherwise(expr).cast("int")
    )


def cluster_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    per_cluster: int = 10,
    seed: int = 11,
    iters: int = 3,
    centroids=None,
    cell_col: str = "cluster_cell",
) -> DataFrame:
    """DIVERSITY-aware sampling over an embedding column: Lloyd-trained
    k-means cells become sampling strata, and each cell contributes
    exactly ``per_cluster`` rows (fewer iff the cell is smaller) via the
    deterministic GF(2³¹−1) draw — so a 90%-dominant mode cannot crowd
    the sample the way any uniform-rate draw lets it, and rare modes
    are guaranteed representation. The standard recipe for seeding
    curation/eval sets from a skewed corpus.

    Pure composition, nothing new to trust: codebook =
    ``similarity.ivf_train`` (sort-free hash-priority sampling +
    distributed Lloyd — pass ``centroids`` to reuse a trained one),
    assignment = one Arrow GEMM pass (``similarity._ivf_assign_udf``,
    the IVF cell assignment), quota draw =
    :func:`stratified_sample_exact` on the cell id (per-stratum top-k
    via WindowGroupLimit — no global sort). Output keeps ``cell_col``
    for per-cell audits. Scale shape: centroid table is
    n_clusters·dim doubles in a closure; the only shuffle is the
    per-cell ranking window, keyed by cell."""
    from distributed_computing_platform_mapreduce_spark.operators import similarity

    if centroids is None:
        centroids = similarity.ivf_train(
            df, id_col=id_col, vec_col=vec_col, n_centroids=n_clusters, iters=iters
        )
    assigned = df.withColumn(
        cell_col,
        F.element_at(similarity._ivf_assign_udf(centroids, 1)(F.col(vec_col)), 1),
    )
    return stratified_sample_exact(assigned, [cell_col], id_col, per_cluster, seed=seed)
