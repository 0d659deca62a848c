"""Deduplication operators for training-data pipelines.

The reference's only dedup is the accidental last-write-wins on juice
output keys (``/root/reference/src/MapReduceMaster.java:371-374``). These
are the real thing, at 100 TB shapes:

- exact dedup: hash-groupBy on content — one shuffle on a 64-bit digest.
- n-gram Jaccard: exact all-pairs similarity via shingle inverted index
  (explode → self-join on shingle → count). Quadratic in bucket size, so
  only for verification / small candidate sets.
- MinHash + LSH: the scale path — O(n·bands) instead of O(n²); only
  same-bucket candidates are verified.
- SimHash: 64-bit fingerprints; near-dup = small hamming distance.
- embedding near-dup: cosine over the embeddings table (see similarity).
- paragraph-granularity dedup: drop paragraphs repeated across documents
  (Dolma/RefinedWeb boilerplate removal) — hash-grouped counts, order-
  preserving rebuild.

All operators are DataFrame-in/DataFrame-out and never collect to the
driver.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

# Mersenne prime modulus for the universal-hash family h(x) = (a·x + b) mod P.
# 2^31-1 keeps a·(x mod P) < 2^62 — no int64 overflow under ANSI arithmetic.
_P = (1 << 31) - 1

# Session-scoped registry of persisted shingle tables, keyed by the
# analyzed plan's semanticHash (see minhash_lsh_pairs): re-running the
# SAME pipeline releases its previous persist (no storage accumulation),
# while concurrent DIFFERENT pipelines no longer evict each other — the
# r5 footgun. A small LRU cap bounds total live entries; mutations hold
# a lock so interleaved threads can't race the registry itself.
_shingle_cache: "OrderedDict[object, DataFrame]" = OrderedDict()
_shingle_cache_lock = threading.Lock()
_SHINGLE_CACHE_MAX = 4


def _plan_key(df: DataFrame) -> object:
    """Semantic identity of a DataFrame's analyzed plan (falls back to
    object identity if the internal API moves)."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 — cache key only, never correctness
        return id(df)


def _persist_via_registry(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` through the session-scoped registry: re-running
    the SAME plan releases its previous persist (every timed bench call
    starts cold — the documented policy), concurrent different
    pipelines keep their caches, and the LRU cap bounds total storage.
    Spark recomputes evicted plans, so eviction is never a correctness
    event. Shared by the shingle table (minhash/LSH) and the gram-start
    table (spans — r16).

    ``storage_level``: pass ``StorageLevel.DISK_ONLY`` for tables whose
    row count is O(corpus tokens) — the spans gram table at the 1 GB
    bench point OOM'd an 8 GB heap when 32 scan tasks built in-memory
    cache batches concurrently (measured r16); a disk reread is far
    cheaper than the Python pass the persist avoids, and it adds zero
    heap pressure."""
    key = _plan_key(df)
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    with _shingle_cache_lock:
        prior = _shingle_cache.pop(key, None)
        if prior is not None:
            prior.unpersist(blocking=False)
        _shingle_cache[key] = out
        while len(_shingle_cache) > _SHINGLE_CACHE_MAX:
            _, stale = _shingle_cache.popitem(last=False)
            stale.unpersist(blocking=False)
    return out


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Built from ``split`` + ``transform`` over token indexes — stays
    JVM-side; no Python per row. Documents with fewer than ``n`` tokens
    (including empty/whitespace-only text) yield an empty array — the
    ``F.when`` guard matters because ``sequence(1, k)`` with k ≤ 0 would
    otherwise produce a descending range and ``slice`` would throw.
    """
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded ``(id, shingle)`` table — the input every shingle-based
    pipeline (n-gram Jaccard, MinHash, LSH) starts from.

    Semantics match ``word_shingles`` + ``explode`` exactly (distinct
    word n-grams, first-occurrence order; pinned equal in
    ``test_shingle_rows_equal_expression_form``), but the build runs as
    an Arrow-batched pandas UDF instead of the higher-order
    ``transform``/``slice``/``concat_ws`` expression: Spark evaluates
    HOF lambdas INTERPRETED, per element, outside codegen — measured
    3.46 s vs 0.60 s for the sf0.1 shingle table (5.8×). One Arrow batch
    per partition, no per-row Python round-trips, so the gap holds at
    any scale. The expression form stays the right choice where a
    Column is needed inside a larger JVM projection.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) < n:
                out.append([])
            else:
                out.append(
                    list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))
                )
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), F.explode(sh(F.col(text_col))).alias("shingle"))


def dedup_exact(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per distinct content.

    Shuffles once on a 64-bit xxhash of the content — at 100 TB the hash
    (not the full text) is the shuffle key, so shuffle width is O(1) per
    row regardless of document size. (A production pipeline would first
    length-bucket to skip the residual full-compare; xxhash64 collisions
    at ~1e10 docs are ~3e-4 birthday-probability — acceptable here.)
    """
    digest = F.xxhash64(*content_cols).alias("__digest")
    w = Window.partitionBy("__digest").orderBy(id_col)
    return (
        df.select("*", digest)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via a shingle inverted index.

    shuffle 1: explode shingles, self-join on shingle (co-partitioned);
    shuffle 2: groupBy pair → common-shingle count. Jaccard computed from
    |A|, |B|, |A∩B|. Emits (id_a < id_b, jaccard ≥ threshold).
    """
    sh = shingle_rows(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    (aᵢ·xxhash64(shingle) + bᵢ) mod P.

    Shape: explode shingles → hash once → groupBy(doc) with num_hashes
    ``min`` aggregates (map-side partial: each partition collapses to 32
    values per doc before the shuffle). The earlier all-array form
    re-inlined the shingle pipeline into every permutation — quadratic
    codegen blowup (200 s at sf0.1 vs ~2 s for this form). The (aᵢ,bᵢ)
    family is fixed/deterministic (seeded LCG constants).
    """
    rnd = _lcg_params(num_hashes)
    hashed = shingle_rows(df, id_col, text_col, n).select(
        "id", F.pmod(F.xxhash64("shingle"), F.lit(_P)).alias("h")
    )
    mins = hashed.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P)).alias(f"__sig{i}")
            for i, (a, b) in enumerate(rnd)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"__sig{i}") for i in range(num_hashes)]).alias("signature")
    )


def _lcg_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a,b) pairs from a fixed linear congruential stream
    (no RNG import → reproducible across runs/versions)."""
    params, state = [], 88172645463325252
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        params.append((a, b))
    return params


def _signature_agg(hashed: DataFrame, num_hashes: int) -> DataFrame:
    """``(id, signature array<long>, sz)`` from an ``(id, h)`` table —
    the ONE MinHash signature aggregate, shared by
    :func:`minhash_index` and :func:`minhash_lsh_pairs`:
    ``groupBy(id).agg(count(*), num_hashes × min((a·h+b) % P))``, with
    map-side partial aggregation collapsing each partition to one row
    per doc before the exchange.

    Measured note (r16): a zero-shuffle numpy ``mapInPandas`` fold over
    the id-contiguous exploded stream was built and interleaved-A/B'd
    against this shape at the 1 GB increment — the fold lost 4×
    (25.8 s vs 6.2 s median): shipping ~37M (id, h) rows across the
    Arrow boundary costs far more than the JVM hash-aggregate it
    replaces, exactly the §4.1 "you cannot remove the transfer cost"
    caveat. The JVM aggregate stays."""
    rnd = _lcg_params(num_hashes)
    mins = hashed.groupBy("id").agg(
        F.count("*").alias("sz"),
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P)).alias(f"__sig{i}")
            for i, (a, b) in enumerate(rnd)
        ],
    )
    return mins.select(
        "id",
        F.array(*[F.col(f"__sig{i}") for i in range(num_hashes)]).alias("signature"),
        "sz",
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    cache_shingles: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding, verified exactly.

    1. ONE exploded (id, shingle) table feeds everything — signatures,
       sizes, and both verification sides (``cache_shingles`` persists
       it so the n-gram construction runs once; a 100 TB pipeline would
       materialize this table to storage instead);
    2. signatures (num_hashes mins over universal hashes of the shingle
       hash) AND the per-doc shingle count in ONE groupBy — sizes ride
       the same shuffle as the signature build instead of a second
       full-corpus aggregation (r5: shaved one of the three sh-wide
       shuffles);
       signatures split into ``bands`` bands → band-hash bucket;
       same-bucket pairs are candidates (one shuffle on (band, bucket);
       a mega-bucket means true mass duplication → AQE skew split);
    3. candidates verified with exact Jaccard via the inverted index —
       over the shingles of CANDIDATE docs only: the candidate id set
       (≪ corpus at real dup rates) broadcast-semi-joins the shingle
       table first (a scan-side filter, no sh shuffle), so the two
       verify joins shuffle O(candidate docs × shingles) instead of the
       whole corpus twice (r5; before/after in SCALE.md). Common-shingle
       COUNTS per pair — no full shingle arrays are ever shipped (the
       round-1 form sent both sides' whole arrays per pair). The
       ``F.broadcast`` on the candidate id set is an UNCONDITIONAL hint
       (it bypasses size estimation), so it bounds the operating
       regime: candidate ids must fit a broadcast (8 GB / driver
       memory) — true at plausible dup rates where candidates ≪
       corpus. A corpus that is mostly duplicates breaks that bound;
       there, drop the hint at this site and Spark shuffles the semi
       join instead — same semantics, still pruned.
    """
    sh = shingle_rows(df, id_col, text_col, n)
    if cache_shingles:
        # The result is lazy, so this function can't unpersist after
        # materialization; the session registry bounds accumulation
        # (see _persist_via_registry). Callers wanting full manual
        # control pass cache_shingles=False.
        sh = _persist_via_registry(sh)
    hashed = sh.select("id", F.pmod(F.xxhash64("shingle"), F.lit(_P)).alias("h"))
    # signatures + sizes in one aggregate (shared _signature_agg helper;
    # shingle rows are distinct per doc, so the per-group count IS
    # |shingles|). Banding reuses the index-side helper, whose concat_ws
    # over element_at renders the same strings the old per-column form
    # did — identical buckets.
    idx = _signature_agg(hashed, num_hashes)
    sizes = idx.select("id", "sz")
    banded = _index_band_buckets(idx, num_hashes, bands)
    if max_bucket_size is not None:
        # mega-bucket guard (same policy + shape as hamming_pairs): a
        # band bucket holding k docs yields O(k^2) candidates — mass
        # duplication that verification would only confirm pair by
        # pair; over-full buckets drop wholesale, recall holds for
        # pairs sharing any surviving band
        if max_bucket_size < 1:
            raise ValueError(f"max_bucket_size must be ≥ 1, got {max_bucket_size}")
        ok_b = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(ok_b, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        # The pair set feeds two consumers (the broadcast id filter below
        # and the verify join) — checkpoint it so the LSH pipeline runs
        # once, not once per consumer. Lazy: materializes inside the
        # broadcast-build job, reused by the main join. Bounded size
        # (candidate pairs, not shingles).
        .localCheckpoint(eager=False)
    )
    # Exact verification of candidates only, via common-shingle counts.
    # Prune sh to candidate docs FIRST: the id set is tiny next to the
    # corpus, so the semi join broadcasts and the expensive verify joins
    # below see only candidate shingles.
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_ids), "id", "left_semi")
    expl_a = sh_cand.select(F.col("id").alias("id_a"), "shingle")
    expl_b = sh_cand.select(F.col("id").alias("id_b"), "shingle")
    common = (
        candidates.join(expl_a, "id_a")
        .join(expl_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Transitive closure of a near-dup pair graph: (id, component) with
    component = min id reachable — the policy ``dedup_survivors``'s
    pair-dominated drop deliberately is NOT (see its docstring).

    Iterative min-label propagation: each round every vertex takes the
    min of its label and its neighbors' labels; converges in O(graph
    diameter) rounds — near-dup clusters are shallow (dup groups, not
    long chains), so a handful of rounds suffices. Each round is one
    join + one aggregate (two shuffles on id). The convergence check is
    a driver-side count per round — the standard pattern for iterative
    graph algorithms (GraphFrames' CC does the same); everything else
    stays distributed.

    Lineage control is load-bearing, not optional: the loop references
    ``labels`` three times per round (neighbor join, new-label select,
    convergence compare), so without materialization the logical plan
    tree TRIPLES per round — analysis cost ~3^rounds, unusable beyond
    diameter ~6. Each round therefore eagerly ``localCheckpoint``s the
    new labels (one job; blocks on executors, lineage truncated to a
    scan) and the symmetrized edge table is persisted once so an
    expensive upstream pair plan (e.g. LSH) runs a single time. On a
    real cluster you'd point ``spark.sparkContext.setCheckpointDir`` at
    durable storage and use ``checkpoint`` instead for fault tolerance;
    superseded checkpoint blocks are released by Spark's ContextCleaner
    as the old handles go out of scope.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.src == labels.id)
                .groupBy(F.col("dst").alias("id2"))
                .agg(F.min("component").alias("nbr_min"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.id2, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                    ).alias("component"),
                )
                # lazy: the convergence count below materializes the
                # checkpoint inside its own job — one job/round, not two
                .localCheckpoint(eager=False)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
    finally:
        sym.unpersist(blocking=False)
    # Falling out of the loop with changes still propagating means labels
    # are NOT final — silently returning them would let a downstream dedup
    # keep several docs per component on deep chain graphs.
    raise RuntimeError(
        f"connected_components did not converge in max_iter={max_iter} rounds "
        "(graph diameter exceeds it); raise max_iter"
    )


def connected_components_twostar(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Connected components via alternating large-star / small-star —
    the two-phase algorithm of Kiveris et al., "Connected Components in
    MapReduce and Beyond" (ACM SoCC 2014). Same output contract as
    ``connected_components``: (id, component = min id reachable).

    Why a second algorithm: min-label propagation converges in
    O(diameter) rounds, and a 100 TB near-dup graph can contain long
    chains (A~B~C~…) where diameter grows with cluster size. The star
    operations contract chains aggressively — provably O(log² n) rounds,
    O(log n) in practice — so a depth-64 chain that costs label
    propagation 64 rounds finishes here in ~5. Each round is two
    groupBy+join passes over the edge set (shuffles on node id), the
    edge set only shrinks toward one star per component, and per-round
    ``localCheckpoint`` keeps the plan O(1) exactly as in
    ``connected_components``.

    * large-star: every node points its LARGER neighbors at the min of
      its closed neighborhood — long tails hook onto small ids without
      growing the edge count;
    * small-star: every node rewires its smaller-or-equal neighbors
      (and itself) to that min — stars flatten.

    At the fixpoint every edge is (node, component-min). Convergence is
    detected by an order-insensitive edge-set checksum (count + hash
    sum in DECIMAL so ANSI mode can't overflow) as the per-round fast
    path; a checksum match is then CONFIRMED by an exact symmetric
    difference (one extra job, paid only at termination), so a hash
    collision cannot end the loop on an unconverged edge set. Raises
    like its sibling if ``max_iter`` is exhausted.

    r6: isolated 2-node components PRE-CONTRACT before the star loop.
    At realistic dup rates most near-dup clusters are exact pairs — an
    edge whose endpoints BOTH have degree 1 is its entire component, so
    its labels (u→v, v→v; v is the min under the canonical u>v
    orientation) are known with zero iterations. The split costs one
    degree aggregation + one join; the loop then runs only on the
    residual edge set and is skipped outright when it's empty. Degree
    is a whole-graph property, so pre-contracted nodes cannot reappear
    in the residual — the two label sets are disjoint by construction.
    Measured at sf0.1 (dedup_cc_survivors): 223 of 256 edges (87%)
    pre-contract, so every star round shuffles an 8× smaller residual;
    wall time on local[32] is noise-neutral (4.31 s vs 4.26 s median —
    per-round cost there is job-scheduling-dominated, not data-
    dominated), which is exactly the profile that flips to a win when
    rounds shuffle terabytes instead of kilobytes; see SCALE.md.

    r6, ``local_threshold``: size-adaptive residual solve. When the
    post-contraction residual edge count (free — it's the checksum's
    count) is ≤ the bound, the residual is collected (≤ threshold
    rows, ~MBs at the 200k default) and solved with driver union-find
    instead of ~10 scheduling-dominated star rounds — the AQE
    demote-to-broadcast spirit applied to iteration. 0 disables (the
    differential tests force 0 to keep the star loop covered); the
    distributed loop remains the path for genuinely large residuals.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        # lazy like the loop rounds: the initial checksum below is the
        # materializing action
        .localCheckpoint(eager=False)
    )
    # nodes reads the checkpointed initial edge set (the local `edges`
    # name is reassigned each round; this plan keeps the original) and is
    # consumed only by the termination integrity check — lazy, so its
    # materialization rides that final count instead of an upfront job.
    nodes = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    # Pre-contraction: split off edges whose both endpoints have degree
    # 1 — each is a complete 2-node component with known labels. The
    # star loop below sees only the residual graph.
    deg = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    tagged = (
        edges.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
        # consumed by both filters below — checkpoint so the degree join
        # runs once; lazy, materialized by the initial residual checksum
        .localCheckpoint(eager=False)
    )
    iso = tagged.filter((F.col("du") == 1) & (F.col("dv") == 1)).select("u", "v")
    iso_labels = iso.select(F.col("u").alias("id"), F.col("v").alias("component")).union(
        iso.select(F.col("v").alias("id"), F.col("v").alias("component"))
    )
    edges = (
        tagged.filter((F.col("du") > 1) | (F.col("dv") > 1))
        .select("u", "v")
        .localCheckpoint(eager=False)
    )

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _check_and_return(labels: DataFrame) -> DataFrame:
        # Integrity: the contraction must not lose nodes. A bounded
        # driver-side count, same pattern as the convergence checks.
        missing = nodes.join(labels, "id", "left_anti").count()
        if missing:
            raise RuntimeError(
                f"connected_components_twostar lost {missing} nodes — "
                "edge contraction bug; report with the input pair set"
            )
        return labels

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # input is canonical (u > v); neighbors of u here are all smaller
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        j = e.join(m, "u")
        rewired = j.filter(F.col("v") != F.col("m")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_edges = m.select(F.col("u"), F.col("m").alias("v"))
        return rewired.union(self_edges).distinct()

    sig = _checksum(edges)
    if sig[0] == 0:
        # every component was an isolated pair — no iterations at all
        return _check_and_return(
            iso_labels.groupBy("id").agg(F.min("component").alias("component"))
        )
    if sig[0] <= local_threshold:
        # Size-adaptive execution (r6, the AQE demote-to-broadcast
        # spirit): after pair pre-contraction the residual graph is
        # typically orders smaller than the corpus. When its edge count
        # (already known from the checksum — no extra job) fits the
        # explicit bound, ten scheduling-dominated star rounds lose to
        # one bounded collect + driver union-find: O(E α(E)) on ≤
        # local_threshold edges (~MBs), the same bounded-driver pattern
        # as the checksum/IVF-centroid sites. The distributed loop below
        # is the big-graph path and stays pytest-covered via
        # local_threshold=0.
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ru, rv = find(r["u"]), find(r["v"])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        members: dict = {}
        for r in rows:
            for x in (r["u"], r["v"]):
                members.setdefault(find(x), set()).add(x)
        out = []
        for root, xs in members.items():
            m = min(xs)
            out.extend((x, m) for x in xs)
        id_type = edges.schema["u"].dataType
        local_labels = edges.sparkSession.createDataFrame(
            out,
            StructType(
                [StructField("id", id_type), StructField("component", id_type)]
            ),
        )
        return _check_and_return(
            local_labels.union(iso_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
    for _ in range(max_iter):
        prev = edges
        edges = (
            _small_star(_large_star(edges))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            # lazy: the checksum below materializes the checkpoint inside
            # its own job — one job per star round instead of two
            .localCheckpoint(eager=False)
        )
        new_sig = _checksum(edges)
        if new_sig == sig and edges.exceptAll(prev).union(prev.exceptAll(edges)).isEmpty():
            labels = (
                edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
                .union(edges.select(F.col("v").alias("id"), F.col("v").alias("component")))
                .union(iso_labels)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
            return _check_and_return(labels)
        sig = new_sig
    raise RuntimeError(
        f"connected_components_twostar did not converge in max_iter={max_iter} "
        "rounds; raise max_iter"
    )


def dedup_survivors_cc(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "twostar",
    comps: DataFrame | None = None,
) -> DataFrame:
    """True transitive-closure dedup: keep exactly one doc (the min id)
    per connected component of the near-dup graph; docs in no pair
    survive trivially. ``algorithm``: "twostar" (default — O(log n)
    rounds, the 100 TB choice) or "label" (min-label propagation,
    O(diameter) rounds; the two are asserted equal on generated graphs).
    ``comps`` (r9): pass a precomputed ``(id, component)`` table to
    share one CC solve across several survivor policies.
    """
    comps = _resolve_components(pairs, algorithm, comps)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def _resolve_components(
    pairs: DataFrame, algorithm: str, comps: DataFrame | None
) -> DataFrame:
    if comps is not None:
        return comps
    if algorithm == "twostar":
        return connected_components_twostar(pairs)
    if algorithm == "label":
        return connected_components(pairs)
    raise ValueError(f"unknown algorithm {algorithm!r} (twostar|label)")


def dedup_survivors_cc_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    algorithm: str = "twostar",
    comps: DataFrame | None = None,
) -> DataFrame:
    """Transitive-closure dedup keeping the BEST doc per component —
    highest ``quality_col``, min id on ties — instead of the min id.
    This is the survivor policy production curation actually wants:
    within a near-dup cluster the copies differ (truncations, boilerplate
    variants, OCR noise), and min-id keeps whichever was crawled first
    rather than the longest/cleanest copy. With a constant quality
    column the output equals :func:`dedup_survivors_cc` exactly (the
    tie-break is the same (id) order — pinned in pytest).

    Scale shape: the quality ranking window runs over COMPONENT MEMBERS
    only (an inner join of ``df`` against the CC table, bounded by
    2·pairs rows) — never a corpus-wide window; non-members bypass both
    the join and the window entirely, exactly like the min-id form's
    anti-join. One extra shuffle keyed by component, carrying (id,
    component, quality) rows only."""
    for reserved in ("__q", "__rk"):
        if reserved in df.columns:
            raise ValueError(
                f"dedup_survivors_cc_best reserves column name {reserved!r}"
            )
    comps = _resolve_components(pairs, algorithm, comps)
    members = df.select(
        F.col(id_col), F.col(quality_col).alias("__q")
    ).join(comps.withColumnRenamed("id", id_col), id_col)
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    winners = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col)
    )
    losers = comps.select(F.col("id").alias(id_col)).join(
        winners, id_col, "left_anti"
    )
    return df.join(losers, id_col, "left_anti")


def fnv1a64_codepoints(tokens: "pd.Series") -> "pd.Series":
    """FNV-1a-style 64-bit fold over UNICODE CODE POINTS (not UTF-8
    bytes): h ^= codepoint; h = h·0x100000001B3 mod 2⁶⁴, from offset
    basis 14695981039346656037. The code-point variant exists so the
    identical integer fold is replayable in ANY engine with big-integer
    arithmetic (DuckDB HUGEINT mod 2⁶⁴ + 21-bit xor — the
    ``sample_stratified`` GF(2³¹−1) replay trick, widened to 64 bits);
    byte-level FNV would need the engine's UTF-8 encoder instead.
    Returns the value wrapped to signed int64 (Spark LongType two's
    complement), bit pattern unchanged."""
    out = []
    for t in tokens:
        h = 14695981039346656037
        for ch in t:
            h ^= ord(ch)  # code points < 2^21: only low bits XOR
            h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        out.append(h - (1 << 64) if h >= (1 << 63) else h)
    return pd.Series(out, dtype="int64")


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    For each bit position, sum +1/−1 votes of each distinct token's
    hash bit; fingerprint bit = sign of the vote. Same explode →
    groupBy shape as minhash_signatures (partial-agg friendly, no
    per-row expression blowup).

    ``hash_fn`` picks the token hash: ``"xxhash64"`` (default — JVM
    codegen, the fast path) or ``"fnv1a64"`` (Arrow-batched
    code-point FNV fold — ~same fingerprints statistically, but
    replayable integer arithmetic, so a DuckDB oracle can reproduce
    the prints and the hamming pairs exactly; see the registered
    ``dedup_simhash`` query). The fingerprint SEMANTICS (votes → sign)
    are identical either way; only the token-hash family differs.

    Tokenize stays a JVM expression deliberately: unlike the 3-gram
    build in ``shingle_rows`` (interpreted ``transform``+``slice`` per
    shingle — 5.8× slower than Arrow), plain split+filter+distinct is
    cheap enough that the Arrow round-trip LOSES — measured 3.8 s
    (expression) vs 6.3 s (pandas UDF) for the sf0.1 pair query, whose
    self-join evaluates the tokenize twice. Measure before moving a
    stage to Python either way.
    """
    toks = F.array_distinct(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""))
    exploded = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    if hash_fn == "xxhash64":
        hashed = exploded.select("id", F.xxhash64("tok").alias("h"))
    elif hash_fn == "fnv1a64":
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType

        # the UDF closure references this module — ship the package to
        # Python workers (same contract as the multimodal operators)
        from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

        ensure_shipped(df.sparkSession)
        fnv = pandas_udf(fnv1a64_codepoints, LongType())
        hashed = exploded.select("id", fnv("tok").alias("h"))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|fnv1a64)")

    def mask(i: int) -> Column:
        return F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))

    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(mask(i)) != 0, 1).otherwise(-1)
            ).alias(f"__v{i}")
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"__v{i}") > 0, mask(i).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return votes.select("id", fingerprint.alias("simhash"))


def hamming_pairs(
    prints: DataFrame,
    id_col: str = "id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    blocks: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs among 64-bit fingerprints by hamming distance,
    block-LSH (pigeonhole) style — the shared candidate machinery behind
    text SimHash AND image perceptual-hash dedup.

    Pigeonhole: if two 64-bit prints differ in ≤ ``max_hamming`` bits
    and we cut into ``blocks`` ≥ max_hamming+1 equal blocks, at least
    one block matches exactly → candidates join on (block_idx,
    block_value), then verify popcount of XOR. Avoids the O(n²) cross
    join; the shuffle carries blocks·n rows keyed by block value.

    ``max_bucket_size`` is the mega-bucket guard for degenerate prints
    (blank images, empty documents, boilerplate hashing to one value):
    a single (block, value) bucket holding k rows contributes O(k²)
    candidate pairs, so one degenerate value can turn the banded join
    quadratic. When set, buckets larger than the bound are EXCLUDED
    (one extra groupBy on the same key the join shuffles on) — the
    pigeonhole recall guarantee then holds only for pairs with at least
    one matching block in a surviving bucket; content frequent enough
    to blow the bound is near-identical boilerplate a curation pipeline
    drops wholesale anyway (the Dolma/RefinedWeb policy)."""
    if 64 % blocks != 0:
        raise ValueError(f"blocks must divide 64, got {blocks}")
    if blocks < max_hamming + 1:
        raise ValueError(
            f"pigeonhole guarantee broken: blocks={blocks} < max_hamming+1="
            f"{max_hamming + 1} (a pair at distance {max_hamming} could "
            "differ in every block)"
        )
    width = 64 // blocks
    blocked = prints.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col(hash_col), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("blkval"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "__h", "bb.blk", "bb.blkval")
    # The self-join consumes `blocked` twice, and upstream print
    # pipelines are expensive (simhash's vote aggregation; perceptual
    # hashes DECODE the media). Cut the lineage so the prints compute
    # once — the checkpoint is bounded at blocks·n 16-byte rows (lazy:
    # materializes inside the join's first job).
    blocked = blocked.localCheckpoint(eager=False)
    if max_bucket_size is not None:
        if max_bucket_size < 1:
            raise ValueError(f"max_bucket_size must be ≥ 1, got {max_bucket_size}")
        ok_buckets = (
            blocked.groupBy("blk", "blkval")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("blk", "blkval")
        )
        blocked = blocked.join(ok_buckets, ["blk", "blkval"], "left_semi")
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blkval") == F.col("b.blkval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    blocks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, block-LSH style —
    ``simhash`` fingerprints through the shared :func:`hamming_pairs`
    pigeonhole join. ``hash_fn`` forwards to ``simhash`` (xxhash64 fast
    path vs the DuckDB-replayable fnv1a64 fold)."""
    prints = simhash(df, id_col, text_col, hash_fn=hash_fn)
    return hamming_pairs(
        prints, id_col="id", hash_col="simhash", max_hamming=max_hamming, blocks=blocks
    )


def remove_repeated_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """Paragraph-granularity dedup (Dolma / RefinedWeb style): drop every
    paragraph whose exact trimmed text appears in MORE than ``max_docs``
    distinct documents — boilerplate (headers, footers, cookie banners,
    license blocks) repeats across documents while real content doesn't.
    Documents keep their remaining paragraphs in original order; a doc
    reduced to nothing keeps an empty string (callers gate on it).

    Scale shape (r16 positions-only restructure — the same §8 "decide
    with small rows, move big rows once" lesson ``_cut_spans`` landed in
    r15; the previous form shuffled paragraph PAYLOADS twice, through
    the hash join and the per-doc rebuild groupBy): paragraphs explode
    scan-side with positions and are immediately projected down to
    ``(id, pos, 64-bit xxhash, non-empty flag)`` — paragraph text never
    crosses an exchange. The cross-document count groups on the hash
    (the ``dedup_exact`` trick) with ``countDistinct(id)`` so
    in-document repetition alone never triggers a drop; only
    PAST-THRESHOLD hashes join back (a left-semi against the tiny hot
    set), dropped positions collect per doc (ints), and each affected
    document rebuilds IN PLACE with a filter-by-index over its own
    re-split — untouched documents pass through without even re-splitting.
    Hash collisions conflate two paragraphs at ~1e-10 probability per
    pair (birthday-bounded like ``dedup_exact``), identical to the old
    hash-join form.
    """
    import re

    # F.split treats its pattern as a Java regex while the rebuild's
    # concat_ws uses the literal string — escape so separators with
    # regex metacharacters ('.', '|', '+', …) split and rebuild the
    # SAME document. re.escape emits backslash-escapes of ASCII
    # punctuation only, which Java regex reads identically.
    esc = re.escape(sep)
    paras = df.select(
        F.col(id_col).alias("__rp_id"),
        F.posexplode(F.split(F.col(text_col), esc)).alias("pos", "para"),
    ).select(
        "__rp_id",
        "pos",
        F.xxhash64(F.trim(F.col("para"))).alias("__h"),
        (F.trim(F.col("para")) != "").alias("__ne"),
    )
    hot = (
        paras.filter(F.col("__ne"))
        .groupBy("__h")
        .agg(F.countDistinct("__rp_id").alias("__ndocs"))
        .filter(F.col("__ndocs") > max_docs)
        .select("__h")
    )
    # (id, sorted dropped positions) — only documents that actually lose
    # a paragraph appear; everything here is ints and hashes
    dropped = (
        paras.join(hot, "__h", "left_semi")
        .groupBy("__rp_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__drop_pos"))
    )
    # The reserved "__rp_id" name keeps this join unambiguous even when
    # the caller's frame already carries a column literally named "id".
    # Affected docs rebuild via filter-by-index (an interpreted HOF, but
    # evaluated ONLY on the when() branch's dropped docs); a null text
    # rebuilds to "" exactly as the old form's missing-group coalesce
    # did. split-then-concat_ws on the literal separator is lossless, so
    # the rebuilt string is byte-identical to the old collect_list path.
    rebuilt = F.concat_ws(
        sep,
        F.filter(
            F.split(F.col(text_col), esc),
            lambda p, i: ~F.array_contains(F.col("__drop_pos"), i),
        ),
    )
    return (
        df.join(dropped, F.col(id_col) == F.col("__rp_id"), "left")
        .drop("__rp_id")
        .withColumn(
            text_col,
            F.when(
                F.col("__drop_pos").isNull(), F.coalesce(F.col(text_col), F.lit(""))
            ).otherwise(rebuilt),
        )
        .drop("__drop_pos")
    )


#: 61-bit Mersenne modulus + FNV-prime polynomial base of the gram
#: rolling hash (module constants so the gram pass and its tests agree).
_GRAM_M = (1 << 61) - 1
_GRAM_B = 1_099_511_628_211

#: Per-worker token→FNV memo for the gram pass. Natural-language and
#: synthetic corpora alike are vocabulary-bounded (Zipf: ~30k–1M
#: distinct tokens however many tokens flow), so after warmup the
#: per-byte FNV fold collapses to one dict probe per token (r15
#: measured: the fold is ~50% of the gram pass's CPU; probe ≈ 10×
#: cheaper on ~6-char tokens). Module scope so reused Python workers
#: (`spark.python.worker.reuse`, default on) keep it across tasks —
#: the package ships to executors via `shipping.ensure_shipped`, so
#: the module (and its globals) is importable there, not re-pickled
#: per task. Capped at 2^18 entries (r15 ADVICE: 2^20 bytes-keyed
#: entries pinned ~100–300 MB of permanent RSS per reused worker for a
#: memo whose hit rate saturates at the Zipf head — 2^18 ≈ 262k tokens
#: covers any natural vocabulary's head); when an adversarial
#: all-unique stream fills it, the memo is CLEARED and rebuilt rather
#: than frozen, so a later Zipf-shaped corpus on the same worker still
#: gets its hit rate back.
_FNV_MEMO: dict = {}
_FNV_MEMO_MAX = 1 << 18


def _fnv61(bs: bytes) -> int:
    """FNV-1a over the token's UTF-8 bytes, reduced into the 61-bit
    polynomial field — identical values to the historical per-str
    helper (same bytes, same fold, same reduction)."""
    h = 0xCBF29CE484222325
    for ch in bs:
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % _GRAM_M


def _gram_start_rows(
    df: DataFrame, id_col: str, text_col: str, k: int, route_min_count: int | None = None
) -> DataFrame:
    """``(id, pos, gh)`` — one row per token ``k``-gram start position,
    with a deterministic 61-bit polynomial rolling hash of the gram.
    One Arrow pass, O(tokens) per document; tokens themselves never
    leave the pass — only 8-byte gram hashes shuffle downstream.

    The r15 rewrite keeps the hash VALUES bit-identical (pinned by the
    Hypothesis differential and the driver oracle) while cutting the
    per-token Python work ~3× (guide §4.2 — do less interpreted work
    per batch):

    - tokens split at the BYTES level: ``text.encode().split()`` is a
      single C pass whose split set (ASCII ``[ \\t\\n\\r\\f\\v]``) equals
      both Java's ``\\s`` and the old ``re.split(r"\\s+", flags=ASCII)``
      — UTF-8 continuation bytes are ≥ 0x80 so multibyte characters
      can never be split; the per-token ``.encode()`` the FNV fold paid
      disappears (the tokens already ARE the bytes it hashed).
    - the FNV fold memoizes per distinct token (``_FNV_MEMO``).
    - the steady-state rolling update folds add-incoming and
      drop-outgoing into ONE ``%`` (Python's mod is sign-correct), and
      the (id, pos) output columns come from ``np.repeat``/``arange``
      over per-doc gram counts instead of three per-token appends."""
    import numpy as np

    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    id_dtype = dict(df.select(id_col).dtypes)[id_col]
    M = _GRAM_M
    B = _GRAM_B
    Bk = pow(B, k, M)

    def run(batches):
        memo = _FNV_MEMO
        mget = memo.get
        for pdf in batches:
            doc_ids, counts, ghs = [], [], []
            gext = ghs.extend
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").encode("utf-8").split()
                n = len(toks)
                if n < k:
                    continue
                th = []
                tap = th.append
                for t in toks:
                    h = mget(t)
                    if h is None:
                        h = _fnv61(t)
                        if len(memo) >= _FNV_MEMO_MAX:
                            memo.clear()  # reset, don't freeze (r15 ADVICE)
                        memo[t] = h
                    tap(h)
                h = 0
                for i in range(k - 1):
                    h = (h * B + th[i]) % M
                gh = [0] * (n - k + 1)
                for i in range(k - 1, n):
                    h = (h * B + th[i] - (th[i - k] * Bk if i >= k else 0)) % M
                    gh[i - k + 1] = h
                doc_ids.append(rid)
                counts.append(n - k + 1)
                gext(gh)
            cnt = np.asarray(counts, dtype=np.int64)
            ids_np = np.repeat(np.asarray(doc_ids, dtype=object), cnt)
            pos_np = (
                np.arange(int(cnt.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            gh_np = np.asarray(ghs, dtype=np.int64)
            if route_min_count is None:
                yield pd.DataFrame(
                    {id_col: ids_np, "pos": pos_np.astype(np.int32), "gh": gh_np}
                )
                continue
            # batch-local pre-count routing (r16, VERDICT r15 #3 — see
            # _gram_start_rows_routed)
            m = route_min_count
            nrows = len(gh_np)
            uniq, inv, ucnt = np.unique(gh_np, return_inverse=True, return_counts=True)
            hot_u = ucnt >= m
            w = np.ones(nrows, dtype=np.int64)
            if hot_u.any():
                hot = hot_u[inv]
                # spread negative keys salted by the batch row index
                # (a boilerplate gram recurs at the SAME pos across
                # docs, so (gh, pos) would collide right back into one
                # partition); wrap-around arithmetic is fine, the
                # mask+offset guarantees negativity, and residual
                # collisions only merge rows that both self-qualify
                gh_np = gh_np.copy()
                salt = np.flatnonzero(hot)
                gh_np[hot] = -1 - ((gh_np[hot] * 31 + salt) & ((1 << 55) - 1))
                w[hot] = m
                side_gh = uniq[hot_u]
                side_w = ucnt[hot_u].astype(np.int64)
                ids_np = np.concatenate(
                    [ids_np, np.full(len(side_gh), None, dtype=object)]
                )
                pos_np = np.concatenate(
                    [pos_np, np.full(len(side_gh), -1, dtype=np.int64)]
                )
                gh_np = np.concatenate([gh_np, side_gh])
                w = np.concatenate([w, side_w])
            yield pd.DataFrame(
                {
                    id_col: ids_np,
                    "pos": pos_np.astype(np.int32),
                    "gh": gh_np,
                    "w": w,
                }
            )

    schema = f"{id_col} {id_dtype}, pos int, gh long"
    if route_min_count is not None:
        schema += ", w long"
    return df.select(id_col, text_col).mapInPandas(run, schema)


def _gram_start_rows_routed(
    df: DataFrame, id_col: str, text_col: str, k: int, min_count: int
) -> DataFrame:
    """:func:`_gram_start_rows` with BATCH-LOCAL pre-counting for the
    repeated-gram window (r16, VERDICT r15 #3 — the builder's hybrid,
    applied INSIDE the gram pass so no extra Arrow round-trip is paid):
    emits ``(id, pos, gh, w)`` where

    - a gram whose hash reaches ``min_count`` occurrences WITHIN the
      Arrow batch is already PROVABLY repeated globally; its rows are
      routed around the shared window partition by rewriting ``gh`` to
      a spread NEGATIVE key (real hashes are non-negative) with
      ``w = min_count`` — each such row self-qualifies in its own tiny
      partition, so a corpus-wide boilerplate gram (the ExactSubstr
      workload's EXPECTED input: licenses, templates) no longer funnels
      millions of rows into one window task. Negative-key collisions
      only merge rows that are both kept anyway — harmless.
    - one SIDECAR row ``(NULL id, pos −1, gh, w = batch-local count)``
      per (batch, hot gh) keeps the real partition's weighted sum
      EXACT for rare siblings in other batches: sum(w) over a real gh
      partition = (rare rows × 1) + (hot batches × their local count)
      = the gram's true global count.
    - all other rows pass through unchanged with ``w = 1``.

    ``sum(w).over(partitionBy(gh)) ≥ min_count`` therefore reproduces
    the exact global-count decision while every window partition is
    bounded by ``(min_count−1) × batches + batches`` rows instead of
    the gram's occurrence count. Pinned equal to the plain-window form
    by the spans differential and the hot-gram routing test."""
    return _gram_start_rows(df, id_col, text_col, k, route_min_count=min_count)


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact repeated-SUBSTRING removal — the ExactSubstr policy of Lee
    et al. ACL'22 ("Deduplicating Training Data Makes Language Models
    Better"): any run of ≥ ``k`` tokens occurring at least ``min_count``
    times ANYWHERE in the corpus (across documents or within one) is cut
    from EVERY occurrence; non-repeated text is preserved in order. The
    span granularity catches what document- and paragraph-level dedup
    both miss: licenses, templated headers and quoted passages embedded
    mid-document.

    Returns ``df`` with ``text_col`` rebuilt (whitespace canonicalized
    to single spaces — the operator tokenizes on whitespace) plus
    ``n_tokens_removed``.

    Scale shape, stage by stage (no suffix array needed for the
    fixed-k policy):

    1. gram hashes: one Arrow pass emits ``(id, pos, gh)`` per k-gram
       start via a rolling polynomial hash — O(tokens)/doc, and only
       8-byte hashes shuffle.
    2. repeated starts (r16, closing r15's known hot-gram skew — the
       builder's hybrid): the gram pass PRE-COUNTS each Arrow batch's
       hashes; rows of a batch-locally-repeated gram are provably
       repeated globally and route around the shared window partition
       on spread self-qualifying negative keys, while one weighted
       sidecar row per (batch, hot gram) keeps rare siblings' totals
       exact (see :func:`_gram_start_rows_routed`). The single
       ``sum(w).over(partitionBy(gh))`` window then makes the SAME
       global-count decision with every partition bounded by batch
       count instead of occurrence count — a corpus-wide boilerplate
       gram (the ExactSubstr workload's expected input) no longer
       funnels millions of rows into one task. Still exactly ONE
       exchange of (id, pos, gh, w); no persist, no second gram pass.
       (Two alternatives were built and interleaved-A/B'd at the 1 GB
       point before landing here: groupBy+semi-join-back with the gram
       table persisted DISK_ONLY was 1.5–2× slower than the window —
       the persist IO dominates, and the count exchange collapses
       nothing on unique-heavy hashes — and the unpersisted variant
       OOM'd 32 concurrent scan tasks re-evaluating the gram subtree.)
    3. cut + rebuild: see :func:`_cut_spans` — cut-start positions
       collect per doc (tiny next to tokens), one join attaches them
       to the text, and one Arrow pass rebuilds each document.

    Hash collisions (two distinct grams sharing a 61-bit hash) would
    wrongly mark a span repeated at ~n²/2⁶¹ pair probability —
    birthday-bounded like every digest op here."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be ≥ 2, got {min_count}")
    rows = _gram_start_rows_routed(df, id_col, text_col, k, min_count)
    starts = (
        rows.withColumn("__n", F.sum("w").over(Window.partitionBy("gh")))
        .filter(F.col("__n") >= min_count)
        .filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__rs_id"), "pos")
    )
    return _cut_spans(df, starts, id_col, text_col, k)


def _cut_spans(
    df: DataFrame, starts: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Cut every ``[pos, pos+k)`` token span named by ``starts``
    (``(__rs_id, pos)`` rows) out of ``df``'s text — the shared tail of
    :func:`remove_repeated_spans` and :func:`decontaminate_spans`;
    adds ``n_tokens_removed``.

    r15 shape (guide §2.3 — shuffle keys/positions, not payloads; §5 —
    the old plan's per-token window sort was the operator's measured
    spill source): cut starts collect into ONE sorted array per doc
    (rows ≈ repeated-gram occurrences — tiny next to tokens on real
    corpora), one join attaches that array to the document row, and a
    vectorized Arrow pass rebuilds each text by splicing out covered
    tokens. The heavy bytes (the text) move exactly once, into the
    join; the old plan instead EXPLODED every token into a row, union'd
    difference-array deltas, ran a running-sum window over
    tokens+deltas (full shuffle + sort of every token string, spilling
    at the 1 GB points), and re-assembled docs with a second
    collect_list aggregate. Output is identical: same covered-position
    semantics, same single-space rebuild, same ``''`` for fully-cut
    docs (the rebuild pass also canonicalizes whitespace on untouched
    docs, exactly as the explode/rebuild plan did).

    The per-doc splice is the classic merged-interval sweep over the
    sorted start array; whitespace semantics stay byte-identical to the
    JVM's ``split('\\s+')`` because ``bytes.split()``'s ASCII whitespace
    set equals Java's ``\\s`` (see :func:`_gram_start_rows`)."""
    from pyspark.sql.functions import pandas_udf

    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)

    @pandas_udf("text string, n_tokens_removed long")
    def rebuild(texts: pd.Series, cut_starts: pd.Series) -> pd.DataFrame:
        out_t, out_n = [], []
        for text, cs in zip(texts, cut_starts):
            toks = (text or "").encode("utf-8").split()
            if cs is None or len(cs) == 0:
                out_t.append(b" ".join(toks).decode("utf-8"))
                out_n.append(0)
                continue
            kept = []
            kext = kept.extend
            cur = 0
            for s in cs:
                if s > cur:
                    kext(toks[cur:s])
                nxt = s + k
                if nxt > cur:
                    cur = nxt
            kext(toks[cur:])
            out_t.append(b" ".join(kept).decode("utf-8"))
            out_n.append(len(toks) - len(kept))
        return pd.DataFrame({"text": out_t, "n_tokens_removed": out_n})

    cut_lists = starts.groupBy("__rs_id").agg(
        F.sort_array(F.collect_list("pos")).alias("__cut_starts")
    )
    return (
        df.join(cut_lists, F.col(id_col) == F.col("__rs_id"), "left")
        .drop("__rs_id")
        .withColumn("__rb", rebuild(F.col(text_col), F.col("__cut_starts")))
        .withColumn(text_col, F.col("__rb.text"))
        .withColumn("n_tokens_removed", F.col("__rb.n_tokens_removed"))
        .drop("__cut_starts", "__rb")
    )


def decontaminate_spans(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    k: int = 13,
    eval_broadcast: bool = False,
) -> DataFrame:
    """SURGICAL decontamination: cut every ``k``-token run that also
    appears in the eval corpus, keeping the rest of the document —
    the span-level alternative to ``quality.decontaminate``'s
    drop-the-whole-doc policy (the standard trade: dropping loses the
    doc's clean majority; cutting keeps it while still removing every
    eval-overlapping window, GPT-3-style 13-gram granularity by
    default).

    Reuses the ExactSubstr machinery end to end: eval grams hash through
    the SAME rolling polynomial (one Arrow pass over the eval corpus —
    typically tiny next to training data), training-side gram starts
    left-semi join the eval hash set, and :func:`_cut_spans` collects
    the cut positions per doc and splices them out in one Arrow
    rebuild pass. Shuffle carries 8-byte hashes only; the eval side is
    one scan.

    ``eval_broadcast`` is the 100 TB shuffle lever: the eval gram set
    comes out of a distinct aggregate, whose size the planner cannot
    estimate — so by default the semi join plans as sort-merge and
    shuffles EVERY training gram row (8 bytes × tokens, the dominant
    movement of the whole pass). Eval corpora are small by definition
    (8 B/gram ⇒ ~10⁸ distinct grams fit a ~1 GB broadcast), so forcing
    a broadcast-hash semi join removes the training-side exchange
    entirely: the gram pass, the membership probe and the coverage
    deltas all stay in the scan stage. Same output by construction —
    the hint changes strategy, not semantics; the caller owns the
    "eval fits the broadcast limit" contract, which is why it is not
    the default."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    grams = _gram_start_rows(df, id_col, text_col, k)
    eval_ghs = (
        _gram_start_rows(eval_df, eval_id_col, eval_text_col, k)
        .select("gh")
        .distinct()
    )
    if eval_broadcast:
        eval_ghs = F.broadcast(eval_ghs)
    starts = grams.join(eval_ghs, "gh", "left_semi").select(
        F.col(id_col).alias("__rs_id"), "pos"
    )
    return _cut_spans(df, starts, id_col, text_col, k)


# --- incremental dedup (new batch vs historical index) ----------------------


def minhash_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """The STORABLE dedup index: ``(id, signature array<long>, sz)`` —
    num_hashes MinHash components + the exact shingle count per doc.
    ~300 bytes/doc regardless of document size; a production pipeline
    materializes this once per corpus increment and never re-reads
    historical TEXT to dedup against it (see
    :func:`incremental_minhash_pairs`).

    Docs with fewer than ``n`` tokens produce ZERO shingles and would
    otherwise vanish from the index — an exact duplicate of a short doc
    would then pass every future increment undetected, silently breaking
    the "survivors ∪ index" invariant. They are indexed with one
    sentinel shingle = the hash of the WHITESPACE-NORMALIZED text (runs
    of whitespace collapsed, ends trimmed): identical short token
    sequences get identical signatures (collide in every band,
    est_jaccard 1.0) even as trailing/duplicate-whitespace variants,
    distinct ones almost surely share no component. The short-doc branch
    is a JVM-side token-count filter over the same scan — no extra
    shuffle.

    The token count and the sentinel must agree with
    :func:`shingle_rows`'s Python ``str.split()`` tokenizer, which
    splits on UNICODE whitespace — so the JVM twin uses
    ``(?U)[\\s\\x1c-\\x1f]+`` (Unicode ``\\s`` plus the FS/GS/RS/US
    separators Python's ``str.isspace`` also accepts), not ASCII
    ``\\s``. A mismatch would let an NBSP-separated doc collect both
    real shingles AND a sentinel hash, perturbing its signature
    relative to an ASCII-spaced twin (ADVICE r8)."""
    sh = shingle_rows(df, id_col, text_col, n)
    hashed = sh.select("id", F.pmod(F.xxhash64("shingle"), F.lit(_P)).alias("h"))
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(c, r"(?U)[\s\x1c-\x1f]+", " "))
    ntok = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    sentinel = df.filter(ntok < n).select(
        F.col(id_col).alias("id"), F.pmod(F.xxhash64(norm), F.lit(_P)).alias("h")
    )
    return _signature_agg(hashed.unionAll(sentinel), num_hashes)


def _index_band_buckets(index: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) from a signature index — the identical banding
    formula `minhash_lsh_pairs` uses, so buckets collide across
    increments built at different times."""
    r = num_hashes // bands
    return index.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", i * r + j + 1)
                                    for j in range(r)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


# --- history-prefilter policy (r13, executable form of SCALE.md's measured
# guidance) ---------------------------------------------------------------

# Approximate broadcast cost per distinct (band, bucket) key: two int64
# columns plus BroadcastHashJoin HashedRelation overhead (key hash, slots,
# object headers). 48 B/key is deliberately conservative — under-estimating
# would pick broadcast past the point where the driver/executors pay for it.
_BCAST_BYTES_PER_KEY = 48
# Bloom sizing: ~10 bits/key keeps FP < 1% (k=7 Kirsch–Mitzenmacher);
# clamped so the task-closure bitmap stays between 128 KB and 16 MB — the
# artifact's whole point is that it never grows with the key count.
_BLOOM_BITS_PER_KEY = 10
_BLOOM_MIN_M_BITS = 2**20
_BLOOM_MAX_M_BITS = 2**27


def _bloom_m_bits_for(est_keys: int) -> int:
    """The ONE Bloom sizing rule (~10 bits/key, clamped to [2^20, 2^27])
    — shared by the ``'auto'`` policy and the forced ``'bloom'`` path so
    a forced caller gets the same 128 KB–16 MB artifact the policy would
    size, not a hardcoded constant (r13 VERDICT #4)."""
    m_bits = _BLOOM_MIN_M_BITS
    while m_bits < est_keys * _BLOOM_BITS_PER_KEY and m_bits < _BLOOM_MAX_M_BITS:
        m_bits *= 2
    return m_bits


def choose_prefilter(
    new_index: DataFrame,
    bands: int = 8,
    network_shuffle: bool | None = None,
    broadcast_cap_bytes: int = 50 * 1024 * 1024,
    n_new_docs: int | None = None,
) -> dict:
    """Pick the history prefilter for :func:`incremental_minhash_pairs` —
    the executable form of the regime rule SCALE.md measured (r12):

    - **Shuffle local-cheap → no prefilter.** On local[32]/NVMe the
      unfiltered history shuffle beat BOTH prefilters even at 10:1
      history:increment asymmetry (6.41 s vs bcast 6.53 s vs bloom
      8.55 s) — the probe/semi-join pass costs more than the local
      shuffle it saves.
    - **Network-priced shuffle, increment key set broadcasts (≲50 MB)
      → broadcast semi-join.** Exact, all-JVM, zero false positives.
    - **Past the broadcast cap → Bloom bitmap**, sized at ~10 bits/key
      (FP < 1%), clamped to [2^20, 2^27] bits so the closure artifact
      stays 128 KB–16 MB at ANY key count.

    ``network_shuffle`` defaults to inference from the session master:
    ``local[...]`` masters are local-cheap, anything else is treated as
    network-priced. ``n_new_docs`` overrides the increment row count
    (skips the count job — pass it when the caller already knows).
    Returns ``{"kind": 'none'|'broadcast'|'bloom', "bloom_m_bits":
    int|None, "est_keys": int|None}`` — the dict feeds straight into
    :func:`incremental_minhash_pairs`'s explicit knobs.
    """
    if network_shuffle is None:
        master = new_index.sparkSession.sparkContext.master or ""
        network_shuffle = not master.startswith("local")
    if not network_shuffle:
        return {"kind": "none", "bloom_m_bits": None, "est_keys": None}
    if n_new_docs is None:
        n_new_docs = new_index.count()
    # keys ≈ docs · bands: each doc lands in one bucket per band; distinct
    # collapses shared buckets, so this over-estimates — the safe direction
    # (never picks broadcast for a set that turns out bigger).
    est_keys = max(1, n_new_docs * bands)
    if est_keys * _BCAST_BYTES_PER_KEY <= broadcast_cap_bytes:
        return {"kind": "broadcast", "bloom_m_bits": None, "est_keys": est_keys}
    return {"kind": "bloom", "bloom_m_bits": _bloom_m_bits_for(est_keys), "est_keys": est_keys}


def incremental_minhash_pairs(
    new_index: DataFrame,
    history_index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    bloom_prefilter_m_bits: int | None = None,
    broadcast_prefilter: bool = False,
    prefilter: str = "auto",
    n_new_docs: int | None = None,
    network_shuffle: bool | None = None,
) -> DataFrame:
    """Near-dup pairs for a NEW increment against itself and against the
    historical index → ``(id_new, id_other, source 'history'|'new',
    est_jaccard)``.

    The incremental regime changes the verification contract: the
    history's TEXT (and shingles) are gone — only signatures persist —
    so similarity is the MinHash ESTIMATE (matching components /
    num_hashes, the unbiased Jaccard estimator; σ = √(J(1−J)/k) ≈ 0.09
    at k=32, J=0.5 — size num_hashes to the precision the drop policy
    needs). Candidates still come from band-bucket collisions (one
    shuffle keyed by (band, bucket), never all-pairs); the estimator
    runs on candidate pairs only.

    ``bloom_prefilter_m_bits`` (r12, VERDICT #4): when set, a Bloom
    filter (``sketches.bloom_filter_table``) is built over the NEW
    increment's (band, bucket) keys and probed against the HISTORY
    bucket table at its scan — at 100 TB the history index dwarfs every
    increment, and without the prefilter all n_history·bands bucket
    rows shuffle into the candidate join even though almost none
    collide with the increment. Output is IDENTICAL by construction:
    the filter has no false negatives (every colliding history row
    survives), and a false positive only lets a row into the shuffle
    where the exact (band, bucket) equi-join discards it (pinned in
    ``test_incremental_bloom_prefilter_output_identical``). Size it at
    ~10 bits per new-side key (keys ≈ n_new_docs · bands): the default
    2^26 = an 8 MB task-closure bitmap, FP < 1% up to ~6.7 M keys.

    ``broadcast_prefilter`` (r12) is the EXACT sibling: left-semi join
    the history bucket table against the broadcast distinct new-side
    keys — zero false positives, plans as a BroadcastHashJoin LeftSemi,
    all JVM. Prefer it while the increment's distinct (band, bucket)
    set broadcasts comfortably (~≤50 MB); switch to the Bloom bitmap
    when the increment outgrows that (the bitmap stays 8 MB at ANY key
    count). Mutually exclusive with ``bloom_prefilter_m_bits``.

    ``prefilter`` (r13) is the DEFAULT policy path: ``'auto'`` resolves
    via :func:`choose_prefilter` (no prefilter on local-cheap shuffle,
    broadcast under the ~50 MB key-set cap, Bloom above), so callers
    who set neither explicit knob get the measured decision rule
    instead of the unfiltered path unconditionally. ``'none'`` forces
    unfiltered; ``'broadcast'``/``'bloom'`` force those paths — a
    forced ``'bloom'`` is sized by the SAME ~10-bits/key clamped rule
    the policy uses (r14; no hardcoded bitmap). The two explicit knobs
    override ``prefilter`` when set (back-compat).

    Cost note (r13 ADVICE): on a network-priced master, ``'auto'`` (and
    forced ``'bloom'``) must size against the increment's row count —
    ONE extra ``count()`` job per call unless the caller passes
    ``n_new_docs`` (do so when the increment size is already known —
    e.g. from the ingest batch that produced it). ``network_shuffle``
    overrides the master-type inference the same way it does on
    :func:`choose_prefilter` (local masters short-circuit to 'none',
    which also skips the count)."""
    if bloom_prefilter_m_bits is not None and broadcast_prefilter:
        raise ValueError(
            "choose ONE history prefilter: bloom_prefilter_m_bits or broadcast_prefilter"
        )
    if bloom_prefilter_m_bits is None and not broadcast_prefilter:
        if prefilter == "auto":
            policy = choose_prefilter(
                new_index,
                bands=bands,
                network_shuffle=network_shuffle,
                n_new_docs=n_new_docs,
            )
        elif prefilter in ("none", "broadcast"):
            policy = {"kind": prefilter, "bloom_m_bits": None}
        elif prefilter == "bloom":
            if n_new_docs is None:
                n_new_docs = new_index.count()
            policy = {
                "kind": "bloom",
                "bloom_m_bits": _bloom_m_bits_for(max(1, n_new_docs * bands)),
            }
        else:
            raise ValueError(
                f"prefilter must be auto|none|broadcast|bloom, got {prefilter!r}"
            )
        if policy["kind"] == "broadcast":
            broadcast_prefilter = True
        elif policy["kind"] == "bloom":
            bloom_prefilter_m_bits = policy["bloom_m_bits"]
    nb = _index_band_buckets(new_index, num_hashes, bands)
    hb = _index_band_buckets(history_index, num_hashes, bands)
    if bloom_prefilter_m_bits is not None:
        from distributed_computing_platform_mapreduce_spark.operators import sketches

        bb_key = F.xxhash64("band", "bucket")
        bloom = sketches.bloom_filter_table(
            nb.select(bb_key.alias("bb_key")), "bb_key", m_bits=bloom_prefilter_m_bits
        )
        hb = sketches.bloom_probe(
            hb.withColumn("__bb_key", bb_key), "__bb_key", bloom
        ).drop("__bb_key")
    elif broadcast_prefilter:
        hb = hb.join(
            F.broadcast(nb.select("band", "bucket").distinct()),
            ["band", "bucket"],
            "left_semi",
        )

    sig_n = new_index.select(F.col("id").alias("id_new"), F.col("signature").alias("sig_n"))
    sig_h = history_index.select(
        F.col("id").alias("id_other"), F.col("signature").alias("sig_o")
    )

    def estimate(cand: DataFrame, other_sigs: DataFrame, tag: str) -> DataFrame:
        # r16: component-match count as an UNROLLED sum of element_at
        # comparisons instead of aggregate(zip_with(...)) — Spark runs
        # HOF lambdas INTERPRETED, per element, outside codegen (the
        # measured 10× lsh_bucket lesson; the r15 similarity rewrite
        # removed the same shape). The unrolled form is a flat codegen
        # expression; integer sum then one divide — identical values.
        matches = sum(
            F.when(
                F.element_at("sig_n", i + 1) == F.element_at("sig_o", i + 1), 1
            ).otherwise(0)
            for i in range(num_hashes)
        )
        est = matches.cast("double") / F.lit(float(num_hashes))
        return (
            cand.join(sig_n, "id_new")
            .join(other_sigs, "id_other")
            .select(
                "id_new",
                "id_other",
                F.lit(tag).alias("source"),
                est.alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )

    # new vs history: every colliding (new, hist) bucket pair
    nh = (
        nb.alias("a")
        .join(
            hb.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.id").alias("id_new"), F.col("b.id").alias("id_other"))
        .distinct()
    )
    # new vs new: ordered pairs within the increment
    nn = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_new"), F.col("b.id").alias("id_other"))
        .distinct()
    )
    return estimate(nh, sig_h, "history").unionAll(
        estimate(nn, sig_n.select(F.col("id_new").alias("id_other"), F.col("sig_n").alias("sig_o")), "new")
    )


def incremental_dedup(
    new_df: DataFrame,
    history_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    bloom_prefilter_m_bits: int | None = None,
    broadcast_prefilter: bool = False,
    prefilter: str = "auto",
    n_new_docs: int | None = None,
    network_shuffle: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The production increment loop: ``(survivors, updated_index)``.

    A new doc survives iff it matches NOTHING in history and no
    LOWER-id doc in its own increment (the deterministic min-id-wins
    policy of `dedup_exact`/`dedup_survivors`). The updated index =
    history ∪ survivors' signatures, ready to be written back for the
    next increment — historical text is never read, and the index grows
    only by the deduped increment. ``bloom_prefilter_m_bits`` prunes
    the history bucket table at its scan before the candidate shuffle
    (see :func:`incremental_minhash_pairs`) — output-identical, history
    side never fully shuffled. On network-priced masters the default
    ``prefilter='auto'`` sizes itself against the increment row count —
    pass ``n_new_docs`` when the batch size is already known to skip
    the one extra ``count()`` job that sizing otherwise costs (r13
    ADVICE; local masters resolve to 'none' and never pay it)."""
    survivors, surviving_index = incremental_dedup_delta(
        new_df,
        history_index,
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        bloom_prefilter_m_bits=bloom_prefilter_m_bits,
        broadcast_prefilter=broadcast_prefilter,
        prefilter=prefilter,
        n_new_docs=n_new_docs,
        network_shuffle=network_shuffle,
    )
    return survivors, history_index.unionAll(surviving_index)


def incremental_dedup_delta(
    new_df: DataFrame,
    history_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    bloom_prefilter_m_bits: int | None = None,
    broadcast_prefilter: bool = False,
    prefilter: str = "auto",
    n_new_docs: int | None = None,
    network_shuffle: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`incremental_dedup`'s core, returning ``(survivors,
    surviving_index)`` — the increment's own surviving signatures (the
    index DELTA) instead of ``history ∪ delta``. The delta is what an
    incremental index LAYOUT persists per batch (r16: the streaming
    sink's versioned index writes O(batch) delta segments instead of
    rewriting the O(history) index every trigger — guide §6); callers
    that want the materialized full index use :func:`incremental_dedup`
    unchanged."""
    new_index = minhash_index(new_df, id_col, text_col, n, num_hashes).localCheckpoint(
        eager=False
    )
    pairs = incremental_minhash_pairs(
        new_index, history_index, num_hashes, bands, threshold,
        bloom_prefilter_m_bits=bloom_prefilter_m_bits,
        broadcast_prefilter=broadcast_prefilter,
        prefilter=prefilter,
        n_new_docs=n_new_docs,
        network_shuffle=network_shuffle,
    )
    # any history match kills the new doc; a new-new match kills the
    # HIGHER id (pairs are ordered id_new < id_other for source='new',
    # so the victim there is id_other)
    dead_vs_history = pairs.filter(F.col("source") == "history").select(
        F.col("id_new").alias("id")
    )
    dead_vs_new = pairs.filter(F.col("source") == "new").select(
        F.col("id_other").alias("id")
    )
    # the dead-id set feeds BOTH outputs (survivors anti-join and the
    # index anti-join); a lazy checkpoint makes the candidate join +
    # estimate pipeline run once when a caller consumes both — the
    # streaming sink's per-trigger shape paid it twice (r16). Bounded:
    # dead ids only.
    dead = dead_vs_history.union(dead_vs_new).distinct().localCheckpoint(eager=False)
    survivors = new_df.join(
        dead.withColumnRenamed("id", id_col), id_col, "left_anti"
    )
    surviving_index = new_index.join(dead, "id", "left_anti")
    return survivors, surviving_index


def bucket_stats(df: DataFrame, key_cols: list[str]) -> dict:
    """Candidate-cost advisor for any banded/bucketed join: one
    aggregate over the bucket keys → ``{n_rows, n_buckets,
    max_bucket, est_candidate_pairs}`` where est_candidate_pairs =
    Σ n·(n−1)/2 over buckets — the EXACT pair count the self-join would
    emit. Run it on the blocked/banded table BEFORE ``hamming_pairs`` /
    ``minhash_lsh_pairs`` to size ``max_bucket_size`` (or decide the
    corpus is mass-duplicated) for the cost of one groupBy instead of
    discovering the blowup mid-join."""
    row = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("__n"))
        .agg(
            F.sum("__n").alias("rows"),
            F.count("*").alias("buckets"),
            F.max("__n").alias("mx"),
            F.sum(F.col("__n") * (F.col("__n") - 1) / 2).alias("pairs"),
        )
        .collect()[0]
    )
    return {
        "n_rows": int(row["rows"] or 0),
        "n_buckets": int(row["buckets"] or 0),
        "max_bucket": int(row["mx"] or 0),
        "est_candidate_pairs": int(row["pairs"] or 0),
    }
