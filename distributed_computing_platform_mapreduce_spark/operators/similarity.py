"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; random-hyperplane LSH
bucketing is the scale path (candidates only within matching buckets).
Since r15 the exact/LSH/IVF scorers compute cosines with vectorized
numpy inside one Arrow pass, accumulating dimension-by-dimension in
array order so every double is bit-identical to the historical
``F.zip_with`` + ``F.aggregate`` sequential fold (which the remaining
JVM-side helpers below still implement, and the DuckDB oracles replay).

At 100 TB the exact variant ships the (small, bounded) query set to
executors as a closure matrix — no corpus shuffle; top-k per query is
a bounded window fed by per-task pre-truncation. The LSH variant
buckets the corpus once and probes buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _validate_vectors(op: str, side: str, id_vec_pairs, dim: int | None = None):
    """Loud contract check for the numpy scoring paths (r15): embedding
    columns are fixed-dim, non-null arrays (the catalog schema). A null
    or ragged vector under the old JVM expression yielded a silent null
    cosine; under numpy it would either crash cryptically mid-batch or
    — worse, on a dim mismatch — score a silently TRUNCATED cosine.
    Fail fast naming the offending row instead. Returns the validated
    dimension.

    Driver-side/bounded call sites only (collected query rows). The
    per-batch corpus hot loops use :func:`_validate_vec_batch` — same
    contract, same error text, vectorized (r16, VERDICT r15 #8)."""
    for rid, v in id_vec_pairs:
        if v is None:
            raise ValueError(
                f"{op}: {side} embedding at id={rid!r} is NULL — "
                "fixed-dim non-null vectors are the contract; filter "
                "null embeddings upstream"
            )
        if dim is None:
            dim = len(v)
        elif len(v) != dim:
            raise ValueError(
                f"{op}: {side} embedding at id={rid!r} has dim "
                f"{len(v)} != {dim} — mixed dimensions would score a "
                "truncated cosine; align the schemas upstream"
            )
    return dim


def _validate_vec_batch(op: str, side: str, ids, vecs, dim: int):
    """Vectorized twin of :func:`_validate_vectors` for the per-batch
    scoring hot loops (r16): the steady state costs two C-speed checks
    (null mask + length array) instead of an interpreted per-row loop
    re-added to a path r15 had just vectorized. Only on a violation does
    the per-row hunt run, to name the offending id with the EXACT error
    text `_validate_vectors` raises (pinned by the malformed-embeddings
    test)."""
    import numpy as np

    if not isinstance(vecs, pd.Series):
        vecs = pd.Series(list(vecs), dtype=object)
    bad = bool(vecs.isna().to_numpy().any())
    if not bad:
        lens = np.fromiter(
            (len(v) for v in vecs), dtype=np.int64, count=len(vecs)
        )
        bad = bool(np.any(lens != dim))
    if bad:
        # violation: re-run the loud per-row check for the exact message
        _validate_vectors(op, side, zip(ids, vecs), dim=dim)
        raise AssertionError(
            f"{op}: {side} batch failed vectorized validation but the "
            "row scan found nothing — report this"
        )  # pragma: no cover — the row scan always raises first


def cosine_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set (queries ≪ corpus — the documented bounded side,
    ≲10⁵ rows, exactly the bound the broadcast it replaces carried)
    rides to executors as a closure matrix; each corpus Arrow batch
    scores ALL queries with vectorized numpy and pre-truncates to the
    per-batch top-k per query (ties on the kth cosine kept — a
    superset of any global winner), so the shuffle carries
    O(batches·|Q|·k) rows into the final exact ranking window.

    r15 rewrite (guide §4.2; the repo's own lsh_bucket lesson): the old
    plan scored every (corpus × query) pair with the interpreted
    ``zip_with``+``aggregate`` fold — higher-order functions never
    enter codegen, so a 400-corpus × 120k-query call burned ~80 s of
    pure expression interpretation (measured r15, idle 32-core). The
    numpy path does the same arithmetic at memory bandwidth — and the
    COSINE DOUBLES ARE BIT-IDENTICAL: the accumulation loops run
    dimension-by-dimension in array order (vectorized across rows), so
    every IEEE multiply/add happens in exactly the sequential-fold
    order the JVM expression used and the driver oracle replays
    (pinned by the similarity suite's hash-compared oracle at every
    sf).

    Contract (r15 ADVICE, surfaced from the private helper): this call
    is EAGER on the query side — ``queries`` is collected at
    DataFrame-construction time (a Spark job runs, and validation
    errors raise, even if the result is never acted on), and driver
    memory holds the query matrix where the old plan's broadcast-size
    guardrail did. ``queries`` must be deterministic and small (the
    documented ≲10⁵-row bounded side)."""
    import numpy as np

    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(corpus.sparkSession)
    qid_dtype = dict(queries.select(id_col).dtypes)[id_col]
    cid_dtype = dict(corpus.select(id_col).dtypes)[id_col]
    qrows = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qvec"),
        )
        .collect()
    )  # bounded by contract: queries is the small side (was broadcast)
    out_schema = f"query_id {qid_dtype}, neighbor_id {cid_dtype}, cos double"
    if not qrows:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.select(
            "query_id", "neighbor_id", F.lit(0).alias("rank"), "cos"
        ).filter(F.lit(False))
    qids = np.array([r["query_id"] for r in qrows])
    _validate_vectors(
        "cosine_topk_exact", "queries",
        ((r["query_id"], r["qvec"]) for r in qrows),
    )
    qmat = np.array([r["qvec"] for r in qrows], dtype=np.float64)
    dim = qmat.shape[1]
    # query norms in the JVM fold's exact order: sum x² dimension by
    # dimension, then sqrt — one IEEE add/mul per step, same rounding
    qn = np.zeros(len(qrows), dtype=np.float64)
    for d in range(dim):
        qn = qn + qmat[:, d] * qmat[:, d]
    qn = np.sqrt(qn)
    # r16 (VERDICT r15 #7): the query matrix rides as a TorrentBroadcast
    # instead of closure capture — pickled into the task command it
    # re-shipped ~8·dim bytes/query with EVERY task launch; a broadcast
    # ships once per executor and the task closure carries only the
    # handle. Same arrays, same arithmetic.
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qmat, qn))

    def score(batches):
        qids, qmat, qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            _validate_vec_batch(
                "cosine_topk_exact", "corpus", cids, pdf[vec_col], dim
            )
            cmat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            b = len(cids)
            cn = np.zeros(b, dtype=np.float64)
            for d in range(dim):
                cn = cn + cmat[:, d] * cmat[:, d]
            cn = np.sqrt(cn)
            # chunk the query axis so the score block stays ~64 MB
            ck = max(64, (8 << 20) // max(1, b))
            out_q, out_c, out_s = [], [], []
            for lo in range(0, len(qids), ck):
                qc_ids = qids[lo : lo + ck]
                qc = qmat[lo : lo + ck]
                qcn = qn[lo : lo + ck]
                acc = np.zeros((b, len(qc_ids)), dtype=np.float64)
                for d in range(dim):
                    # dimension-sequential accumulate == the JVM fold
                    acc = acc + cmat[:, d, None] * qc[None, :, d]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = acc / (qcn[None, :] * cn[:, None])
                self_mask = cids[:, None] == qc_ids[None, :]
                # NaN cosines (zero-norm degenerates) rank GREATEST in
                # the downstream Spark window (desc puts NaN first), so
                # the prefilter must keep them: compare through a key
                # that maps NaN→+inf (emitted cos values stay NaN).
                # KEEP IN SYNC with _topk_tie_inclusive in
                # _score_pairs_with_query_closure — same invariant,
                # matrix form here vs flat-array form there.
                key = np.where(np.isnan(cos), np.inf, cos)
                thr_src = np.where(self_mask, -np.inf, key)
                if b > k:
                    thr = np.partition(thr_src, b - k, axis=0)[b - k]
                    emit = (thr_src >= thr[None, :]) & ~self_mask
                else:
                    emit = ~self_mask
                ci, qi = np.nonzero(emit)
                out_c.append(cids[ci])
                out_q.append(qc_ids[qi])
                out_s.append(cos[ci, qi])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_c),
                    "cos": np.concatenate(out_s),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _score_pairs_with_query_closure(
    pairs: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    dedup: bool = False,
    topk: int | None = None,
) -> DataFrame:
    """Score candidate ``(query_id, neighbor_id, cvec)`` rows against
    the bounded query set: queries collect once (they were the
    broadcast side already — same size contract) and ride in the UDF
    closure as an id-indexed matrix; one Arrow pass computes the cosine
    with numpy in the JVM fold's exact dimension order, so the doubles
    are bit-identical to the old interpreted ``zip_with``+``aggregate``
    expression the oracles replay (r15, guide §4.2 — HOF lambdas never
    enter codegen and were the candidate stage's dominant cost).
    Returns ``(query_id, neighbor_id, cos)``.

    ``dedup=True`` (requires ``topk``) drops duplicate
    (query_id, neighbor_id) pairs INSIDE the pass — per-batch
    ``drop_duplicates`` (C-speed), then once more over the task's
    accumulated survivors at iterator end. The multiprobe/multiband
    candidate joins produce every copy of a pair within ONE map task (a
    corpus row's band-explode never leaves its partition — plan-pinned:
    no Exchange between the corpus scan and this scorer), so task-local
    dedup IS global dedup — and it replaces the old JVM ``distinct()``
    whose grouping key carried the cvec array (measured r15: hashing
    ~30M array keys cost ~25-50 s per 25k-query batch, the dominant
    stage of the whole LSH call). Exactness additionally relies on the
    corpus id being unique (the embeddings-table contract the old
    global distinct did not need): two identical corpus rows in
    DIFFERENT partitions would no longer collapse. Cross-batch copies
    of a pair are re-scored (vectorized, identical cos) rather than
    tracked in a per-task seen-set — the set grew with every candidate
    the task saw, unbounded, where the accumulator below is bounded by
    the per-batch top-k.

    ``topk`` (tie-inclusive) prunes each task's output to its local
    top-``topk`` rows per query — per batch first (bounding the
    task-local accumulator), then once per task at iterator end — so
    the exact ranking window downstream receives O(tasks·|Q|·k) rows
    instead of every candidate; rows tied on the kth cosine all
    survive, so the window's (cos DESC, neighbor_id) order still sees
    every possible winner and the final rows are identical.

    ``queries`` must be deterministic (it is evaluated twice: once
    collected here for the closure matrix, once in the caller's probe
    plan) — seeded samples are fine, bare ``rand()`` is not."""
    import numpy as np

    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    if dedup and topk is None:
        raise ValueError(
            "_score_pairs_with_query_closure: dedup=True requires topk "
            "(the task-end dedup happens in the final top-k pass)"
        )
    ensure_shipped(pairs.sparkSession)
    qid_dtype = dict(queries.select(id_col).dtypes)[id_col]
    cid_dtype = dict(pairs.select("neighbor_id").dtypes)["neighbor_id"]
    out_schema = f"query_id {qid_dtype}, neighbor_id {cid_dtype}, cos double"
    qrows = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).collect()
    if not qrows:
        # empty query set: no pair can score — keep the lazy empty
        # result the old broadcast-join plan produced
        return pairs.sparkSession.createDataFrame([], out_schema)
    _validate_vectors(
        "similarity candidate scoring", "queries",
        ((r["qid"], r["qvec"]) for r in qrows), dim=dim,
    )
    qmat = np.array([r["qvec"] for r in qrows], dtype=np.float64)
    qidx = {r["qid"]: i for i, r in enumerate(qrows)}
    qids_arr = np.array([r["qid"] for r in qrows])
    # query norms in fold order (sum x² dimension by dimension, sqrt)
    qn_all = np.zeros(len(qrows), dtype=np.float64)
    for d in range(dim):
        qn_all = qn_all + qmat[:, d] * qmat[:, d]
    qn_all = np.sqrt(qn_all)
    # r16 (VERDICT r15 #7): broadcast, not closure capture — see
    # cosine_topk_exact. At the documented 10⁵-query bound × 64 dims the
    # closure re-shipped ~50 MB per STAGE; the broadcast ships once per
    # executor.
    bc = pairs.sparkSession.sparkContext.broadcast((qmat, qidx, qids_arr, qn_all))

    def _topk_tie_inclusive(qi, nid, cos):
        """Per-query top-``topk`` rows by cosine, ties on the kth value
        kept — a SUPERSET of the global top-k winners, so the exact
        ranking window downstream is unchanged. Vectorized: one lexsort
        groups by query with cos descending, then each group keeps its
        prefix down to the kth-largest cosine.

        NaN cosines (zero-norm degenerates) sort GREATEST — the same
        order the downstream Spark window's ``desc`` uses — via a
        NaN→+inf comparison key; emitted cos values stay NaN. KEEP IN
        SYNC with the np.partition prefilter in cosine_topk_exact's
        scorer — same invariant, flat-array form here vs matrix form
        there."""
        key = np.where(np.isnan(cos), np.inf, cos)
        order = np.lexsort((-key, qi))
        qs, ns, cs, ks = qi[order], nid[order], cos[order], key[order]
        grp_start = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        sizes = np.diff(np.r_[grp_start, len(qs)])
        # index of each group's kth element (clamped to group end)
        kth = grp_start + np.minimum(topk - 1, sizes - 1)
        thr = np.repeat(ks[kth], sizes)
        keep = ks >= thr
        return qs[keep], ns[keep], cs[keep]

    def score(batches):
        qmat, qidx, qids_arr, qn_all = bc.value
        acc_q, acc_n, acc_c = [], [], []
        for pdf in batches:
            if dedup and len(pdf):
                pdf = pdf.drop_duplicates(subset=["query_id", "neighbor_id"])
            if not len(pdf):
                continue
            _validate_vec_batch(
                "similarity candidate scoring", "corpus",
                pdf["neighbor_id"], pdf["cvec"], dim,
            )
            qi = pdf["query_id"].map(qidx).to_numpy()
            qm = qmat[qi]
            qn = qn_all[qi]
            cm = np.vstack(pdf["cvec"].to_numpy()).astype(np.float64, copy=False)
            acc = np.zeros(len(pdf), dtype=np.float64)
            cn = np.zeros(len(pdf), dtype=np.float64)
            for d in range(dim):
                acc = acc + qm[:, d] * cm[:, d]
                cn = cn + cm[:, d] * cm[:, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / (qn * np.sqrt(cn))
            if topk is None:
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"],
                        "neighbor_id": pdf["neighbor_id"],
                        "cos": cos,
                    }
                )
                continue
            # two-level prefilter (guide §2.3 — shuffle only rows that
            # can still win): per-batch top-k bounds the task-local
            # accumulator, per-task top-k at iterator end bounds what
            # the ranking window's exchange carries to
            # O(tasks·|Q|·k) instead of O(candidates).
            q2, n2, c2 = _topk_tie_inclusive(
                qi, pdf["neighbor_id"].to_numpy(), cos
            )
            acc_q.append(q2)
            acc_n.append(n2)
            acc_c.append(c2)
        if topk is not None and acc_q:
            qi = np.concatenate(acc_q)
            nid = np.concatenate(acc_n)
            cos = np.concatenate(acc_c)
            if dedup:
                # task-end exact dedup: cross-batch copies of a pair
                # re-scored identically above collapse here (all copies
                # are task-local — see the docstring's invariant)
                fin = pd.DataFrame(
                    {"q": qi, "n": nid, "c": cos}
                ).drop_duplicates(subset=["q", "n"])
                qi = fin["q"].to_numpy()
                nid = fin["n"].to_numpy()
                cos = fin["c"].to_numpy()
            qs, ns, cs = _topk_tie_inclusive(qi, nid, cos)
            yield pd.DataFrame(
                {
                    "query_id": qids_arr[qs],
                    "neighbor_id": ns,
                    "cos": cs,
                }
            )

    return pairs.mapInPandas(
        score, f"query_id {qid_dtype}, neighbor_id {cid_dtype}, cos double"
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG stream —
    no RNG import, reproducible across runs); ``seed`` varies the plane
    set per LSH band."""
    planes, state = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane (sign) LSH bucket id: bit i = sign(v·planeᵢ).

    2^n_planes buckets; cosine-similar vectors land together w.h.p.
    Expression form (whole-stage codegen) for single-bucket callers; the
    multi-band operators below use ``band_buckets_udf`` — an
    Arrow-batched numpy GEMM — because Spark's higher-order-function
    fold runs interpreted and a per-plane inline chain bloats codegen at
    1024-dim (measured: the HOF fold was 10× slower than either).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def band_buckets_udf(dim: int, bands: int, planes_per_band: int, base_seed: int = 42):
    """Vectorized multi-band bucketing: one Arrow batch → one numpy GEMM
    ``(batch × dim) @ (dim × bands·planes)`` → sign bits → per-band
    bucket ids (``array<long>`` of length ``bands``).

    This is the honest scale path for embedding columns: BLAS does
    bands·planes dot products per row at memory bandwidth, independent
    of ``dim``, where both expression alternatives degrade (interpreted
    HOF fold, or codegen blowup from dim·planes inlined literals).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_hyperplanes(dim, planes_per_band, seed=base_seed + b) for b in range(bands)]
    )  # (bands, planes, dim)
    pmat = planes.reshape(bands * planes_per_band, dim).T  # (dim, bands·planes)
    powers = 1 << np.arange(planes_per_band, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(x, dtype=np.float64) for x in s])  # (n, dim)
        signs = (mat @ pmat) >= 0  # (n, bands·planes)
        per_band = signs.reshape(len(s), bands, planes_per_band)
        ids = (per_band * powers).sum(axis=2)  # (n, bands) int64
        return pd.Series(list(ids))

    return buckets


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    bands: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: multi-band sign-LSH with 1-bit multiprobe.

    The corpus is bucketed once per band (reusable across query batches —
    on a real deployment this is a bucketed/partitioned table on disk;
    corpus storage ×bands, never reshuffled per query). Each query probes
    its own bucket plus, with ``multiprobe``, every 1-bit-flip neighbor
    bucket in each band — the standard recall fix for sign-LSH without
    touching the corpus layout. Candidates per query ≈
    bands·(1+n_planes)·n/2^planes ≪ n; the query side is tiny and stays
    broadcast. Recall at cos 0.9 (θ≈26°): per-band p₀=0.29, ≤1-flip
    ≈0.67 → 4 bands ≈ 0.99; even for weakly-similar cos 0.5 it's ~0.6
    (measured in tests on random vectors — LSH's worst case).

    Contract (r15 ADVICE, surfaced from the private scorer): corpus
    ``id_col`` values must be UNIQUE (the embeddings-table schema) —
    pair dedup is task-local since r15, so byte-identical duplicate
    corpus rows split across partitions would emit duplicate
    (query_id, neighbor_id) rows that consume top-k ranks. The probe
    join must stay a BroadcastHashJoin with no shuffle Exchange between
    the corpus scan and the scoring MapInPandas (pinned by the plan
    lint); ``queries`` must be deterministic — it is evaluated twice
    (probe plan + closure collect), and the collect is EAGER at
    DataFrame-construction time.
    """
    bkts = band_buckets_udf(dim, bands, n_planes)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
            bkts(F.col(vec_col)).alias("__bkts"),
        )
        .select(
            "neighbor_id",
            "cvec",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.element_at("__bkts", band + 1).alias("bucket"),
                        )
                        for band in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("neighbor_id", "cvec", "bb.band", "bb.bucket")
    )
    # Query probes: own bucket + 1-bit flips (bucket XOR 2^i) per band.
    # r15: the probe table carries (query_id, band, bucket) ONLY — the
    # query VECTORS ride to the scoring stage as a closure matrix
    # instead of a column, so the broadcast build is ~24 B/probe row
    # rather than 24+8·dim (guide §2.3 — at a 25k-query batch × 40
    # probes the old 64-dim probe broadcast was ~0.5 GB built on the
    # driver per batch; now ~24 MB).
    flips = [None] + (list(range(n_planes)) if multiprobe else [])
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            bkts(F.col(vec_col)).alias("__bkts"),
        )
        .select(
            "query_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            (
                                F.element_at("__bkts", band + 1)
                                if flip is None
                                else F.element_at("__bkts", band + 1).bitwiseXOR(
                                    F.lit(1 << flip)
                                )
                            ).alias("bucket"),
                        )
                        for band in range(bands)
                        for flip in flips
                    ]
                )
            ).alias("bb"),
        )
        .select("query_id", "bb.band", "bb.bucket")
    )
    # Dedup candidate pairs INSIDE the scoring pass (r15): a pair
    # colliding in several bands/probes used to pay the cosine per
    # COLLISION and a JVM distinct() whose grouping key carried the
    # cvec array (measured: hashing ~30M array keys was the call's
    # dominant stage). Every copy of a pair is produced inside one map
    # task (the corpus row's band-explode meets the broadcast probes
    # map-side), so the scorer's task-local dedup is exact and the
    # distinct's exchange disappears; cvec stays on the row so the
    # scorer needs no corpus re-join.
    pairs = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cvec")
    )
    scored = _score_pairs_with_query_closure(
        pairs, queries, id_col, vec_col, dim, dedup=True, topk=k
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _centroids(corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int):
    """Deterministic IVF centroids: the first ``n_centroids`` vectors by
    id, L2-normalized. Random-vector init is the standard k-means
    seeding; a production index would run a few Lloyd iterations on a
    sample — the query-time structure (assign → probe) is identical, so
    the operator contract doesn't change. The centroid table is tiny
    (n_centroids × dim) and rides in the UDF closure like a broadcast."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _unit_rows(cmat):
    """Row-normalize a codebook so downstream dot products are true
    cosines. All in-repo trainers (``ivf_train``, ``_centroids``, the
    pinned lattice codebooks) already emit unit rows — for those this
    is an EXACT no-op (rows within 1e-9 of unit norm pass through
    untouched, so pinned-oracle argmax margins stay bit-stable) — but a
    caller-supplied raw codebook would otherwise silently turn
    ``cent_cos`` into a non-cosine and skew argmax cell assignment."""
    import numpy as np

    cmat = np.asarray(cmat, dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    if np.all(np.abs(norms - 1.0) <= 1e-9):
        return cmat
    safe = np.where(norms == 0, 1.0, norms)
    return cmat / safe


def _ivf_assign_udf(cmat, n_probe: int):
    """argmax-cosine centroid ids per vector (top-``n_probe`` of them),
    one numpy GEMM per Arrow batch. The codebook is row-normalized on
    entry (exact no-op for the in-repo unit-row trainers) so a raw
    caller-pinned codebook can't skew the assignment."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cmat = _unit_rows(cmat)

    @pandas_udf("array<int>")
    def assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(x, dtype=np.float64) for x in s])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cmat.T  # (n, n_centroids)
        # stable sort: exact cosine ties resolve to the LOWEST cell id,
        # matching the pinned-codebook oracle's (cos DESC, c ASC) order
        # by construction rather than by measured margin
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe].astype(
            "int32"
        )
        return pd.Series(list(top))

    return assign


def ivf_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 7,
    distributed: bool | None = None,
):
    """Lloyd-trained IVF centroids — :func:`pq_train` with a single
    full-width subspace (m=1), so the IVF codebook gets the identical
    sort-free hash-priority sampling + distributed-Lloyd machinery as
    PQ (bounded per-round collect, no corpus sort). Returns a unit-row
    ``(n_centroids, dim)`` float64 matrix for
    :func:`cosine_topk_ivf`'s ``centroids`` parameter.

    Kept opt-in: the default ``_centroids`` seeding is pinned by the
    registered ``similarity_topk_ivf`` query's recall-saturated oracle
    operating point; swap trained centroids in per-index, not
    per-default."""
    import numpy as np

    books = pq_train(
        corpus,
        id_col,
        vec_col,
        m=1,
        k=n_centroids,
        iters=iters,
        seed=seed,
        distributed=distributed,
    )
    cmat = books[0]
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cmat / norms


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids=None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors live in their nearest
    centroid's cell; a query scans only its ``n_probe`` closest cells.

    The complementary scale path to ``cosine_topk_lsh``: comparisons per
    query ≈ n·n_probe/n_centroids, tunable by the probe/centroid ratio
    rather than plane count. Corpus is assigned ONCE (on disk this is a
    partitioned/bucketed table keyed by cell); queries broadcast. At
    10⁹ rows you'd use √n ≈ 32k centroids and a TRAINED codebook
    (:func:`ivf_train` — distributed Lloyd, same plan shape).

    Contract (r15 ADVICE): corpus ``id_col`` values must be UNIQUE and
    the probe join must stay a BroadcastHashJoin with no shuffle
    Exchange between the corpus scan and the scoring MapInPandas (the
    task-local pair dedup's exactness invariant — plan-lint-pinned);
    ``queries`` must be deterministic (evaluated twice: probe plan +
    eager closure collect). Same contract as :func:`cosine_topk_lsh`."""
    import numpy as np

    cmat = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else _centroids(corpus, id_col, vec_col, n_centroids)
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        F.element_at(_ivf_assign_udf(cmat, 1)(F.col(vec_col)), 1).alias("cell"),
    )
    # r15: probes carry (query_id, cell) only and pairs dedup inside
    # the scoring pass — same restructure as cosine_topk_lsh (narrow
    # broadcast, task-local duplicate kill replacing the array-keyed
    # distinct, fold-order numpy scoring; bit-identical cos doubles,
    # pinned by the suite oracle). A corpus row sits in ONE cell, so a
    # pair can only repeat via the query's n_probe cells — all met in
    # the corpus row's own task.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(_ivf_assign_udf(cmat, n_probe)(F.col(vec_col))).alias("cell"),
    )
    pairs = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cvec")
    )
    scored = _score_pairs_with_query_closure(
        pairs, queries, id_col, vec_col, int(cmat.shape[1]), dedup=True, topk=k
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    bands: int = 16,
    planes_per_band: int = 24,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-BAND hyperplane
    LSH (same banding shape as ``minhash_lsh_pairs``): candidates are the
    union over ``bands`` independent sign-LSH bucketings, verified with
    exact cosine ≥ threshold.

    Candidate volume for near-uniform data ≈ bands · n²/2^(planes+1): at
    n = 10⁹ with the defaults (16 bands × 24 planes) that's ~5·10¹¹
    comparisons — vs n²/2⁵ ≈ 3·10¹⁶ for a single coarse 16-bucket split
    (the earlier form), a ~10⁵× reduction. Recall at the near-dup
    operating point cos ≥ 0.9: p_plane = 1 − θ/π ≈ 0.857,
    P(candidate) = 1 − (1 − p^24)^16 ≈ 0.74; raise ``bands`` for more.
    The pair self-join carries only (id, band, bucket); vectors join back
    for verification on candidates alone.
    """
    bkts = band_buckets_udf(dim, bands, planes_per_band, base_seed=1000)
    buckets = (
        corpus.select(F.col(id_col).alias("id"), bkts(F.col(vec_col)).alias("__bkts"))
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.element_at("__bkts", i + 1).alias("bucket"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("id", "bb.band", "bb.bucket")
    )
    a2 = buckets.alias("a")
    b2 = buckets.alias("b")
    candidates = (
        a2.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embed_texts(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Deterministic text embeddings via the feature-hashing trick
    (Weinberger et al., ICML 2009): each token hashes to one of ``dim``
    buckets with a ±1 sign bit, bucket sums are L2-normalized — a real
    (if classical) bag-of-words embedding, not a placeholder, so the
    output is meaningful input for every ANN/near-dup operator here.
    A deployment swaps this for a neural encoder behind the identical
    ``(id, array<double>)`` contract; nothing downstream changes.

    All JVM expressions: explode → one groupBy(id) with ``dim``
    conditional sums (the MinHash-signature shape — partial-agg
    friendly, one shuffle on id), then an interpreted-but-O(dim)
    normalize. No Python in the row path.
    """
    toks = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    h = F.xxhash64("tok")
    hashed = toks.select(
        "id",
        F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
        # an independent hash bit decides the sign (hashing-trick variance fix)
        F.when(F.xxhash64("tok", F.lit("sign")) % 2 == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("sign"),
    )
    sums = hashed.groupBy("id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == i, F.col("sign"))), F.lit(0.0)
            ).alias(f"__b{i}")
            for i in range(dim)
        ]
    )
    vec = F.array(*[F.col(f"__b{i}") for i in range(dim)])
    nrm = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    unit = F.when(nrm > 0, F.transform(vec, lambda x: x / nrm)).otherwise(vec)
    return sums.select("id", unit.alias("embedding"))


# --- int8 quantization (memory-bandwidth lever for corpus-scan ANN) ---------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q = round(x/scale) ∈ [-127, 127]`` (tinyint array + one double).

    4× smaller than float32 (16× vs the array<double> working form) —
    at 100 TB the corpus scan of a brute-force or IVF probe is memory-
    bandwidth-bound, so this is a direct ~4× scan-throughput lever, and
    the int8 corpus often fits a cache tier the float one cannot.
    Cosine is SCALE-INVARIANT, so per-vector scales cancel and
    quantized cosine needs no dequantization at all (the identity
    :func:`cosine_topk_int8` exploits; error ≤ ~1/127 per coordinate,
    recall measured in tests). All JVM expressions — no Python, no
    shuffle; zero vectors quantize to zeros with scale 1 (guard, not a
    divide-by-zero).
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.withColumn(scale_col, scale).withColumn(
        out_col,
        F.transform(v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")),
    )


def cosine_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    batch_topk: int | None = None,
    rerank_shortlist: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over an int8-quantized corpus scan.

    Same contract as :func:`cosine_topk_exact` (bounded query set,
    full-corpus scan, per-query top-k) but the scan runs as an integer
    GEMM over Arrow batches: corpus and queries are quantized with
    :func:`quantize_embeddings`, the (small, bounded — same documented
    collect as the IVF centroid fetch) query matrix rides to executors
    in the task closure, and each batch computes ``C_int8 @ Q_int8.T``
    in int32 — the cheapest possible inner loop. Per batch only the
    local top-``batch_topk`` rows per query survive (default ``k``), so
    the shuffle into the global top-k window carries
    O(n_batches · |Q| · k) rows, not the corpus.

    Scores are cosines of the QUANTIZED vectors — scales cancel
    (cos(s·a, t·b) = cos(a, b)), so no dequantize pass exists anywhere.

    ``rerank_shortlist`` turns the scan into the production
    shortlist-then-rerank pattern: the int8 ranking keeps that many
    candidates per query, exact float64 cosine is recomputed for the
    shortlist only (|Q|·shortlist rows — the shortlist side
    BROADCASTS onto the corpus scan, so the corpus never shuffles),
    and the top-``k`` of the re-ranked scores is returned. The output
    then equals :func:`cosine_topk_exact` — scores, ranks and
    tie-breaks included — whenever the shortlist contains the true
    top-k; the re-rank cosine is the same sequential-fold expression
    the exact path uses, so the equality is bit-level. The int8
    ordering's quantization error decides the needed margin: measure
    the worst int8-rank of a true top-k neighbor before picking the
    shortlist (the recall-saturation discipline every promoted ANN
    point here follows).
    """
    import numpy as np

    qq = quantize_embeddings(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        vec_col=vec_col,
    )
    qrows = qq.select("query_id", "q_embedding").collect()  # bounded query set
    if not qrows:
        empty = "query_id %s, neighbor_id %s, rank int, cos double" % (
            ("string", "string")
            if dict(corpus.dtypes)[id_col] == "string"
            else ("bigint", "bigint")
        )
        return corpus.sparkSession.createDataFrame([], empty)
    qids = [r["query_id"] for r in qrows]
    qmat = np.array([r["q_embedding"] for r in qrows], dtype=np.int8)
    qnorm = np.linalg.norm(qmat.astype(np.int32).astype(np.float64), axis=1)
    qnorm[qnorm == 0] = 1.0
    # +1 headroom: a query's own corpus row (cos 1.0) would otherwise
    # occupy a batch-local slot and evict a true neighbor before the
    # self-match filter runs
    keep = int(batch_topk or (rerank_shortlist or k) + 1)

    cq = quantize_embeddings(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), vec_col=vec_col
    ).select("neighbor_id", "q_embedding")

    id_dtype = dict(cq.dtypes)["neighbor_id"]
    schema = f"query_id {id_dtype}, neighbor_id {id_dtype}, cos double"

    def scan(batches):
        qT = qmat.astype(np.int32).T  # (d, m)
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(list(pdf["q_embedding"]), dtype=np.int8).astype(np.int32)
            cnorm = np.linalg.norm(cmat.astype(np.float64), axis=1)
            cnorm[cnorm == 0] = 1.0
            scores = (cmat @ qT).astype(np.float64) / cnorm[:, None] / qnorm[None, :]
            top = min(keep, len(pdf))
            # deterministic batch-local cut: pre-sort rows by neighbor_id,
            # then a STABLE per-column argsort orders each query's rows by
            # (-score, neighbor_id) — score ties at the cut always survive
            # by smaller id, so the global top-k is partitioning-invariant
            # (argpartition kept ties by arbitrary array position)
            nid = pdf["neighbor_id"].to_numpy()
            order = np.argsort(nid, kind="stable")
            nid, scores = nid[order], scores[order]
            part = np.argsort(-scores, axis=0, kind="stable")[:top]
            rows = {
                "query_id": np.repeat(qids, top),
                "neighbor_id": nid[part.T.ravel()],
                "cos": scores[part.T.ravel(), np.repeat(np.arange(len(qids)), top)],
            }
            yield pd.DataFrame(rows)

    scored = cq.mapInPandas(scan, schema).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    if rerank_shortlist is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos")
        )
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(rerank_shortlist))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nvec"),
    )
    # shortlist (|Q|·shortlist rows) + query vectors broadcast onto the
    # corpus scan — the corpus side never shuffles for the re-rank
    rer = nv.join(
        F.broadcast(short.join(F.broadcast(qv), "query_id")), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qvec"), F.col("nvec")).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# --- product quantization (PQ) ANN ------------------------------------------


def _plan_string(df: DataFrame) -> str:
    """Formatted physical-plan string (what ``df.explain("formatted")``
    prints) — returned instead of printed so tests can lint plans."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_rows: int = 2048,
    iters: int = 10,
    seed: int = 7,
    distributed: bool | None = None,
    max_train_rows: int = 262_144,
    plan_log: list | None = None,
):
    """Train PQ codebooks: split the (L2-normalized) vector into ``m``
    subspaces and k-means each to ``k`` centroids (Jégou, Douze &
    Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
    2011). Returns a ``(m, k, dim//m)`` float64 codebook array that
    rides in UDF closures like a broadcast (k·dim doubles — KBs).

    Sampling is a HASH-PRIORITY filter (``sampling._priority`` — the
    same GF(2³¹−1) affine the deterministic samplers use): a stateless
    per-row predicate, NO global sort anywhere in the training plan
    (the former ``orderBy(id).limit(n)`` shuffled the whole corpus just
    to pick a sample — a 100 TB scale-killer; ``plan_log`` lets tests
    lint the plans for Sort operators).

    Two training paths behind one contract:

    - **small corpus / default bench path**: collect the ~``sample_rows``
      hash-sampled vectors (bounded — the IVF-centroid pattern) and run
      Lloyd in numpy on the driver.
    - **distributed** (``distributed=True`` or auto when the corpus
      exceeds ``max_train_rows``): the sample STAYS a DataFrame (capped
      at ~``max_train_rows`` expected rows, far more training data than
      the driver path can hold); each Lloyd round assigns codes in one
      Arrow pass and recomputes all m·k centroids with one
      ``groupBy(subspace, code, pos).avg`` — partial aggregation
      applies, and the per-round driver collect is m·k·sub = k·dim
      doubles (KBs — the bounded-scalar discipline of PageRank/CC).
      Init is the k smallest-(priority, id) sampled rows, fetched via
      top-k (TakeOrderedAndProject over the sample, not a Sort).
    """
    import numpy as np

    from distributed_computing_platform_mapreduce_spark.operators.sampling import sample_rate

    n = corpus.count()  # one bounded-scalar job (the CC-checksum pattern)
    if n == 0:
        raise ValueError("pq_train: corpus is empty")
    if distributed is None:
        distributed = n > max_train_rows

    base = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    target = max_train_rows if distributed else sample_rows
    rate = min(1.0, target / n)
    samp = sample_rate(base, id_col, rate, seed=seed)
    if plan_log is not None:
        plan_log.append(_plan_string(samp))

    if not distributed:
        rows = samp.collect()
        if not rows:
            # tiny corpus + aggressive rate: retry without sampling, but
            # CAPPED — the escape hatch must preserve the bounded-collect
            # contract (an uncapped base.collect() here would be the one
            # path able to pull the whole corpus to the driver) — and
            # DETERMINISTIC: a bare limit() picks partition-layout-
            # dependent rows, so select the smallest-(priority, id) rows
            # exactly like the distributed init (TakeOrderedAndProject,
            # never a Sort) so the codebook is layout-independent
            from distributed_computing_platform_mapreduce_spark.operators.sampling import _priority

            rows = (
                base.orderBy(_priority(id_col, seed).asc(), F.col(id_col).asc())
                .limit(sample_rows)
                .collect()
            )
        rows.sort(key=lambda r: r[id_col])  # layout-independent order
        mat = np.array([r["v"] for r in rows], dtype=np.float64)
        nn_, dim = mat.shape
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        sub = dim // m
        books = np.zeros((m, k, sub))
        for j in range(m):
            x = mat[:, j * sub : (j + 1) * sub]
            # deterministic seeding: evenly strided sample rows
            cent = x[(np.arange(k) * max(1, nn_ // k)) % nn_].copy()
            for _ in range(iters):  # Lloyd
                d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for c in range(k):
                    pts = x[a == c]
                    if len(pts):
                        cent[c] = pts.mean(axis=0)
            books[j] = cent
        return books

    return _pq_train_distributed(
        samp, id_col, m=m, k=k, iters=iters, seed=seed, plan_log=plan_log
    )


def _pq_train_distributed(
    samp: DataFrame,
    id_col: str,
    m: int,
    k: int,
    iters: int,
    seed: int,
    plan_log: list | None = None,
):
    """Distributed Lloyd over a sampled ``(id, v array<double>)``
    DataFrame — see :func:`pq_train`. The sample is normalized once and
    persisted (it is re-scanned every round); centroid state lives on
    the driver as a (m, k, sub) array refreshed from one bounded
    aggregate per round."""
    import numpy as np

    from distributed_computing_platform_mapreduce_spark.operators.sampling import _priority
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(samp.sparkSession)

    head = samp.select(F.size("v").alias("d")).limit(1).collect()
    dim = head[0]["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    nrm = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x, lambda s: F.sqrt(s)
    )
    safe_nrm = F.when(nrm > 0, nrm).otherwise(F.lit(1.0))
    normed = samp.select(
        F.col(id_col),
        F.transform("v", lambda x: x / safe_nrm).alias("v"),
    ).persist()
    try:
        # init pool: a bounded top-N by (priority, id) — planned as
        # TakeOrderedAndProject (never a full Sort); strided rows from
        # the id-sorted pool seed each subspace exactly like the numpy
        # path, so distributed training starts from the same quality
        # of seeding and Lloyd refines over far more data
        pool_n = max(k, min(2048, 128 * k))
        init_df = normed.orderBy(
            _priority(id_col, seed + 1).asc(), F.col(id_col).asc()
        ).limit(pool_n)
        if plan_log is not None:
            plan_log.append(_plan_string(init_df))
        init_rows = sorted(init_df.collect(), key=lambda r: r[id_col])
        pool = np.array([r["v"] for r in init_rows], dtype=np.float64)
        if len(pool) < k:  # fewer sampled rows than centroids: tile
            reps = -(-k // max(1, len(pool)))
            pool = np.tile(pool, (reps, 1))[:k]
        stride_idx = (np.arange(k) * max(1, len(pool) // k)) % len(pool)
        init = pool[stride_idx]
        books = np.stack(
            [init[:, j * sub : (j + 1) * sub].copy() for j in range(m)]
        )  # (m, k, sub)

        pos = F.posexplode("v").alias("pos", "x")
        for it in range(iters):
            bks = books  # rebind for closure capture per round

            # smallint, NOT tinyint: ivf_train runs this path at
            # n_centroids ≫ 127 (the 32k-centroid regime the IVF
            # docstring recommends); int8 codes would wrap negative and
            # silently scatter the centroid update across wrong rows
            @F.pandas_udf("array<smallint>")
            def assign(s: pd.Series) -> pd.Series:
                if len(s) == 0:
                    return pd.Series([], dtype=object)
                mat = np.array(list(s), dtype=np.float64)
                codes = np.empty((len(mat), m), dtype=np.int16)
                # row-chunked distance loop (r15, guide §5.1): the
                # broadcast temp is chunk·k·sub doubles instead of
                # n·k·sub — at the docstring's 32k-centroid regime a
                # full 10k-row Arrow batch would allocate n·k·sub ≈
                # 160 GB; chunking bounds it at ~512·k·sub while the
                # per-element arithmetic (and hence every code) stays
                # identical.
                ch = 512
                for j in range(m):
                    x = mat[:, j * sub : (j + 1) * sub]
                    bk = bks[j][None, :, :]
                    for lo in range(0, len(mat), ch):
                        xc = x[lo : lo + ch]
                        d2 = ((xc[:, None, :] - bk) ** 2).sum(axis=2)
                        codes[lo : lo + ch, j] = d2.argmin(axis=1).astype(
                            np.int16
                        )
                return pd.Series(list(codes))

            # UDF in its OWN projection, the generator in the next one
            # (r15, guide §4.1): with assign(v) and posexplode(v) in a
            # single select the UDF lands ABOVE the Generate and is
            # re-evaluated once per EXPLODED row — dim× (64×) the work
            # and dim× the Arrow traffic, measured 669 s vs 10 s on the
            # round-0 aggregate. Split this way the ArrowEvalPython
            # plans BELOW the Generate (one evaluation per sample row,
            # codes ride through the explode); pinned by
            # test_pq_train_assign_udf_evaluates_before_explode.
            agg_df = (
                normed.select(assign("v").alias("codes"), "v")
                .select("codes", pos)
                .select(
                    (F.col("pos") / sub).cast("int").alias("j"),
                    F.pmod("pos", F.lit(sub)).alias("p"),
                    F.element_at("codes", (F.col("pos") / sub).cast("int") + 1).alias(
                        "code"
                    ),
                    "x",
                )
                .groupBy("j", "code", "p")
                .agg(F.avg("x").alias("mean"))
            )
            if plan_log is not None and it == 0:
                plan_log.append(_plan_string(agg_df))
            means = agg_df.collect()  # bounded: ≤ m·k·sub = k·dim rows
            nxt = books.copy()  # empty clusters keep their centroid
            for r in means:
                nxt[r["j"], r["code"], r["p"]] = r["mean"]
            books = nxt
        return books
    finally:
        normed.unpersist()


def pq_assign(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte centroid ids (array<tinyint>
    — dim·8 bytes → m bytes, a 32–64× compression of the scan working
    set). One Arrow pass, codebooks in the closure, no shuffle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    books = codebooks
    if np.asarray(books).shape[1] > 127:
        raise ValueError(
            "pq_assign stores codes as tinyint (the 32-64x compression "
            f"contract); k={np.asarray(books).shape[1]} > 127 cannot be "
            "represented — use k <= 127 subspace centroids (PQ quality "
            "comes from more subspaces m, not bigger k)"
        )

    @pandas_udf("array<tinyint>")
    def assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(x, dtype=np.float64) for x in s])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        mm_, kk, sub = books.shape
        codes = np.empty((len(mat), mm_), dtype=np.int8)
        for j in range(mm_):
            x = mat[:, j * sub : (j + 1) * sub]
            d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1).astype(np.int8)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(id_col).alias("neighbor_id"), assign(F.col(vec_col)).alias(out_col)
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 32,
    rerank: bool = True,
) -> DataFrame:
    """PQ ANN with asymmetric distance (ADC) + exact re-rank — the
    production pattern: the PQ code scan is 32–64× lighter than the raw
    corpus, prunes to a per-query ``shortlist``, and an exact cosine
    pass over only the shortlisted ids restores near-perfect top-k.

    Per Arrow batch the ADC is a pure table lookup: each query
    precomputes an (m × k) inner-product LUT against the codebooks
    (queries are bounded and ride in the closure, like the int8/IVF
    paths), and a batch's approximate IP is ``sum_j LUT[j, code_j]`` —
    numpy fancy indexing, no per-row Python. Batch-local top-shortlist
    bounds the shuffle exactly like :func:`cosine_topk_int8`. With
    ``rerank=False`` returns the raw ADC ranking (scores are
    approximate IPs on normalized vectors, NOT exact cosines)."""
    import numpy as np

    if codebooks is None:
        codebooks = pq_train(corpus, id_col, vec_col, m=m, k=n_codes)
    books = np.asarray(codebooks)
    mm_, kk, sub = books.shape

    qrows = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )  # bounded query set (same contract as the other ANN variants)
    if not qrows:
        return cosine_topk_exact(corpus, queries, id_col, vec_col, k)
    qids = [r["query_id"] for r in qrows]
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qmat /= qn
    # (n_queries, m, k) inner-product lookup tables
    luts = np.stack(
        [qmat[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(mm_)], axis=1
    )

    codes_df = pq_assign(corpus, books, id_col, vec_col)
    id_dtype = dict(codes_df.dtypes)["neighbor_id"]
    keep = int(shortlist)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["pq_codes"]), dtype=np.int64)  # (b, m)
            # approx_ip[b, q] = sum_j luts[q, j, codes[b, j]]
            ip = np.zeros((len(codes), len(qids)))
            for j in range(mm_):
                ip += luts[:, j, codes[:, j]].T  # (b, n_queries)
            top = min(keep, len(codes))
            # stable (-score, neighbor_id) cut — same determinism contract
            # as cosine_topk_int8's scan (partitioning-invariant ties)
            nid = pdf["neighbor_id"].to_numpy()
            order = np.argsort(nid, kind="stable")
            nid, ip = nid[order], ip[order]
            part = np.argsort(-ip, axis=0, kind="stable")[:top]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, top),
                    "neighbor_id": nid[part.T.ravel()],
                    "adc_ip": ip[part.T.ravel(), np.repeat(np.arange(len(qids)), top)],
                }
            )

    scored = codes_df.mapInPandas(
        scan, f"query_id {id_dtype}, neighbor_id {id_dtype}, adc_ip double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_ip").desc(), F.col("neighbor_id"))
    short = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= keep
    )
    if not rerank:
        return short.select("query_id", "neighbor_id", "rank", F.col("adc_ip").alias("cos"))
    # exact re-rank: join the shortlist back to true vectors — the join
    # touches only |Q|·shortlist rows, never the corpus
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(qid, [float(x) for x in qmat[i]]) for i, qid in enumerate(qids)],
        f"query_id {id_dtype}, qvec array<double>",
    )
    exact = (
        short.select("query_id", "neighbor_id")
        .join(cvecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Mean-pool vectors per group → ``(group_col, out_col
    array<double>, n_pooled long)`` — the chunk→document aggregation of
    an embedding pipeline (embed chunk_tokens output, pool back to one
    vector per document; also the classic sentence-embedding readout).

    Plan shape: ``posexplode`` + ``groupBy(group, pos).avg`` (partial
    aggregation — the shuffle carries groups·dim rows, not vectors),
    then one more groupBy reassembles the array in position order. With
    ``normalize`` the pooled vector is L2-unit (what cosine retrieval
    wants)."""
    pos = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    means = pos.groupBy(group_col, "pos").agg(
        F.avg("col").alias("m"), F.count("*").alias("__n")
    )
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
    )
    pooled = means.groupBy(group_col).agg(
        arr.alias(out_col), F.max("__n").alias("n_pooled")
    )
    if not normalize:
        return pooled
    nrm = F.sqrt(
        F.aggregate(F.col(out_col), F.lit(0.0), lambda a, x: a + x * x)
    )
    safe = F.when(nrm > 0, nrm).otherwise(F.lit(1.0))
    return pooled.withColumn(out_col, F.transform(out_col, lambda x: x / safe))
