"""Model-based document quality scoring (Spark MLlib).

The heuristic gates in ``operators/quality.py`` (Gopher rules, LM
floors) are rule-based; modern curation pipelines add a TRAINED
quality classifier on top — FineWeb-Edu's educational-value scorer,
CCNet's LM filter, fastText quality models. This module is that stage,
expressed Spark-first: ``pyspark.ml``'s distributed estimators do the
training (tokenize → feature-hash → logistic regression — the same
hashing trick as ``similarity.embed_texts``, here via MLlib's
``HashingTF``), so fitting runs as Spark jobs over the corpus, the
fitted model is a broadcast-sized coefficient vector, and scoring is
one map-side transform with no shuffle.

At 100 TB: training typically runs on a labeled SAMPLE (labels are
expensive — often another model's outputs), which is corpus-scale-free;
scoring is embarrassingly parallel (hash + dot product per doc).
L-BFGS in MLlib aggregates gradients tree-wise per iteration — the
bounded-driver-scalar discipline (one coefficient vector per round)
that two-star CC, PageRank and BPE training follow.

Labels for tests/fixtures are synthesized deterministically (natural
text vs shuffled-alphabet gibberish); a deployment swaps in human or
teacher-model labels — the pipeline contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 4096,
    reg_param: float = 0.001,
    max_iter: int = 50,
):
    """Fit tokenize → HashingTF → LogisticRegression on labeled docs
    (label 1.0 = keep-quality). Returns the fitted PipelineModel —
    deterministic for fixed inputs (L-BFGS from a zero start, hash
    features; no random init anywhere)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+", minTokenLength=1
            ),
            HashingTF(inputCol="__toks", outputCol="__features", numFeatures=n_features),
            LogisticRegression(
                featuresCol="__features",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Score documents with a fitted classifier → (id_col, out_col) with
    out_col = P(label=1 | text). Map-side only: tokenizer, hash and the
    coefficient dot product all run in the scan stage — no shuffle, no
    driver involvement beyond the broadcast model."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(id_col, text_col))
    return scored.select(
        id_col,
        vector_to_array("probability").getItem(1).alias(out_col),
    )


def quality_gate(
    docs: DataFrame,
    model,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep docs the classifier scores ≥ threshold — the model-based
    analogue of ``quality.gopher_gate``, composable with the curation
    recipe (a left-semi join on the scored id set, so the caller's
    columns pass through untouched)."""
    keep = score_quality(docs, model, id_col, text_col).filter(
        F.col("quality_score") >= threshold
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


def synth_labeled_corpus(spark, n_per_class: int = 200, seed: int = 7) -> DataFrame:
    """Deterministic labeled fixture: label 1 = natural-ish English
    sentences assembled from a small vocabulary; label 0 = gibberish
    with the SAME length distribution (so length alone can't separate —
    the classifier must use the token distribution)."""
    words = (
        "the of and to in is for on with as data model training quality text "
        "document corpus filter learn spark engine query scale test value"
    ).split()
    rows = []
    state = seed * 2654435761 % (1 << 31)

    def nxt() -> int:
        nonlocal state
        state = (state * 1103515245 + 12345) % (1 << 31)
        return state

    # a fixed gibberish VOCABULARY (not per-token noise): held-out docs
    # must contain tokens the model has seen, else unseen hash buckets
    # leave every gibberish score at the prior and the split is
    # unlearnable by construction
    gibberish = [
        "".join(chr(97 + nxt() % 26) for _ in range(3 + nxt() % 6))
        for _ in range(len(words))
    ]
    for i in range(n_per_class):
        n = 8 + nxt() % 10
        good = " ".join(words[nxt() % len(words)] for _ in range(n))
        bad = " ".join(gibberish[nxt() % len(gibberish)] for _ in range(n))
        rows.append((2 * i, good, 1.0))
        rows.append((2 * i + 1, bad, 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def nearest_centroid_classify(
    labeled: DataFrame,
    targets: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Rocchio / nearest-centroid classification over an embedding
    column: per-class mean vectors from the labeled corpus, cosine
    argmax for each target → ``(id_col, predicted_label, score)``.

    Spark shape: the centroids come from ONE distributed pass —
    ``posexplode`` the vectors and ``groupBy(label, pos).avg`` (partial
    aggregation applies; the shuffle carries n_labels·dim rows, not the
    corpus) — then ride to executors as a closure matrix (n_labels ×
    dim — KBs, the IVF-centroid pattern); scoring is one numpy GEMM per
    Arrow batch with no shuffle. The cheap, surprisingly-strong
    baseline for embedding-space labeling (topic tagging, source
    attribution) before anything trained."""
    import numpy as np

    means = (
        labeled.select(label_col, F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy(label_col, "pos")
        .agg(F.avg("col").alias("m"))
        .collect()
    )  # bounded: n_labels × dim rows
    if not means:
        raise ValueError("nearest_centroid_classify: labeled set is empty")
    by_label: dict = {}
    for r in means:
        by_label.setdefault(r[label_col], {})[r["pos"]] = r["m"]
    labels = sorted(by_label)
    dim = max(max(d) for d in by_label.values()) + 1
    cmat = np.array([[by_label[lb].get(p, 0.0) for p in range(dim)] for lb in labels])
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cmat /= norms

    import pandas as pd

    id_dtype = dict(targets.select(id_col).dtypes)[id_col]
    # predicted_label keeps labeled's label dtype (string labels are as
    # legitimate as ints — knn_classify already preserves them)
    label_dtype = dict(labeled.select(label_col).dtypes)[label_col]

    def pick(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (mat / n) @ cmat.T
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "predicted_label": pd.Series(
                        [labels[b] for b in best], dtype=object
                    ),
                    "score": sims[np.arange(len(best)), best],
                }
            )

    return targets.select(id_col, vec_col).mapInPandas(
        pick, f"{id_col} {id_dtype}, predicted_label {label_dtype}, score double"
    )


def knn_classify(
    labeled: DataFrame,
    targets: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    search=None,
) -> DataFrame:
    """k-NN classification by cosine: majority label among each
    target's ``k`` nearest labeled vectors (ties → smaller label, so
    the output is deterministic) → ``(id_col, predicted_label, votes)``.

    Pure composition: the neighbor search IS
    ``similarity.cosine_topk_exact`` (swap in the LSH/IVF/PQ variant at
    scale — identical contract), the vote one small groupBy over
    |targets|·k rows. The lazy workhorse for label propagation when a
    labeled seed set exists (topic spreading, source attribution).

    Scale contract: ``targets`` is the QUERY side of the exact search
    and is broadcast — it must be the bounded set (≲10⁵ rows). In the
    typical label-propagation shape (small labeled seed, huge unlabeled
    corpus) that inversion matters: propagate in bounded target
    batches, or route the search through the LSH/IVF path
    (``similarity.cosine_topk_lsh`` / ``_ivf``) where the corpus side
    is bucketed instead of broadcast."""
    from distributed_computing_platform_mapreduce_spark.operators import similarity

    # neighbors come from the labeled set only (an unlabeled neighbor
    # carries no vote); cosine_topk_exact's self-exclusion keeps a
    # target that also appears in `labeled` from voting for itself
    # `search` makes the swap-in concrete: any callable with the
    # (corpus, queries, id_col=…, vec_col=…, k=…) → (query_id,
    # neighbor_id, rank, cos) contract — cosine_topk_lsh / _ivf /
    # _int8 — replaces the exact scan for unbounded target sets
    search_fn = search or similarity.cosine_topk_exact
    nn = search_fn(
        labeled.select(F.col(id_col), vec_col),
        targets,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
    )
    lab = labeled.select(F.col(id_col).alias("neighbor_id"), F.col(label_col))
    votes = (
        nn.join(lab, "neighbor_id")
        .groupBy("query_id", label_col)
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc(label_col))
    return (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            F.col("query_id").alias(id_col),
            F.col(label_col).alias("predicted_label"),
            "votes",
        )
    )


def knn_classify_batched(
    labeled: DataFrame,
    targets: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    batch_rows: int = 50_000,
    search=None,
) -> DataFrame:
    """:func:`knn_classify` for UNBOUNDED target sets — the r7 docstring
    mitigation ("propagate in bounded target batches") as code.

    Targets hash-partition into ``ceil(n / batch_rows)`` deterministic
    batches (``xxhash64(id) mod n_batches`` — expected ``batch_rows``
    rows each, no global sort, no row_number over an unpartitioned
    window); each batch runs the ordinary :func:`knn_classify`, whose
    query-side broadcast is now bounded by the batch — the exact
    backend's closure matrix is ``batch_rows × dim`` doubles regardless
    of total target count. Per-target output is IDENTICAL to the
    single-shot call (each target's neighbors depend only on the
    labeled corpus — pinned in
    ``test_knn_classify_batched_equals_single_shot``).

    Cost shape: the labeled corpus is re-scanned once per batch — the
    deliberate trade for a bounded query side. With an ANN ``search``
    backend the per-batch corpus work is the bucketed candidate join
    only; at extreme batch counts a deployment materializes each
    batch's output to the sink instead of holding one union plan (the
    one driver-side count() here is the usual bounded scalar)."""
    n = targets.count()  # one bounded-scalar job (the CC-checksum pattern)
    n_batches = max(1, -(-n // batch_rows))
    out = None
    for b in range(n_batches):
        part = targets.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_batches)) == b
        )
        res = knn_classify(
            labeled,
            part,
            id_col=id_col,
            vec_col=vec_col,
            label_col=label_col,
            k=k,
            search=search,
        )
        out = res if out is None else out.unionAll(res)
    return out
