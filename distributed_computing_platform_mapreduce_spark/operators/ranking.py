"""Lexical ranking operators: TF-IDF and BM25 over the documents table.

The reference's closest capability is wordcount (term frequency alone,
``/root/reference/applications/wc-maple.py``); these are the full
relevance-scoring pipelines a training-data platform uses for corpus
curation (query-focused filtering, quality-weighted sampling, dedup
tie-breaking by informativeness).

Scale shape (100 TB):
- tokenize → (doc, term) counts: one shuffle on (doc, term), partial
  aggregation map-side; identical to wordcount's profile.
- document frequency: one shuffle on term (partial agg again). The df
  table is |vocabulary|-sized — orders of magnitude smaller than the
  corpus — and joins back to postings on term; AQE broadcasts it when
  it fits, else it's an ordinary co-partitioned equi-join.
- corpus constants (N, avgdl) are single-row aggregates — broadcast
  scalars, not driver collects.
- everything is JVM expressions (no Python in the hot path); ``ln`` is
  fine here because scores are verified with tolerance, not hashed
  (Java and C libm differ in the last ulp — the reason these are NOT
  registered as hash-compared driver oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) postings: whitespace tokens, raw counts."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """TF-IDF postings: (id, term, tf, df, tfidf) with the smooth idf
    ``ln((N+1)/(df+1)) + 1`` (sklearn's ``smooth_idf`` convention — no
    division by zero, unseen-term-proof)."""
    tc = term_counts(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    dfreq = tc.groupBy("term").agg(F.countDistinct("id").alias("df"))
    return (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0))
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document to a bag of query terms:
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    with the standard Robertson–Sparck Jones idf
    ``ln(1 + (N−df+0.5)/(df+0.5))``. Documents matching no term are
    absent (score would be 0).

    ``query_terms`` is a driver-side literal list (a query is small by
    definition); it becomes an IN filter that Catalyst places directly
    above the token explode — below every aggregate and exchange
    (verified in the executed plan) — so only matching postings ever
    shuffle.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    tc = term_counts(df, id_col, text_col).filter(F.col("term").isin(query_terms))
    doclen = (
        df.select(
            F.col(id_col).alias("id"),
            F.size(
                F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("dl"),
        )
    )
    consts = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    dfreq = tc.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (F.lit(k1) + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tc.join(F.broadcast(dfreq), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(consts))
        .select("id", (idf * tf_norm).alias("partial"))
        .groupBy("id")
        .agg(F.sum("partial").alias("bm25"))
    )


def bm25_scores_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 for a TABLE of queries at once — (query_id, id, bm25), one
    plan, no per-query driver loop: the batch shape a retrieval-style
    curation job runs (thousands of probe queries against the corpus).

    ``queries`` is (query_id, term) postings. The corpus-side postings
    are computed ONCE; the query table (small by definition) broadcasts
    onto them, so corpus postings still shuffle only on their own keys
    and adding queries adds no scan. idf is corpus-wide per term —
    identical to ``bm25_scores``, and the two are asserted equal
    per-query in tests.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(term_col).alias("term")
    ).distinct()
    tc = term_counts(df, id_col, text_col)
    doclen = df.select(
        F.col(id_col).alias("id"),
        F.size(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("dl"),
    )
    consts = doclen.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    # df(term) over the terms any query mentions — vocabulary-sized
    dfreq = (
        tc.join(F.broadcast(q.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (F.lit(k1) + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tc.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(consts))
        .select("query_id", "id", (idf * tf_norm).alias("partial"))
        .groupBy("query_id", "id")
        .agg(F.sum("partial").alias("bm25"))
    )
