"""Corpus quality gates: Gopher-style rules, eval-set decontamination,
PII redaction.

Three curation-pipeline stages the text-stats/bigram-LM family doesn't
cover (no reference parity to cite — the reference has no text
analysis; this extends the training-data surface of SURVEY §6):

- ``gopher_quality_flags``: the repetition/format heuristics of
  Rae et al., "Scaling Language Models: Methods, Analysis & Insights
  from Training Gopher" (arXiv:2112.11446, Table A1): word-count and
  mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis line
  fractions, duplicate-line fraction and duplicate-line character
  fraction. Everything except the duplicate-line metrics is a pure
  JVM expression over the text column (no shuffle); the duplicate-line
  metrics cost ONE shuffle on (doc_id, line-hash) — grouped counts,
  never a self-join.
- ``decontaminate``: n-gram overlap against a benchmark/eval corpus
  (the GPT-3 appendix-C style check). Eval shingles are deduplicated
  and joined against document shingles; output is per-doc overlap
  counts + a contamination verdict. The eval side is tiny by nature
  (benchmarks are KBs-MBs) but the join is left to the planner — no
  forced broadcast hint, the r5-advice lesson.
- ``redact_pii``: deterministic regex redaction of emails, IPv4s and
  phone-like digit runs, with per-doc match counts (counted on the
  ORIGINAL text; replacement applied email → IP → phone so earlier
  stages can't manufacture later-stage matches). Pure JVM
  ``regexp_replace``/``regexp_extract_all`` — embarrassingly parallel,
  zero shuffle, and the patterns avoid backreferences/lookarounds so
  an RE2-based twin (DuckDB) matches Java's semantics.

All three are DataFrame-in/DataFrame-out and scale like the text-stats
family: per-row expressions fuse into the scan; the one grouped metric
partial-aggregates before its shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators.dedup import word_shingles
from distributed_computing_platform_mapreduce_spark.operators.text import tokens as _tokens

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\-\s.]{6,}[0-9]"


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
) -> DataFrame:
    """Per-document Gopher rule metrics + a combined ``passes`` verdict.

    Output: (id, n_words, mean_word_len, symbol_word_ratio, bullet_frac,
    ellipsis_frac, dup_line_frac, dup_line_char_frac, passes). Documents
    with zero lines/words get 0.0 ratios (and fail the word-count rule).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_words = F.size(toks)
    # mean word length = non-whitespace chars / words (identical to the
    # HOF fold but stays in codegen — HOFs run interpreted)
    non_ws = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_wl = non_ws / F.greatest(n_words, F.lit(1))
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
    sym_ratio = n_symbols / F.greatest(n_words, F.lit(1)).cast("double")

    lines = F.filter(F.split(text, r"\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    ellip = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))
    bullet_frac = bullet / F.greatest(n_lines, F.lit(1)).cast("double")
    ellipsis_frac = ellip / F.greatest(n_lines, F.lit(1)).cast("double")

    base = docs.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        lines.alias("__lines"),
    )

    # duplicate-line metrics: one shuffle on (id, line); counts collapse
    # map-side, so shuffle width is O(distinct lines), not O(lines)
    per_line = base.select(
        "id", F.explode_outer("__lines").alias("__line")
    ).groupBy("id", "__line").agg(F.count("*").alias("__c"))
    dup = per_line.groupBy("id").agg(
        F.coalesce(
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
            / F.greatest(F.sum("__c"), F.lit(1)).cast("double"),
            F.lit(0.0),
        ).alias("dup_line_frac"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__c") > 1, F.col("__c") * F.length("__line")
                ).otherwise(0)
            )
            / F.greatest(F.sum(F.col("__c") * F.length("__line")), F.lit(1)).cast(
                "double"
            ),
            F.lit(0.0),
        ).alias("dup_line_char_frac"),
    )

    out = base.drop("__lines").join(dup, "id", "left").fillna(
        0.0, ["dup_line_frac", "dup_line_char_frac"]
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
    )
    return out.withColumn("passes", passes)


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    ``min_overlap`` distinct word ``n``-grams with the eval corpus.

    Output: (id, n_shingles, n_overlap, contaminated). Documents shorter
    than ``n`` tokens have zero shingles and are never flagged — the
    standard contract (GPT-3 used 13-grams; default 8 suits short test
    docs). Join strategy is the planner's choice: the eval shingle set
    is naturally small, but a forced broadcast would turn 'eval corpus
    grew' into an OOM instead of a shuffle."""
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    eval_sh = (
        eval_df.select(F.explode(word_shingles(F.col(eval_text_col), n)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        doc_sh.join(eval_sh, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("shingle")).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_overlap"),
        )
    )
    return per_doc.withColumn(
        "contaminated", F.col("n_overlap") >= F.lit(min_overlap)
    )


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails/IPv4s/phone-like runs; count matches on the
    original text. Output: (id, text_redacted, n_emails, n_ips,
    n_phones). Counts use the same patterns as the replacements, so
    `n_* == 0` implies the text is unchanged by that stage; the classes
    are NOT disjoint (an IPv4 is also a phone-like digit run, so it
    counts in both n_ips and n_phones) — redaction order settles who
    actually rewrites the span (email → IP → phone)."""
    text = F.col(text_col)
    redacted = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    redacted = F.regexp_replace(redacted, IPV4_RE, "[IP]")
    redacted = F.regexp_replace(redacted, PHONE_RE, "[PHONE]")
    return docs.select(
        F.col(id_col).alias("id"),
        redacted.alias("text_redacted"),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).alias("n_phones"),
    )
