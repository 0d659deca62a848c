"""End-to-end training-data curation recipe — the composition the
individual operators exist for.

A production corpus pipeline is a fixed sequence over raw documents:
language gate → quality gate → model-based quality score → exact dedup
→ transitive near-dedup → (optionally) a reproducible per-stratum
sample. Every stage here is one of this package's operators, so the
recipe is a thin, inspectable composition — no new physics, just the
canonical order with the intermediate column contract spelled out. The
reference has nothing comparable (its closest artifact is the wordcount
demo); this is the "beyond the reference" north-star surface assembled.

Scale notes: the stages are independent Spark plans chained on
DataFrames, so Catalyst fuses the scan-side filters (lang/quality gates
push into the parquet scan) and each expensive stage (LM counts, LSH,
CC) keeps its own documented shuffle structure. Nothing collects to the
driver; the output is a DataFrame the caller writes or samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators import (
    dedup,
    quality,
    sampling,
    text,
)


def curation_recipe(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    langs: list[str] | None = None,
    boilerplate_max_docs: int | None = None,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    gopher_rules: bool = False,
    pii_redact: bool = False,
    decontaminate_against: DataFrame | None = None,
    quality_model=None,
    quality_model_threshold: float = 0.5,
    lm_percentile_floor: float = 0.1,
    lm_logp_min: float | None = None,
    near_dup_threshold: float = 0.5,
    sample_per_stratum: int | None = None,
    strata_cols: list[str] | None = None,
    sample_seed: int = 11,
) -> DataFrame:
    """Curate a raw document table into a training corpus.

    Stages (each skippable by its parameter):

    1. **Language gate** — keep rows whose ``lang_id`` prediction is in
       ``langs`` (None = keep all).
    1b. **Boilerplate removal** — strip paragraphs repeated in more than
       ``boilerplate_max_docs`` documents
       (``dedup.remove_repeated_paragraphs``; None skips). Runs before
       the token/LM gates so boilerplate doesn't pad a thin doc past
       them; docs stripped to nothing fall out at the token gate.
    2. **Heuristic quality gate** — ≥ ``min_tokens`` whitespace tokens
       and ≤ ``max_punct_ratio`` punctuation ratio.
    2b. **Gopher rule gate** (r6, ``gopher_rules=True``) — keep only
       docs passing the full Rae-et-al rule set
       (``quality.gopher_quality_flags``: word-count + mean-word-length
       bounds, symbol/bullet/ellipsis ratios, duplicate-line
       fractions). Off by default — the registered driver query keeps
       its exact DuckDB oracle; the combined path is pytest-covered.
    2c. **PII redaction** (r6, ``pii_redact=True``) — rewrite the text
       column through ``quality.redact_pii`` (emails/IPv4s/phone runs)
       BEFORE dedup/LM stages, so identical docs differing only in
       contact details dedup together and the LM never trains on PII.
    2d. **Decontamination** (r6, ``decontaminate_against=<eval df>``) —
       drop docs sharing any 8-gram with the eval corpus
       (``quality.decontaminate``); None skips.
    2e. **Model quality gate** (late-r6, ``quality_model=<fitted
       PipelineModel>``) — keep docs the trained classifier
       (``classifier.train_quality_classifier``) scores ≥
       ``quality_model_threshold``: the FineWeb-Edu-style learned
       filter beside the heuristic ones. Map-side only (broadcast
       model), adds no shuffle; None skips.
    3. **LM quality floor** — drop the bottom ``lm_percentile_floor``
       fraction by corpus-trained bigram cross-entropy
       (``text.bigram_lm_scores``); 0 skips. The cutoff is an
       ``approx_percentile`` broadcast scalar, not a driver collect.
       ``lm_logp_min`` is the ABSOLUTE-cutoff alternative (None skips):
       drop docs scoring strictly below the constant. Unlike the
       percentile form (approx_percentile is engine-specific by
       design), the absolute form is exactly replayable in another
       engine, which is what lets the registered ``curation_recipe``
       driver query carry a full DuckDB oracle. Both floors skip docs
       with <2 tokens (no bigrams → unscored → pass through), and when
       BOTH are set they read one shared corpus-trained model (r6: a
       doc drops if it fails either; previously the absolute floor
       silently retrained on the percentile-filtered corpus).
    4. **Exact dedup** — one survivor (min id) per identical text.
    5. **Near-dedup** — MinHash-LSH pairs at ``near_dup_threshold`` →
       two-star connected components → min-id survivor per component
       (``dedup.dedup_survivors_cc``).
    6. **Reproducible sample** — exact ``sample_per_stratum`` rows per
       ``strata_cols`` stratum via the deterministic GF(2³¹−1) draw
       (None skips; layout-independent by construction).

    Returns the curated DataFrame with the original columns.
    """
    out = docs
    if langs:
        out = out.filter(text.lang_id(F.col(text_col)).isin(langs))
    if boilerplate_max_docs is not None:
        out = dedup.remove_repeated_paragraphs(
            out, id_col, text_col, max_docs=boilerplate_max_docs
        )
    if min_tokens > 0 or max_punct_ratio < 1.0:
        toks = text.token_count_ws(F.col(text_col))
        punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", "")) / F.greatest(
            F.length(F.col(text_col)), F.lit(1)
        )
        out = out.filter((toks >= min_tokens) & (punct <= max_punct_ratio))
    if gopher_rules:
        flags = quality.gopher_quality_flags(out, id_col, text_col)
        keep = flags.filter(F.col("passes")).select(F.col("id").alias(id_col))
        out = out.join(keep, id_col, "left_semi")
    if pii_redact:
        red = quality.redact_pii(out, id_col, text_col).select(
            F.col("id").alias(id_col), "text_redacted"
        )
        out = (
            out.drop(text_col)
            .join(red, id_col)
            .withColumnRenamed("text_redacted", text_col)
        )
    if decontaminate_against is not None:
        flagged = quality.decontaminate(out, decontaminate_against, id_col, text_col)
        drop = flagged.filter(F.col("contaminated")).select(F.col("id").alias(id_col))
        out = out.join(drop, id_col, "left_anti")
    if quality_model is not None:
        from distributed_computing_platform_mapreduce_spark.operators import classifier

        out = classifier.quality_gate(
            out, quality_model, quality_model_threshold, id_col, text_col
        )
    if lm_percentile_floor > 0 or lm_logp_min is not None:
        # ONE LM pipeline serves both floors (r6 review finding: the
        # previous sequential form built two full bigram/unigram count
        # pipelines when both were set, and silently retrained the
        # second on the percentile-filtered corpus). Both predicates now
        # read the SAME corpus-trained scores; a doc drops if it fails
        # either. Anti-join on the DROP set, not semi-join on the keep
        # set: docs with <2 tokens have no bigrams and are absent from
        # `scores` by contract, so a semi-join would turn the LM floor
        # into a hidden >=2-token gate even when the caller relaxed
        # min_tokens. Unscored docs pass through; only measurably-bad
        # docs drop.
        scores = text.bigram_lm_scores(out, id_col, text_col)
        bad = F.lit(False)
        if lm_percentile_floor > 0:
            cutoff = scores.agg(
                F.expr(
                    f"approx_percentile(avg_logp, {lm_percentile_floor}, 10000)"
                ).alias("c")
            )
            scores = scores.crossJoin(F.broadcast(cutoff))
            bad = bad | (F.col("avg_logp") < F.col("c"))
        if lm_logp_min is not None:
            bad = bad | (F.col("avg_logp") < F.lit(lm_logp_min))
        drop = scores.filter(bad).select(F.col("id").alias(id_col))
        out = out.join(drop, id_col, "left_anti")
    out = dedup.dedup_exact(out, [text_col], id_col)
    if near_dup_threshold < 1.0:
        pairs = dedup.minhash_lsh_pairs(
            out, id_col, text_col, threshold=near_dup_threshold
        )
        out = dedup.dedup_survivors_cc(out, pairs, id_col)
    if sample_per_stratum is not None:
        out = sampling.stratified_sample_exact(
            out, strata_cols or ["lang"], id_col, sample_per_stratum, seed=sample_seed
        )
    return out
