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


def media_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    kind_col: str = "kind",
    image_max_hamming: int = 6,
    audio_max_hamming: int = 7,
    video_max_hamming: int = 6,
    video_every_n: int = 2,
    video_min_frame_matches: int = 1,
    blocks: int = 8,
) -> DataFrame:
    """Cross-modality near-dup pairs ``(id_a, id_b)`` over one mixed
    media table: images → bidirectional dHash, audio → band-energy
    fingerprints, video → sampled-frame dHash rollups — three print
    pipelines feeding the SAME ``dedup.hamming_pairs`` pigeonhole block
    join, unioned. Pairs never cross modalities (each leg sees only its
    ``kind``), undecodable payloads drop leg-side; media in no pair
    survive any downstream CC trivially. Scale shape unchanged from the
    single-modality operators: payloads are decoded once per leg and
    everything that shuffles is 16-byte print rows."""
    from distributed_computing_platform_mapreduce_spark.operators import multimodal as mm

    imgs = media.filter(F.col(kind_col) == "image")
    auds = media.filter(F.col(kind_col) == "audio")
    vids = media.filter(F.col(kind_col) == "video")
    return (
        mm.image_neardup_pairs(
            imgs, max_hamming=image_max_hamming, blocks=blocks, id_col=id_col
        )
        .select("id_a", "id_b")
        .unionAll(
            mm.audio_neardup_pairs(
                auds, max_hamming=audio_max_hamming, blocks=blocks, id_col=id_col
            ).select("id_a", "id_b")
        )
        .unionAll(
            mm.video_neardup_pairs(
                vids,
                max_hamming=video_max_hamming,
                every_n=video_every_n,
                min_frame_matches=video_min_frame_matches,
                blocks=blocks,
                id_col=id_col,
            ).select("id_a", "id_b")
        )
    )


def multimodal_curation_recipe(
    docs: DataFrame,
    media: DataFrame,
    link: DataFrame | None = None,
    id_col: str = "doc_id",
    media_id_col: str = "media_id",
    text_col: str = "text",
    image_max_hamming: int = 6,
    audio_max_hamming: int = 7,
    video_max_hamming: int = 6,
    video_every_n: int = 2,
    video_min_frame_matches: int = 1,
    blocks: int = 8,
    **text_kwargs,
) -> DataFrame:
    """:func:`curation_recipe` extended across modalities — the full
    composition a multimodal training corpus runs: every text stage
    (gates, decontamination, LM floors, exact + transitive text dedup)
    PLUS media near-dedup (image/audio/video prints →
    ``hamming_pairs`` → connected components → min-id survivor).

    Policy, consistent with the text side: one min-id survivor per
    media near-dup component; a document survives iff its text survives
    every text stage AND none of its media is a dropped (non-survivor)
    member of a media component. ``link`` maps docs to media as
    ``(id_col, media_id_col)`` rows; None means ``media_id == doc_id``
    (the synthesized-fixture convention). Docs with no media pass the
    media stage vacuously; media in no pair drop nothing.

    Scale shape: the text recipe keeps its per-stage shuffle structure;
    the media stage adds one decode pass per modality, the shared
    16-byte-print block join, and a CC whose edge set is the candidate
    pairs — the doc-level verdict is two semi/anti joins on ids."""
    if link is None and id_col == media_id_col:
        raise ValueError(
            "multimodal_curation_recipe: with link=None the default doc↔media "
            f"mapping aliases media's {media_id_col!r} to {id_col!r} — equal "
            "names would produce a duplicate column; pass an explicit link"
        )
    text_kept = curation_recipe(
        docs, id_col=id_col, text_col=text_col, **text_kwargs
    )
    pairs = media_neardup_pairs(
        media,
        id_col=media_id_col,
        image_max_hamming=image_max_hamming,
        audio_max_hamming=audio_max_hamming,
        video_max_hamming=video_max_hamming,
        video_every_n=video_every_n,
        video_min_frame_matches=video_min_frame_matches,
        blocks=blocks,
    )
    media_ids = media.select(media_id_col).distinct()
    surviving_media = dedup.dedup_survivors_cc(media_ids, pairs, media_id_col)
    dropped_media = media_ids.join(surviving_media, media_id_col, "left_anti")
    lnk = (
        link
        if link is not None
        else media.select(
            F.col(media_id_col).alias(id_col), F.col(media_id_col)
        ).distinct()
    )
    dropped_docs = (
        lnk.join(dropped_media, media_id_col, "left_semi").select(id_col).distinct()
    )
    return text_kept.join(dropped_docs, id_col, "left_anti")
