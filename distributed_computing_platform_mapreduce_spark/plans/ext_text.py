"""Text-analysis extension queries: stats/quality/lang-ID, curation
recipes, bigram-LM and BM25 ranking, URL/unicode normalization, and
schema validation (split out of plans/extensions.py in r12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators import (
    curation,
    multimodal,
    quality,
    ranking,
    text,
)
from distributed_computing_platform_mapreduce_spark.operators.text import _URL_RE as _URL_PATTERN
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

#: Pinned merge list for the driver-checked GPT-2-greedy BPE encode leg
#: (r12, VERDICT stretch #7). Deterministic and corpus-independent, so
#: both engines compute a pure function of the text; chosen to fire
#: multi-level merge chains on English tokens, including glued-symbol
#: reuse (t+h → th+e → the+</w>) and EOW-suffix merges.
PINNED_BPE_MERGES = [
    ("e", "</w>"), ("t", "h"), ("th", "e"), ("s", "</w>"), ("d", "</w>"),
    ("the", "</w>"), ("i", "n"), ("a", "n"), ("o", "n"), ("e", "r"),
    ("an", "d"), ("and", "</w>"), ("in", "g"), ("ing", "</w>"), ("o", "f"),
    ("of", "</w>"), ("t", "o"), ("to", "</w>"), ("e", "n"), ("o", "u"),
]


def _bpe_oracle_ctes() -> str:
    """DuckDB replay of ``bpe._encode_word``'s GPT-2 greedy loop as a
    recursive CTE: per word, find the lowest-rank adjacent pair
    (``list_position`` over the rank-ordered key list), then merge every
    left-to-right non-overlapping occurrence via ``list_reduce`` over a
    chr(31)-joined accumulator (replacing the last accumulated token
    when (last, next) == (left, right) — the same non-overlap semantics
    as the operator's ``_merge_once`` i+=2 skip, because the glued token
    can never string-equal ``left``: that would need right = '').
    Terminal states (no pair present) aggregate to the per-doc token
    count and the md5 fingerprint of the chr(31)-joined flat token
    stream — bit-comparable with the Spark leg. ``coalesce`` on the
    empty-prefix concat: DuckDB's array_to_string([]) is NULL, not ''."""
    pairs = ",".join(
        f"({r}, '" + l.replace("'", "''") + "', '" + rt.replace("'", "''") + "')"
        for r, (l, rt) in enumerate(PINNED_BPE_MERGES, start=1)
    )
    return f"""
    bpem AS (
      SELECT list(lft || chr(31) || rgt ORDER BY rnk) AS keys
      FROM (VALUES {pairs}) v(rnk, lft, rgt)
    ),
    bpew AS (
      SELECT doc_id, wpos, list_append([x FOR x IN string_split(word, '')], '</w>') AS syms
      FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS word,
               generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS wpos
        FROM documents
      )
      WHERE word <> ''
    ),
    bpeenc AS (
      SELECT doc_id, wpos, syms FROM bpew
      UNION ALL
      SELECT doc_id, wpos,
        string_split(
          list_reduce(
            syms,
            (acc, x) -> CASE
              WHEN string_split(acc, chr(31))[-1] = best_l AND x = best_r
              THEN coalesce(array_to_string(string_split(acc, chr(31))[1:-2], chr(31)), '')
                   || CASE WHEN len(string_split(acc, chr(31))) > 1 THEN chr(31) ELSE '' END
                   || best_l || best_r
              ELSE acc || chr(31) || x
            END
          ), chr(31)) AS syms
      FROM (
        SELECT e.doc_id, e.wpos, e.syms,
          string_split(mk.keys[bi], chr(31))[1] AS best_l,
          string_split(mk.keys[bi], chr(31))[2] AS best_r
        FROM (
          SELECT doc_id, wpos, syms,
            list_min(list_filter(
              list_transform(
                list_zip(syms[1:-2], syms[2:]),
                p -> list_position(mk2.keys, p[1] || chr(31) || p[2])
              ), r -> r IS NOT NULL AND r > 0)) AS bi
          FROM bpeenc, bpem mk2
        ) e, bpem mk
        WHERE e.bi IS NOT NULL
      )
    ),
    bpeout AS (
      SELECT doc_id,
             CAST(sum(len(syms)) AS BIGINT) AS bpe_greedy_n,
             md5(string_agg(array_to_string(syms, chr(31)), chr(31) ORDER BY wpos))
               AS bpe_greedy_fp
      FROM bpeenc, bpem mkf
      WHERE len(list_filter(
              list_transform(list_zip(syms[1:-2], syms[2:]),
                             p -> list_position(mkf.keys, p[1] || chr(31) || p[2])),
              r -> r IS NOT NULL AND r > 0)) = 0
      GROUP BY doc_id
    )"""


@query(
    "text_stats",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, text,
             list_distinct([lower(x) FOR x IN
               list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')]) AS toks,
             list_filter(string_split(text, chr(10)), ln -> trim(ln) <> '') AS lines
      FROM documents
    ), s AS (
      SELECT doc_id, text, lines,
             len(list_intersect(toks, ['the','and','of','to','a','in','is','it','for','on'])) AS s_en,
             len(list_intersect(toks, ['el','la','de','que','y','en','un','los','se','por'])) AS s_es,
             len(list_intersect(toks, ['le','la','de','et','les','des','en','un','du','que'])) AS s_fr,
             len(list_intersect(toks, ['der','die','und','das','von','zu','mit','den','ist','im'])) AS s_de,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_words,
             list_filter(lines, ln -> len(list_filter(lines, l2 -> l2 = ln)) > 1) AS dup_lines
      FROM t
    ), g AS (
      SELECT doc_id,
             length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
               / greatest(n_words, 1)::DOUBLE AS mean_word_len,
             len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::DOUBLE
               / greatest(n_words, 1)::DOUBLE AS symbol_word_ratio,
             len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[-*•]')))::DOUBLE
               / greatest(len(lines), 1)::DOUBLE AS bullet_frac,
             len(list_filter(lines, ln -> regexp_matches(trim(ln), '(\\.\\.\\.|…)$')))::DOUBLE
               / greatest(len(lines), 1)::DOUBLE AS ellipsis_frac,
             len(dup_lines)::DOUBLE / greatest(len(lines), 1)::DOUBLE AS dup_line_frac,
             coalesce(list_sum(list_transform(dup_lines, ln -> length(ln))), 0)::DOUBLE
               / greatest(coalesce(list_sum(list_transform(lines, ln -> length(ln))), 0), 1)::DOUBLE
               AS dup_line_char_frac,
             n_words
      FROM s
    ), sh8 AS (
      SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+7], ' ') FOR i IN range(1, len(tk)-6)]) AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS tk
            FROM documents)
    ), ev AS (
      SELECT list_distinct(flatten(list(sh))) AS esh FROM sh8 WHERE doc_id % 97 = 0
    ), dec AS (
      SELECT sh8.doc_id,
             len(sh8.sh) AS n_shingles_8,
             len(list_intersect(sh8.sh, ev.esh)) AS eval_overlap_8,
             len(list_intersect(sh8.sh, ev.esh)) >= 1 AS contaminated
      FROM sh8, ev
    ),
    {bpe_ctes}
    SELECT s.doc_id,
           length(s.text) AS n_chars_computed,
           len(list_filter(regexp_split_to_array(trim(s.text), '\\s+'), t -> t <> '')) AS n_tokens,
           len(regexp_extract_all(s.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           (length(s.text) - length(regexp_replace(s.text, '[^\\w\\s]', '', 'g')))::DOUBLE
             / greatest(length(s.text), 1)::DOUBLE AS punct_ratio,
           len(list_filter(regexp_split_to_array(trim(s.text), '\\s+'),
                           t -> list_contains(['the','and','of','to','a','in','is','it','for','on'], lower(t))))::DOUBLE
             / greatest(len(list_filter(regexp_split_to_array(trim(s.text), '\\s+'), t -> t <> '')), 1)::DOUBLE
             AS stopword_ratio,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(s.text[i]) AS BIGINT) FOR i IN range(1, len(s.text)+1)]),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS fp,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                ELSE 'de' END AS lang_pred,
           g.mean_word_len, g.symbol_word_ratio, g.bullet_frac, g.ellipsis_frac,
           g.dup_line_frac, g.dup_line_char_frac,
           (g.n_words >= 50 AND g.n_words <= 100000
            AND g.mean_word_len >= 3.0 AND g.mean_word_len <= 10.0
            AND g.symbol_word_ratio <= 0.1
            AND g.bullet_frac <= 0.9 AND g.ellipsis_frac <= 0.3
            AND g.dup_line_frac <= 0.3 AND g.dup_line_char_frac <= 0.2)
             AS gopher_passes,
           dec.n_shingles_8, dec.eval_overlap_8, dec.contaminated,
           bpeout.bpe_greedy_n, bpeout.bpe_greedy_fp
    FROM s JOIN g USING (doc_id) JOIN dec USING (doc_id) JOIN bpeout USING (doc_id)
    """.replace("{bpe_ctes}", _bpe_oracle_ctes()),
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + token counting + fingerprinting + language ID
    + Gopher rule metrics: char count, whitespace and BPE-ish token
    counts, punctuation & stopword ratios, the polynomial rolling-hash
    fingerprint (exact integer fold), the stopword-overlap lang-ID
    argmax (deterministic first-language-wins tie-break, lexicons
    replayed in the oracle), and — folded in r6 so the quality.py
    surface is oracle-backed without registry slots — the Gopher
    metrics (mean word length, symbol/bullet/ellipsis ratios,
    duplicate-line fractions, combined ``gopher_passes``) plus the
    decontamination leg (8-gram overlap against the deterministic
    doc_id % 97 pseudo-eval subset: ``n_shingles_8``,
    ``eval_overlap_8``, ``contaminated``). The scalar features remain
    one scan of JVM expressions; the duplicate-line metrics add the
    operator's single (id, line) grouped shuffle and the
    decontamination leg its shingle join, each joined back on doc_id.
    The DuckDB twin replays the dup-line grouping and the shingle
    intersection as per-doc list comprehensions — quadratic per doc is
    fine at oracle SF. (Fingerprinting folded r4; lang-ID folded r4;
    Gopher + decontamination folded r6.)"""
    docs = load_table(spark, sf_dir, "documents")
    base = text.quality_features(
        docs, "doc_id", "text",
        extra_cols=[
            text.fingerprint(F.col("text")).alias("fp"),
            text.lang_id(F.col("text")).alias("lang_pred"),
        ],
    ).select(
        "doc_id",
        "n_chars_computed",
        "n_tokens",
        "n_bpe_tokens",
        "punct_ratio",
        "stopword_ratio",
        "fp",
        "lang_pred",
    )
    flags = quality.gopher_quality_flags(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"),
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_frac",
        "ellipsis_frac",
        "dup_line_frac",
        "dup_line_char_frac",
        F.col("passes").alias("gopher_passes"),
    )
    # decontamination leg (r6): the eval corpus is a deterministic
    # pseudo-subset of the same table (doc_id % 97 == 0) so the
    # shingle-overlap counting core is driver-hash-checked; eval member
    # docs trivially flag themselves — deterministic, fine
    evals = docs.filter(F.col("doc_id") % 97 == 0)
    dec = quality.decontaminate(docs, evals, "doc_id", "text", n=8).select(
        F.col("id").alias("doc_id"),
        F.col("n_shingles").alias("n_shingles_8"),
        F.col("n_overlap").alias("eval_overlap_8"),
        "contaminated",
    )
    # r12 (VERDICT stretch #7): the REAL GPT-2-greedy BPE encode,
    # driver-checked — `bpe.bpe_encode` under the pinned merge list is a
    # pure function of the text, and the oracle replays the full greedy
    # loop as a recursive CTE (see `_bpe_oracle_ctes`). Compared by
    # per-doc token count + md5 of the chr(31)-joined token stream, so
    # one token out of place anywhere in the corpus is a red row. (The
    # regex `n_bpe_tokens` above stays: it is the cheap JVM-side count
    # heuristic; this leg certifies the actual tokenizer.)
    from distributed_computing_platform_mapreduce_spark.operators import bpe

    enc = bpe.bpe_encode(docs, PINNED_BPE_MERGES, out_col="bpe_greedy").select(
        "doc_id",
        F.col("n_bpe_greedy").cast("long").alias("bpe_greedy_n"),
        F.md5(F.encode(F.concat_ws("\x1f", "bpe_greedy"), "UTF-8")).alias(
            "bpe_greedy_fp"
        ),
    )
    return base.join(flags, "doc_id").join(dec, "doc_id").join(enc, "doc_id")


@query(
    "curation_recipe",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, text, lang, source,
             list_distinct([lower(x) FOR x IN
               list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')]) AS dtoks,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS ntok,
             length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
               / greatest(length(text), 1)::DOUBLE AS pr
      FROM documents
    ),
    sc AS (
      SELECT *,
             len(list_intersect(dtoks, ['the','and','of','to','a','in','is','it','for','on'])) AS s_en,
             len(list_intersect(dtoks, ['el','la','de','que','y','en','un','los','se','por'])) AS s_es,
             len(list_intersect(dtoks, ['le','la','de','et','les','des','en','un','du','que'])) AS s_fr,
             len(list_intersect(dtoks, ['der','die','und','das','von','zu','mit','den','ist','im'])) AS s_de
      FROM t
    ),
    gated AS MATERIALIZED (
      SELECT doc_id, text, lang, source FROM sc
      WHERE (CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                  WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                  ELSE 'de' END) IN ('en', 'es')
        AND ntok >= 12 AND pr <= 0.3
    ),
    ltoks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS a
      FROM gated
    ),
    bi AS (
      SELECT doc_id,
             unnest([a[i] FOR i IN range(1, len(a))]) AS w1,
             unnest([a[i + 1] FOR i IN range(1, len(a))]) AS w2
      FROM ltoks
    ),
    big AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
    uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM bi GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT term)::BIGINT AS v
      FROM (SELECT unnest(a) AS term FROM ltoks)
    ),
    lm AS (
      SELECT bi.doc_id, avg(ln((c12 + 1.0) / (c1 + 1.0 * v))) AS lp
      FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab
      GROUP BY bi.doc_id
    ),
    floored AS MATERIALIZED (
      SELECT g.* FROM gated g
      WHERE g.doc_id NOT IN (SELECT doc_id FROM lm WHERE lp < -3.46)
    ),
    ded AS MATERIALIZED (
      SELECT * FROM floored
      WHERE doc_id IN (SELECT min(doc_id) FROM floored GROUP BY text)
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM ded)
    ),
    -- r10 oracle-scaling rewrite (same results): inverted-index
    -- intersection counts + MATERIALIZED shared stages, so the full
    -- recipe oracle runs at sf0.1 inside the parity guard
    sizes AS MATERIALIZED (SELECT doc_id, len(s) AS sz FROM sh),
    shx AS (SELECT doc_id, unnest(s) AS sg FROM sh),
    cand AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM shx a JOIN shx b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cand
      JOIN sizes za ON za.doc_id = cand.id_a
      JOIN sizes zb ON zb.doc_id = cand.id_b
      WHERE inter::DOUBLE / (za.sz + zb.sz - inter)::DOUBLE >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS MATERIALIZED (
      SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src
    ),
    survivors AS MATERIALIZED (
      SELECT * FROM ded
      WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    ),
    sampled AS (
      SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                          doc_id
               ) AS rk
        FROM survivors)
      WHERE rk <= 10
    )
    SELECT 'text' AS leg, doc_id, lang, source FROM sampled
    UNION ALL
    SELECT 'multimodal', doc_id, lang, source FROM sampled
    WHERE NOT (doc_id % 2 = 0 AND doc_id >= 2 AND doc_id < 500)
    """,
)
def curation_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation chain a real training-data pipeline runs,
    tagged legs (r9 fold promotes the multimodal composition from
    pytest-only to a full driver oracle):

    - **text** (``operators/curation.curation_recipe``, driver-checked
      as ONE composition since r6): language gate (stopword argmax ∈
      {en, es}) → heuristic gates (≥12 tokens, punct ratio ≤ 0.3) →
      absolute bigram-LM floor (avg_logp ≥ −3.46; the ``lm_logp_min``
      form exists precisely because an absolute cutoff is
      cross-engine-replayable where approx_percentile is not — margins
      to the nearest doc score measured ≥ 9e−5 at sf0.001/0.01/0.1 vs
      ~1e−13 cross-libm jitter) → exact dedup (min-id per text) →
      MinHash-LSH + two-star CC transitive near-dedup (recall-100%
      operating point, same subset argument as ``dedup_cc_survivors``:
      filtered-corpus pairs ⊆ full-corpus pairs and band collisions are
      pairwise properties) → deterministic GF(2³¹−1) stratified sample
      (10 per source, seed 11). The boilerplate stage is configured
      off: this corpus has no paragraph separators (measured zero
      newlines), so its oracle twin would be vacuous — the stage keeps
      its own differential pytest.
    - **multimodal** (``curation.multimodal_curation_recipe``): the
      same text chain PLUS media near-dedup across all three modalities
      — docs 2–499 get synthesized media through the
      ``media_neardup_suite`` fixtures (modality by doc_id % 3: PPM
      image + lossless-PNG twin / melody WAV + gain-0.5 re-master /
      8-frame y4m + 5-frame truncation), prints → shared hamming block
      join at that suite's MEASURED margin constants (image ≤ 6, audio
      ≤ 1, video ≤ 4 with all-5-frames) → CC → min-id survivor. The
      link wires EVEN fixture docs to their twin (a dropped component
      member — the doc must die) and ODD docs to their base (the
      survivor — the doc must live), so the oracle replays the media
      verdict as id arithmetic on top of the text CTE chain. Not
      circular for the same reason as ``media_neardup_suite``: a broken
      codec/print changes the pair set, which changes which docs die,
      which hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    recipe_kwargs = dict(
        langs=["en", "es"],
        min_tokens=12,
        max_punct_ratio=0.3,
        lm_percentile_floor=0.0,
        lm_logp_min=-3.46,
        near_dup_threshold=0.5,
        sample_per_stratum=10,
        strata_cols=["source"],
        sample_seed=11,
    )
    text = curation.curation_recipe(docs, **recipe_kwargs).select(
        F.lit("text").alias("leg"), "doc_id", "lang", "source"
    )

    fix = (
        docs.select("doc_id")
        .filter((F.col("doc_id") >= 2) & (F.col("doc_id") < 500))
        .repartition(32)
    )
    img_d = fix.filter(F.pmod("doc_id", F.lit(3)) == 0)
    aud_d = fix.filter(F.pmod("doc_id", F.lit(3)) == 1)
    vid_d = fix.filter(F.pmod("doc_id", F.lit(3)) == 2)
    tw = F.col("media_id") + F.lit(10_000_000)
    media = (
        multimodal.media_from_documents(img_d, width=32, height=32)
        .unionAll(
            multimodal.media_from_documents(
                img_d, width=32, height=32, codec="png"
            ).withColumn("media_id", tw)
        )
        .unionAll(multimodal.audio_from_documents(aud_d, n_samples=8000, synth="melody"))
        .unionAll(
            multimodal.audio_from_documents(
                aud_d, n_samples=8000, synth="melody", gain=0.5
            ).withColumn("media_id", tw)
        )
        .unionAll(
            multimodal.video_from_documents(vid_d, n_frames=8, width=16, height=16)
        )
        .unionAll(
            multimodal.video_from_documents(
                vid_d, n_frames=5, width=16, height=16
            ).withColumn("media_id", tw)
        )
    )
    link = fix.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0, F.col("doc_id") + F.lit(10_000_000)
        )
        .otherwise(F.col("doc_id"))
        .alias("media_id"),
    )
    mm_leg = curation.multimodal_curation_recipe(
        docs,
        media,
        link=link,
        image_max_hamming=6,
        audio_max_hamming=1,
        video_max_hamming=4,
        video_every_n=1,
        video_min_frame_matches=5,
        blocks=8,
        **recipe_kwargs,
    ).select(F.lit("multimodal").alias("leg"), "doc_id", "lang", "source")
    return text.unionAll(mm_leg)


@query(
    "text_ngram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS a
      FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest([a[i] FOR i IN range(1, len(a))]) AS w1,
             unnest([a[i + 1] FOR i IN range(1, len(a))]) AS w2
      FROM toks
    ),
    big AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
    uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM bi GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT term)::BIGINT AS v
      FROM (SELECT unnest(a) AS term FROM toks)
    )
    SELECT bi.doc_id,
           count(*)::BIGINT AS n_bigrams,
           round(avg(ln((c12 + 1.0) / (c1 + 1.0 * v))), 6) AS avg_logp_r
    FROM bi
    JOIN big USING (w1, w2)
    JOIN uni USING (w1)
    CROSS JOIN vocab
    GROUP BY bi.doc_id
    """,
)
def text_ngram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-1 bigram-LM cross-entropy per document — the
    CCNet-style quality-filtering signal (new r5; see
    ``operators/text.bigram_lm_scores``).

    Same tolerance-banding contract as ``ranking_bm25``: the per-bigram
    probabilities are exact integer-derived IEEE divisions on both
    engines, so only ``ln``'s cross-libm ulp and the mean's summation
    order jitter (~1e-13 relative) separate Spark from DuckDB — rounding
    the mean to 6 decimals absorbs both. Docs with fewer than 2 tokens
    have no transitions and are absent on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    scores = text.bigram_lm_scores(docs, "doc_id", "text", alpha=1.0)
    return scores.select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("avg_logp", 6).alias("avg_logp_r"),
    )


@query(
    "ranking_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
      FROM documents
    ),
    tc AS (
      SELECT id, term, count(*)::BIGINT AS tf
      FROM (SELECT id, unnest(ts) AS term FROM toks)
      WHERE term IN ('join', 'hash', 'window')
      GROUP BY id, term
    ),
    dl AS (SELECT id, len(ts)::BIGINT AS dl FROM toks),
    consts AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT term, count(DISTINCT id)::BIGINT AS df FROM tc GROUP BY term)
    SELECT tc.id AS doc_id,
           round(sum(
             ln(1.0 + (n - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1.0))
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS bm25_r
    FROM tc
    JOIN dfreq USING (term)
    JOIN dl ON dl.id = tc.id
    CROSS JOIN consts
    GROUP BY tc.id
    """,
)
def ranking_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to the query bag
    ``join hash window`` (three corpus-frequent terms → every SF scores
    a large fraction of the table; k1=1.2, b=0.75).

    Driver-visible since r5 via the tolerance-banding trick
    ``approx_ops`` established: Java's and C's ``ln`` differ by ≤1 ulp
    (~1e-16 relative), and float summation order adds similar jitter, so
    raw scores can't be hash-compared across engines — but scores
    ROUNDED to 6 decimals are stable under 1e-15-scale noise (scores
    are O(1–10); a boundary crossing would need a score within 1e-9 of
    a half-ulp-of-round boundary). The oracle replays the identical
    Robertson–Sparck Jones formula in DuckDB and rounds the same. The
    underlying operator (``operators/ranking.py``) returns full-precision
    scores; rounding happens only at this driver boundary."""
    docs = load_table(spark, sf_dir, "documents")
    scores = ranking.bm25_scores(docs, "doc_id", "text", ["join", "hash", "window"])
    return scores.select(
        F.col("id").alias("doc_id"), F.round("bm25", 6).alias("bm25_r")
    )


def _url_fixture_sql() -> str:
    """The deterministic URL synthesis, as DuckDB SQL — the Spark twin in
    ``text_normalize_url_suite_q`` builds the IDENTICAL strings, so the
    oracle replays extraction on the same inputs."""
    return """
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'https://User:Pw@WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
                           || '.Example.COM:8443/a/' || CAST(doc_id AS VARCHAR)
                           || '?q=' || CAST(doc_id AS VARCHAR) || '#f'
               WHEN 1 THEN 'http://sub.deep.site' || CAST(doc_id % 7 AS VARCHAR)
                           || '.example.co/path/' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN 'ftp://files.archive.org'
               WHEN 3 THEN 'http://h:8a/p'
               ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents
    """


@query(
    "text_normalize_url_suite",
    # The URL leg replays THE SAME regex pattern (deliberately
    # RE2-compatible — no lookahead) via DuckDB regexp_extract on
    # identically-synthesized inputs; the normalize leg replays Unicode
    # NFC + lower + whitespace-collapse via nfc_normalize. Malformed
    # inputs (doc_id%5 ∈ {3,4}) exercise the fail-whole contract.
    oracle=f"""
    WITH u AS ({{url_fixture}}),
    p AS (
      SELECT doc_id,
             regexp_extract(url, '{_URL_PATTERN}', 1) AS scheme,
             lower(regexp_extract(url, '{_URL_PATTERN}', 2)) AS host,
             regexp_extract(url, '{_URL_PATTERN}', 3) AS rawport,
             regexp_extract(url, '{_URL_PATTERN}', 4) AS path,
             regexp_extract(url, '{_URL_PATTERN}', 5) AS query,
             regexp_extract(url, '{_URL_PATTERN}', 6) AS fragment
      FROM u
    ),
    parts AS (
      SELECT doc_id, 'scheme' AS part, scheme AS value FROM p
      UNION ALL SELECT doc_id, 'host', host FROM p
      UNION ALL
      SELECT doc_id, 'registered_domain',
             CASE WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                  ELSE host END
      FROM p
      UNION ALL
      SELECT doc_id, 'port',
             CASE WHEN rawport <> ''
                       AND TRY_CAST(rawport AS BIGINT) BETWEEN 0 AND 65535
                  THEN CAST(TRY_CAST(rawport AS BIGINT) AS VARCHAR)
                  ELSE '-1' END
      FROM p
      UNION ALL SELECT doc_id, 'path', path FROM p
      UNION ALL SELECT doc_id, 'query', query FROM p
      UNION ALL SELECT doc_id, 'fragment', fragment FROM p
    )
    SELECT 'url' AS leg, doc_id, part, value FROM parts
    UNION ALL
    SELECT 'normalize', doc_id, 'normalized',
           trim(regexp_replace(lower(nfc_normalize('  CAFÉ\t' || text)),
                               '\\s+', ' ', 'g'))
    FROM documents
    """.replace("{url_fixture}", _url_fixture_sql()),
)
def text_normalize_url_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + Unicode text normalization as tagged legs, melted to
    ``(leg, doc_id, part, value)`` rows (r8 — the r7 crop's two pure
    text operators promoted to driver oracles):

    - ``url``: deterministic per-doc URL synthesis (valid forms with
      userinfo/port/query/fragment, a malformed ``http://h:8a/p``
      authority that must fail WHOLE, and non-URLs) →
      ``text.extract_url_parts`` (one JVM regexp scan, codegen, no
      Python) → 7 part rows per doc. The oracle runs THE SAME regex —
      the pattern is deliberately RE2-compatible so both engines parse
      identically, malformed inputs included.
    - ``normalize``: ``text.normalize_text`` (Arrow-batched
      ``unicodedata`` pass) over each document prefixed with a
      decomposed ``CAFE`` + combining acute + mixed whitespace — NFC
      composes, lowercase maps É→é, whitespace collapses; the oracle is
      DuckDB ``nfc_normalize``/``lower``/``regexp_replace``, i.e. two
      INDEPENDENT Unicode implementations agreeing byte-for-byte.
      Scope note: the whitespace-collapse equivalence holds for ASCII
      whitespace (this corpus) — the operator's Python ``str.split``
      also collapses UNICODE whitespace (NBSP etc.), which RE2's
      ASCII ``\\s`` in the oracle would keep; the operator's unicode
      behavior is the intended contract, the oracle checks it where
      the two definitions coincide.

    Scale shape: the URL leg is a pure scan-side projection; the
    normalize leg is one Arrow pass — neither shuffles (the melt is an
    explode of a 7-element literal array)."""
    from distributed_computing_platform_mapreduce_spark.operators.text import (
        extract_url_parts,
        normalize_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = (
        F.when(d % 5 == 0, F.concat(
            F.lit("https://User:Pw@WWW.Site"), (d % 7).cast("string"),
            F.lit(".Example.COM:8443/a/"), d.cast("string"),
            F.lit("?q="), d.cast("string"), F.lit("#f")))
        .when(d % 5 == 1, F.concat(
            F.lit("http://sub.deep.site"), (d % 7).cast("string"),
            F.lit(".example.co/path/"), d.cast("string")))
        .when(d % 5 == 2, F.lit("ftp://files.archive.org"))
        .when(d % 5 == 3, F.lit("http://h:8a/p"))
        .otherwise(F.concat(F.lit("not a url "), d.cast("string")))
    )
    parsed = extract_url_parts(docs.select("doc_id", url.alias("url")), "url")
    url_leg = parsed.select(
        F.lit("url").alias("leg"),
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("part"), F.col(p).cast("string").alias("value"))
                    for p in (
                        "scheme", "host", "registered_domain", "port",
                        "path", "query", "fragment",
                    )
                ]
            )
        ).alias("pv"),
    ).select("leg", "doc_id", "pv.part", "pv.value")

    mangled = docs.select(
        "doc_id", F.concat(F.lit("  CAFÉ\t"), F.col("text")).alias("mangled")
    )
    norm_leg = normalize_text(
        mangled, "mangled", form="NFC", lower=True, collapse_whitespace=True
    ).select(
        F.lit("normalize").alias("leg"),
        "doc_id",
        F.lit("normalized").alias("part"),
        F.col("mangled").alias("value"),
    )
    return url_leg.unionAll(norm_leg)


@query(
    "validate_suite",
    oracle="""
    SELECT 'not_null(value)' AS check_name,
           (SELECT count(*) FROM events WHERE value IS NULL) AS violations,
           (SELECT count(*) FROM events WHERE value IS NULL) = 0 AS ok
    UNION ALL
    SELECT 'in_range(value,0.0,100.0)',
           (SELECT count(*) FROM events WHERE value < 0.0 OR value > 100.0),
           (SELECT count(*) FROM events WHERE value < 0.0 OR value > 100.0) = 0
    UNION ALL
    SELECT 'accepted_values(event_type)',
           (SELECT count(*) FROM events
            WHERE event_type NOT IN ('click', 'view', 'purchase')),
           (SELECT count(*) FROM events
            WHERE event_type NOT IN ('click', 'view', 'purchase')) = 0
    UNION ALL
    SELECT 'matches(event_type)',
           (SELECT count(*) FROM events WHERE NOT regexp_matches(event_type, '^[a-z]+$')),
           (SELECT count(*) FROM events WHERE NOT regexp_matches(event_type, '^[a-z]+$')) = 0
    UNION ALL
    SELECT 'unique(event_id)',
           (SELECT count(*) FROM (
              SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)),
           (SELECT count(*) FROM (
              SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)) = 0
    UNION ALL
    SELECT 'unique(user_id,event_type)',
           (SELECT count(*) FROM (
              SELECT user_id, event_type FROM events
              GROUP BY user_id, event_type HAVING count(*) > 1)),
           (SELECT count(*) FROM (
              SELECT user_id, event_type FROM events
              GROUP BY user_id, event_type HAVING count(*) > 1)) = 0
    UNION ALL
    SELECT 'foreign_key(user_id->c_custkey)',
           (SELECT count(*) FROM events e
            WHERE e.user_id IS NOT NULL
              AND e.user_id NOT IN (SELECT c_custkey FROM customer)),
           (SELECT count(*) FROM events e
            WHERE e.user_id IS NOT NULL
              AND e.user_id NOT IN (SELECT c_custkey FROM customer)) = 0
    """,
)
def validate_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data validation, driver-checked (r8): a seven-
    expectation suite over the events table — not-null, range,
    accepted-values, regex, two uniqueness keys, and referential
    integrity against customer — run through ``validate.validate`` and
    emitted as the bounded ``(check_name, violations, ok)`` report.
    Range and accepted-values are deliberately violated by the corpus
    (values above 100; the signup/error event types) so the counts are
    non-vacuous exact numbers, not all-zeros.

    Scale shape (the operator's contract, plan-linted in pytest): ALL
    row-level checks fuse into ONE aggregate over one scan; each
    uniqueness key costs one groupBy; the FK check is one left-anti
    join against distinct parent keys. The report is one row per check
    — the bounded-driver-scalar discipline."""
    from distributed_computing_platform_mapreduce_spark.operators import validate as V

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    report = V.validate(
        events,
        checks=[
            V.not_null("value"),
            V.in_range("value", 0.0, 100.0),
            V.accepted_values("event_type", ["click", "view", "purchase"]),
            V.matches("event_type", "^[a-z]+$"),
        ],
        unique=[["event_id"], ["user_id", "event_type"]],
        foreign_keys=[("user_id", customer, "c_custkey")],
    )
    rows = [(r["check"], r["violations"], r["ok"]) for r in report.results]
    return spark.createDataFrame(rows, "check_name string, violations long, ok boolean")
