"""Training-data-pipeline extension queries: dedup, similarity search,
text analysis, multimodal plumbing (north-star additions beyond the
reference's operator surface — SURVEY.md §2.6 last row).

Oracles: everything with exact, order-defined semantics gets a DuckDB
oracle (the rolling-hash fingerprint, exact n-gram Jaccard, language-ID
argmax, both near-dedup survivor policies, the stratified sample set,
rounded BM25 scores and bigram-LM scores, the fnv1a64-hashed SimHash
pair set, and — because their outputs are exact-verified with
measured-100%-recall operating points on this corpus — MinHash-LSH,
the LSH and IVF ANN top-k, and embedding near-dup too). Since r7 NO
rows-only query remains: ``multimodal_features`` carries a partial
oracle over its decode-derived metadata (the synthesis constants
DuckDB can replay), while the pixel/byte value features live in
``multimodal_full_features`` pinned by the pytest corpus checksum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_computing_platform_mapreduce_spark.operators import (
    classifier,
    curation,
    dedup,
    multimodal,
    packing,
    quality,
    ranking,
    sampling,
    similarity,
    text,
)
from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup, deterministic min-id survivor."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "dedup_minhash_lsh",
    # One exact-Jaccard CTE feeds BOTH legs: the two operators are
    # contractually equal on this corpus (LSH recall 100% at the
    # operating point), so the oracle is the same pair set tagged twice.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
    ),
    exact AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE >= 0.5
    )
    SELECT 'lsh' AS leg, id_a, id_b, jaccard FROM exact
    UNION ALL
    SELECT 'ngram' AS leg, id_a, id_b, jaccard FROM exact
    """,
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs ≥ 0.5 Jaccard, two tagged legs (r8 fold — one
    registry row, both operators still hash-checked):

    - ``lsh``: MinHash(32)+LSH(8 bands), banded candidates, exact
      verify — the scale path (O(n·bands) shuffle, never all-pairs).
    - ``ngram``: exact all-pairs 3-gram Jaccard via the shingle
      inverted index — the verify arithmetic the LSH leg reuses,
      formerly registered as ``dedup_ngram_jaccard``.

    Oracle-backed since r4: every LSH-emitted pair is exact-verified
    (precision 1.0 by construction) and candidate recall is 100% on
    this corpus (dup groups sit far above the j=0.5 S-curve knee —
    pinned by ``test_minhash_lsh_equals_exact_jaccard``), so BOTH legs
    equal the exact all-pairs Jaccard twin, jaccard doubles included
    (count/(a+b-c) is the same IEEE division on both engines). On
    adversarial corpora with mass exactly at the threshold the
    equality would be probabilistic — that's a property of the corpus,
    not the operator; the LSH plan itself stays O(n·bands).

    bench.py times ``filter(leg = 'lsh')`` — Catalyst prunes the other
    union branch entirely, so the headline number still measures the
    scale path alone.
    """
    docs = load_table(spark, sf_dir, "documents")
    lsh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
    ).select(F.lit("lsh").alias("leg"), "id_a", "id_b", "jaccard")
    ng = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select(F.lit("ngram").alias("leg"), "id_a", "id_b", "jaccard")
    return lsh.unionAll(ng)


@query(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')
             )) AS tok
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, list_reduce(
        list_prepend(CAST('14695981039346656037' AS HUGEINT),
          [CAST(unicode(tok[i]) AS HUGEINT) FOR i IN range(1, len(tok)+1)]),
        (acc, cp) -> ((acc - acc % 2097152
                       + CAST(xor(CAST(acc % 2097152 AS BIGINT), CAST(cp AS BIGINT)) AS HUGEINT))
                      * CAST(1099511628211 AS HUGEINT))
                     % CAST('18446744073709551616' AS HUGEINT)
      ) AS h
      FROM toks
    ),
    votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN (h // CAST(power(2, i) AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, range(64) t(i)
      GROUP BY doc_id, i
    ),
    prints AS (
      SELECT doc_id,
             sum(CASE WHEN v > 0 THEN CAST(power(2, i) AS HUGEINT)
                      ELSE CAST(0 AS HUGEINT) END) AS fp
      FROM votes GROUP BY doc_id
    ),
    signed AS (
      SELECT doc_id,
             CAST(fp - CASE WHEN fp >= CAST(power(2, 63) AS HUGEINT)
                            THEN CAST('18446744073709551616' AS HUGEINT)
                            ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS s
      FROM prints
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM signed a JOIN signed b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 of 64 bits, block-LSH).

    Parameters satisfy the pigeonhole recall guarantee blocks ≥
    max_hamming + 1 (4 ≥ 3+1): any pair within hamming 3 must agree on
    at least one 16-bit block, so candidate recall is 100% — asserted
    against a brute-force hamming scan in tests.

    Oracle-backed since r6 by making the fingerprint
    CROSS-ENGINE-REPLAYABLE: the registered query hashes tokens with
    ``hash_fn="fnv1a64"`` — an FNV-1a-style integer fold over code
    points (``dedup.fnv1a64_codepoints``) that DuckDB replays exactly
    in HUGEINT arithmetic mod 2⁶⁴ (the ``sample_stratified`` GF(2³¹−1)
    replay trick widened to 64 bits; XOR touches only the low 21 bits,
    so it is expressible as subtract-low + BIGINT xor). The oracle
    rebuilds prints bit by bit (vote sums → sign → power-of-two
    recompose → two's-complement BIGINT) and emits brute-force
    all-pairs hamming ≤ 3 — equal to the block-LSH output because
    blocking is lossless by pigeonhole. Round 5 called this row
    "permanently rows-only" because DuckDB lacks xxhash64; the token
    hash was an implementation choice, not physics — the default
    operator still uses xxhash64 (JVM codegen, fastest), and the
    block-LSH-vs-brute-force property stays pinned for BOTH hash
    families in ``test_simhash_blocking_is_lossless``."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, blocks=4, hash_fn="fnv1a64"
    )


@query(
    "similarity_topk_suite",
    oracle="""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [q.e[i] * c.e[i] FOR i IN range(1, len(q.e)+1)]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [q.e[i] * q.e[i] FOR i IN range(1, len(q.e)+1)]), (x, y) -> x + y))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [c.e[i] * c.e[i] FOR i IN range(1, len(c.e)+1)]), (x, y) -> x + y)))
             AS cos
      FROM v c CROSS JOIN q WHERE c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, rank, cos FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 5
    )
    SELECT 'exact' AS method, * FROM ranked
    UNION ALL
    SELECT 'lsh' AS method, * FROM ranked
    """,
)
def similarity_topk_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force AND LSH-bucketed cosine top-5 under one driver row,
    tagged by ``method`` (folded in r5 to free a registry slot for
    ``similarity_topk_ivf`` — both checks remain intact; the oracle can
    emit the SAME exact ranking for both tags precisely because the LSH
    point is recall-saturated, which IS the claim being checked).

    Exact: broadcast query set, corpus-side scan, sequential-fold cosine
    → bit-identical doubles vs DuckDB's identical left-fold. LSH: 8
    bands × 4 planes + 1-bit multiprobe — candidate recall for the true
    top-5 is 100% on this corpus (measured 1.0, zero extras, at
    sf0.001/0.01/0.1), so its output EQUALS the exact ranking. The
    generic LSH operator stays approximate — recall-vs-cost is the
    caller's dial; the plan is the bucketed one either way (probes ≈
    bands·(1+planes)/2^planes of the corpus per query, never an
    all-pairs scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_exact(emb, queries, k=5).select(
        F.lit("exact").alias("method"), "query_id", "neighbor_id", "rank", "cos"
    )
    lsh = similarity.cosine_topk_lsh(
        emb, queries, dim=64, k=5, n_planes=4, bands=8, multiprobe=True
    ).select(F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank", "cos")
    return exact.unionAll(lsh)


@query(
    "similarity_topk_ivf",
    oracle="""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [q.e[i] * c.e[i] FOR i IN range(1, len(q.e)+1)]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [q.e[i] * q.e[i] FOR i IN range(1, len(q.e)+1)]), (x, y) -> x + y))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [c.e[i] * c.e[i] FOR i IN range(1, len(c.e)+1)]), (x, y) -> x + y)))
             AS cos
      FROM v c CROSS JOIN q WHERE c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, rank, cos FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 5
    )
    SELECT * FROM ranked
    """,
)
def similarity_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN top-5 — the third member of the family,
    oracle-backed at a recall-saturated probe count like its siblings:
    at 16 centroids × 14 probes, recall of the exact top-5 is 1.000 at
    sf0.001/0.01/0.1 (measured; ranks and cos doubles identical, same
    sequential-fold cosine). Honest caveat in the same spirit as
    ``embedding_neardup``: probing 14/16 cells saturates recall on THIS
    corpus — near-uniform random vectors, ANN's worst case — while the
    production operating point (4/16 cells ≈ 25% of the corpus per
    query, recall 0.92 measured in pytest) is the one whose cost model
    matters at 10⁹ rows; the plan shape (bounded centroid broadcast,
    cell-filtered candidate join, per-query top-k window) is identical
    at both points."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=16, n_probe=14
    )


@query(
    "embedding_neardup",
    oracle="""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [a.e[i] * b.e[i] FOR i IN range(1, len(a.e)+1)]), (x, y) -> x + y)
           / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [a.e[i] * a.e[i] FOR i IN range(1, len(a.e)+1)]), (x, y) -> x + y))
            * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [b.e[i] * b.e[i] FOR i IN range(1, len(b.e)+1)]), (x, y) -> x + y)))
           AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              [a.e[i] * b.e[i] FOR i IN range(1, len(a.e)+1)]), (x, y) -> x + y)
          / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              [a.e[i] * a.e[i] FOR i IN range(1, len(a.e)+1)]), (x, y) -> x + y))
           * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              [b.e[i] * b.e[i] FOR i IN range(1, len(b.e)+1)]), (x, y) -> x + y)))
          >= 0.4
    """,
)
def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-band hyperplane LSH.

    Oracle-backed since r5 (third promotion on the ``dedup_minhash_lsh``
    pattern): at the recall-saturated operating point registered here —
    32 bands × 2 planes — every brute-force pair at θ=0.4 is recovered
    (measured recall 1.000 at sf0.001/0.01/0.1; analytic miss
    probability per pair ≤ (1−0.631²)³² ≈ 1.6e-7 even at the threshold
    itself), and every emitted pair is exact-verified with the same
    sequential-fold cosine the DuckDB twin replays, so the output EQUALS
    the exact all-pairs scan, cos doubles included. This corpus's max
    pairwise cosine is ~0.51 (θ=0.4 is deliberately below the LSH sweet
    spot), so saturating recall costs a high candidate rate HERE — the
    plan is still the banded candidates-then-verify shape, never a cross
    join, and the operator defaults (16×24) remain the honest 10⁹-row
    cos ≥ 0.9 operating point where the bucket math prunes hard.
    Recall/precision floors for the generic parameter points stay pinned
    in ``test_embedding_neardup_precision_and_recall``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(
        emb, dim=64, threshold=0.4, bands=32, planes_per_band=2
    )


@query(
    "text_stats",
    oracle="""
    WITH t AS (
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
    )
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
           dec.n_shingles_8, dec.eval_overlap_8, dec.contaminated
    FROM s JOIN g USING (doc_id) JOIN dec USING (doc_id)
    """,
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
    return base.join(flags, "doc_id").join(dec, "doc_id")


@query(
    "knn_label_propagation",
    # DuckDB replays the full pipeline: all-pairs cosine (same left-fold
    # as similarity_topk_suite → bit-identical doubles), top-5 by
    # (cos desc, neighbor_id), majority vote with the (votes desc,
    # label asc) tie-break. Hash compares only integer outputs
    # (vec_id, predicted_label, votes) — fp jitter can't leak in.
    oracle="""
    WITH v AS (
      SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings
    ),
    labeled AS (SELECT * FROM v WHERE vec_id % 20 <> 0),
    targets AS (SELECT * FROM v WHERE vec_id % 20 = 0),
    scored AS (
      SELECT t.vec_id AS query_id, l.vec_id AS neighbor_id, l.label,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [t.e[i] * l.e[i] FOR i IN range(1, len(t.e)+1)]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [t.e[i] * t.e[i] FOR i IN range(1, len(t.e)+1)]), (x, y) -> x + y))
              * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 [l.e[i] * l.e[i] FOR i IN range(1, len(l.e)+1)]), (x, y) -> x + y)))
             AS cos
      FROM targets t CROSS JOIN labeled l WHERE l.vec_id <> t.vec_id
    ),
    topk AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= 5
    ),
    votes AS (SELECT query_id, label, count(*) AS votes FROM topk GROUP BY query_id, label)
    SELECT query_id AS vec_id, label AS predicted_label, votes FROM (
      SELECT query_id, label, votes,
             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rk
      FROM votes
    ) WHERE rk = 1
    """,
)
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label propagation (``classifier.knn_classify``): every 20th
    vector is the unlabeled target batch, the rest the labeled seed set;
    each target takes the majority label of its 5 nearest labeled
    neighbors by cosine, ties broken (votes desc, label asc) so the
    output is a pure function of the table. The neighbor search is
    ``similarity.cosine_topk_exact`` (bounded targets broadcast, corpus
    scanned once map-side); the vote is one |targets|·k-row groupBy —
    the LSH/IVF/PQ variants swap in for unbounded target sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    labeled = emb.filter(F.col("vec_id") % 20 != 0)
    targets = emb.filter(F.col("vec_id") % 20 == 0)
    return classifier.knn_classify(labeled, targets, k=5).withColumn(
        "votes", F.col("votes").cast("long")
    )


def multimodal_full_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY feature column (``multimodal.FEATURE_SCHEMA``) over the
    four-modality synthesized media table: genuine P6 images, genuine
    baseline-JPEG images (pure-numpy Huffman+DCT codec in
    operators/jpeg.py), genuine RIFF/WAV PCM-16 clips AND genuine
    YUV4MPEG2 Cmono video, all deterministically seeded by doc_id and
    decoded for real in one Arrow-batched schema-stable pass.

    This is the pytest surface: the byte/pixel-value features
    (n_bytes, byte_mean, px_mean, rms, peak, …) are functions of the
    pseudo-random payload bytes with no ANSI-SQL twin, so they are
    pinned by ``test_multimodal_features_exact_contract``'s corpus
    checksum instead of a driver oracle. The registered driver query
    below projects this down to the oracle-checkable metadata leg."""
    docs = load_table(spark, sf_dir, "documents")
    media = (
        multimodal.media_from_documents(docs)
        .unionAll(multimodal.media_from_documents(docs, codec="jpeg"))
        .unionAll(multimodal.audio_from_documents(docs))
        .unionAll(multimodal.video_from_documents(docs))
    )
    return multimodal.extract_features(media)


@query(
    "multimodal_features",
    # r7: the formerly rows-only row now carries a REAL (partial) oracle.
    # The decode-derived metadata — modality tag, pixel dimensions,
    # channel count, duration — are pure functions of the synthesis
    # parameters (16×16 images, 800 samples @ 8 kHz mono, 8 frames @
    # 4 fps), so DuckDB replays them as constants per document. The check
    # is NOT circular: the Spark side round-trips real encoded bytes
    # through the real codecs — a broken decoder yields 'fallback'/-1
    # rows and the hash mismatches. Pixel/byte VALUE features stay
    # pytest-pinned (see multimodal_full_features).
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind, 'ppm' AS decoded,
           CAST(16 AS INTEGER) AS px_width, CAST(16 AS INTEGER) AS px_height,
           CAST(0.0 AS DOUBLE) AS duration_s
    FROM documents
    UNION ALL
    SELECT doc_id, 'image', 'jpeg', 16, 16, 0.0 FROM documents
    UNION ALL
    SELECT doc_id, 'audio', 'wav', 1, -1, 0.1 FROM documents
    UNION ALL
    SELECT doc_id, 'video', 'y4m', 16, 16, 2.0 FROM documents
    """,
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checked metadata leg of the multimodal pipeline: one row
    per (document × modality), with the decode tag and decoded
    shape/duration — EXACTLY 4 × count(documents) rows by construction
    (the r6 count contract, now oracle-enforced rather than prose)."""
    return multimodal_full_features(spark, sf_dir).select(
        "media_id", "kind", "decoded", "px_width", "px_height", "duration_s"
    )


@query(
    "image_neardup",
    # Constants-replay partial oracle (the multimodal_features pattern
    # applied to PAIR STRUCTURE): every twin is a re-encode of the SAME
    # synthesized pixels, so the expected pair set is exactly the twin
    # relation — replayable as id arithmetic. NOT circular: the Spark
    # side decodes three real codecs and block-joins real 64-bit prints;
    # a broken decoder/hash either drops pairs (rows mismatch) or admits
    # cross-image pairs (hash mismatch).
    oracle="""
    SELECT doc_id AS id_a, doc_id + 10000000 AS id_b
    FROM documents WHERE doc_id >= 2 AND doc_id < 500
    """,
)
def image_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dedup, driver-checked end to end (r8): synthesize PPM
    images, pair each with a re-encoded twin — PNG (lossless) for even
    ids, baseline JPEG q95 (lossy requant) for odd — then decode →
    bidirectional dHash → ``dedup.hamming_pairs`` pigeonhole block join
    at hamming ≤ 6.

    The operating corpus pins ``doc_id ∈ [2, 500)`` so the margin is a
    measured INVARIANT across every sf dir (all three ship docs 0–499+):
    twin distances ≤ 3 (369/500 at 0), nearest non-twin pair at 11 —
    the threshold 6 sits mid-gap, making the emitted pair set EXACTLY
    the twin relation the oracle replays. ``doc_id < 2`` is excluded
    because ``synth_pixels`` seeds 0 and 1 identically (``seed or 1``) —
    a fixture degeneracy, not an operator property. Full-scale evidence
    (5000 docs × resize twins at sf0.1) is the bench's ``image_neardup``
    point; transform recall (resize/JPEG/PNG families) is pinned in
    pytest. Scale shape: prints are 16 B/image after one Arrow decode
    pass — the block join shuffles blocks·n short rows, never pixels."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") >= 2) & (F.col("doc_id") < 500))
        .repartition(32)  # spread Python-side decode across cores
    )
    base = multimodal.media_from_documents(docs, width=32, height=32)
    png = multimodal.media_from_documents(
        docs.filter(F.col("doc_id") % 2 == 0), width=32, height=32, codec="png"
    )
    jpg = multimodal.media_from_documents(
        docs.filter(F.col("doc_id") % 2 == 1), width=32, height=32, codec="jpeg"
    )
    twins = png.unionAll(jpg).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    pairs = multimodal.image_neardup_pairs(
        base.unionAll(twins), max_hamming=6, blocks=8
    )
    return pairs.select("id_a", "id_b")


@query(
    "dedup_survivors",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE >= 0.5
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
    """,
)
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup with a pair-dominated drop POLICY: a document
    survives iff it is not the higher-id member of any ≥θ near-dup pair.

    This is deliberately NOT transitive-closure dedup — in a chain
    A~B~C with no (A,C) pair, C is dropped via (B,C) even though B is
    dropped too; but a doc whose only near-dups have higher ids always
    survives. The policy is deterministic and SQL-expressible, hence the
    exact oracle. Since r4 the pair source IS the scale path —
    ``minhash_lsh_pairs`` (banded LSH, no all-pairs self-join); the
    exact-Jaccard oracle still applies because LSH candidate recall is
    100% on this corpus (pinned by
    ``test_minhash_lsh_equals_exact_jaccard``)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "source")


@query(
    "dedup_cc_survivors",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE >= 0.5
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
    comp AS (
      SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    """,
)
def dedup_cc_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE transitive-closure near-dedup — the composition a real LLM
    data pipeline runs: ``minhash_lsh_pairs`` (banded candidates, exact
    verify, no all-pairs self-join) → ``connected_components_twostar``
    (alternating large/small-star, O(log n) rounds, per-round
    localCheckpoint; asserted equal to min-label propagation on
    generated graphs) → one min-id survivor per component. In a chain A~B~C the whole cluster collapses to A even
    though (A,C) was never a pair — exactly where the pair-dominated
    ``dedup_survivors`` policy differs. Oracle: DuckDB ``WITH RECURSIVE``
    transitive closure over the exact-Jaccard graph; equivalent because
    LSH candidate recall is 100% on this corpus and CC converges (raises
    otherwise). Semantics anchor: the reference's only dedup is the E9
    last-write race (``/root/reference/src/MapReduceMaster.java:371-374``);
    this is the real thing at 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
    )
    return dedup.dedup_survivors_cc(docs, pairs, "doc_id").select(
        "doc_id", "lang", "source"
    )


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
    gated AS (
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
    floored AS (
      SELECT g.* FROM gated g
      WHERE g.doc_id NOT IN (SELECT doc_id FROM lm WHERE lp < -3.46)
    ),
    ded AS (
      SELECT * FROM floored
      WHERE doc_id IN (SELECT min(doc_id) FROM floored GROUP BY text)
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM ded)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE >= 0.5
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
    comp AS (
      SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src
    ),
    survivors AS (
      SELECT * FROM ded
      WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    )
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
             ) AS rk
      FROM survivors)
    WHERE rk <= 10
    """,
)
def curation_recipe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation chain a real training-data pipeline runs
    (``operators/curation.curation_recipe``), driver-checked as ONE
    composition since r6: language gate (stopword argmax ∈ {en, es}) →
    heuristic gates (≥12 tokens, punct ratio ≤ 0.3) → absolute bigram-LM
    floor (avg_logp ≥ −3.46; the ``lm_logp_min`` form exists precisely
    because an absolute cutoff is cross-engine-replayable where
    approx_percentile is not — margins to the nearest doc score measured
    ≥ 9e−5 at sf0.001/0.01/0.1 vs ~1e−13 cross-libm jitter) → exact
    dedup (min-id per text) → MinHash-LSH + two-star CC transitive
    near-dedup (recall-100% operating point, same subset argument as
    ``dedup_cc_survivors``: filtered-corpus pairs ⊆ full-corpus pairs
    and band collisions are pairwise properties) → deterministic
    GF(2³¹−1) stratified sample (10 per source, seed 11). The boilerplate
    stage is configured off: this corpus has no paragraph separators
    (measured zero newlines), so its oracle twin would be vacuous — the
    stage keeps its own differential pytest
    (``test_remove_repeated_paragraphs_matches_python``). Oracle: the
    whole chain in one WITH RECURSIVE pipeline, CC via transitive
    closure."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.curation_recipe(
        docs,
        langs=["en", "es"],
        min_tokens=12,
        max_punct_ratio=0.3,
        lm_percentile_floor=0.0,
        lm_logp_min=-3.46,
        near_dup_threshold=0.5,
        sample_per_stratum=10,
        strata_cols=["source"],
        sample_seed=11,
    ).select("doc_id", "lang", "source")


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 10
    """,
)
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-budget stratified sample: 10 documents per
    language, ranked by an affine hash of doc_id over GF(2^31−1) with an
    id tie-break (seed 11 → multiplier 15330096, offset 1941083619 — the
    oracle replays the identical arithmetic, so the SAMPLE SET itself is
    hash-checked, not just its size). Unlike Spark's per-partition
    Bernoulli ``sample``, the draw is a pure function of (doc_id, seed):
    the same subset reproduces on any cluster layout — what a training
    data recipe requires. Plan: one shuffle on the stratum column,
    WindowGroupLimit prunes to 10 rows/stratum map-side."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample_exact(
        docs, ["lang"], "doc_id", 10, seed=11
    ).select("doc_id", "lang", "source")


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
