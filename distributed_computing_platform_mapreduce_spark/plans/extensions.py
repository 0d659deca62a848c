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
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
    ),
    -- r10 oracle-scaling rewrite (identical results, same IEEE
    -- division): |A∩B| comes off the shingle inverted index instead
    -- of 12.5M list_intersect evaluations, and MATERIALIZED stops the
    -- two legs re-deriving the pipeline — sf0.1 went from >180 s to
    -- seconds, so the full parity suite runs at sf0.1 too
    sizes AS MATERIALIZED (SELECT doc_id, len(s) AS sz FROM sh),
    shx AS (SELECT doc_id, unnest(s) AS sg FROM sh),
    cand AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM shx a JOIN shx b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS MATERIALIZED (
      SELECT id_a, id_b,
             inter::DOUBLE / (za.sz + zb.sz - inter)::DOUBLE AS jaccard
      FROM cand
      JOIN sizes za ON za.doc_id = cand.id_a
      JOIN sizes zb ON zb.doc_id = cand.id_b
      WHERE inter::DOUBLE / (za.sz + zb.sz - inter)::DOUBLE >= 0.5
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
    UNION ALL
    SELECT 'ivf' AS method, * FROM ranked
    UNION ALL
    SELECT 'int8' AS method, * FROM ranked
    """,
)
def similarity_topk_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force, LSH-bucketed AND IVF cosine top-5 under one driver
    row, tagged by ``method`` (exact+lsh folded in r5; the ``ivf`` row —
    formerly ``similarity_topk_ivf`` — folded in r8 to free a slot for
    ``pagerank``; all three checks intact. The oracle can emit the SAME
    exact ranking for every tag precisely because the ANN points are
    recall-saturated, which IS the claim being checked).

    Exact: broadcast query set, corpus-side scan, sequential-fold cosine
    → bit-identical doubles vs DuckDB's identical left-fold. LSH: 8
    bands × 4 planes + 1-bit multiprobe — candidate recall for the true
    top-5 is 100% on this corpus (measured 1.0, zero extras, at
    sf0.001/0.01/0.1), so its output EQUALS the exact ranking. The
    generic LSH operator stays approximate — recall-vs-cost is the
    caller's dial; the plan is the bucketed one either way (probes ≈
    bands·(1+planes)/2^planes of the corpus per query, never an
    all-pairs scan). IVF: 16 centroids × 14 probes, recall 1.000
    measured at sf0.001/0.01/0.1 (ranks and cos doubles identical).
    Honest caveat for the IVF leg, same spirit as ``embedding_neardup``:
    probing 14/16 cells saturates recall on THIS corpus — near-uniform
    random vectors, ANN's worst case — while the production operating
    point (4/16 cells ≈ 25% of the corpus per query, recall 0.92
    measured in pytest) is the one whose cost model matters at 10⁹
    rows; the plan shape (bounded centroid broadcast, cell-filtered
    candidate join, per-query top-k window) is identical at both
    points. bench.py's ``similarity_topk_suite`` point times the
    exact+lsh legs (its historical content — the ivf branch prunes
    under the tag filter).

    r10 adds the ``int8`` leg — the production shortlist-then-rerank
    pattern: the int8 integer-GEMM scan (measured 2.1× faster than the
    fp64 scan in the bench A/B) keeps a 25-candidate shortlist per
    query, exact float64 cosine re-ranks the shortlist only (broadcast
    onto the corpus scan — no corpus shuffle), and the result EQUALS
    the exact ranking bit-for-bit. Promotion argument: the worst
    int8-rank of any true top-5 neighbor is 6/6/5 at sf0.001/0.01/0.1
    (measured), so shortlist 25 carries 4× headroom; the re-rank
    cosine is the identical sequential fold the exact leg hashes. This
    closes the r9 gap honestly: PQ stays un-promoted (no viable
    shortlist contains the true top-5 on this corpus — structureless
    random embeddings), while int8's quantization error is small
    enough to saturate, which is exactly the difference between the
    two compressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_exact(emb, queries, k=5).select(
        F.lit("exact").alias("method"), "query_id", "neighbor_id", "rank", "cos"
    )
    lsh = similarity.cosine_topk_lsh(
        emb, queries, dim=64, k=5, n_planes=4, bands=8, multiprobe=True
    ).select(F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank", "cos")
    ivf = similarity.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=16, n_probe=14
    ).select(F.lit("ivf").alias("method"), "query_id", "neighbor_id", "rank", "cos")
    int8 = similarity.cosine_topk_int8(
        emb, queries, k=5, rerank_shortlist=25
    ).select(F.lit("int8").alias("method"), "query_id", "neighbor_id", "rank", "cos")
    return exact.unionAll(lsh).unionAll(ivf).unionAll(int8)


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
    # r9 fold: a 'batched' leg runs knn_classify_batched (batch_rows=8
    # → 4/4/13 real batches at sf0.001/0.01/0.1) — per-target output is
    # provably identical to single-shot (neighbors depend only on the
    # labeled corpus; measured equal at all three SFs), so both legs
    # share one mode-tagged replay of the same SQL.
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
    ,verdict AS (
      SELECT query_id AS vec_id, label AS predicted_label, votes FROM (
        SELECT query_id, label, votes,
               row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS rk
        FROM votes
      ) WHERE rk = 1
    ),
    class_means AS (
      SELECT c, list_transform(range(0, 64), d ->
          (  (((c*73 + d*37) % 19) - 9)
           + (((c*73 + d*37 + 11) % 19) - 9)
           + (((c*73 + d*37 + 22) % 19) - 9))::DOUBLE / 3.0) AS cv
      FROM (SELECT unnest(range(0, 16)) AS c)
    ),
    csims AS (
      SELECT e.vec_id, c.c,
             list_dot_product(e.e, c.cv)
               / (sqrt(list_dot_product(e.e, e.e))
                  * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM v e CROSS JOIN class_means c
    ),
    centroid_pick AS (
      SELECT vec_id, c AS cell FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS rk
        FROM csims) WHERE rk = 1
    )
    SELECT 'single' AS mode, vec_id, predicted_label, votes FROM verdict
    UNION ALL
    SELECT 'batched', vec_id, predicted_label, votes FROM verdict
    UNION ALL
    SELECT 'centroid', vec_id, CAST(cell AS INTEGER), CAST(NULL AS BIGINT)
    FROM centroid_pick
    """,
)
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label propagation, tagged legs: every 20th vector is the
    unlabeled target batch, the rest the labeled seed set; each target
    takes the majority label of its 5 nearest labeled neighbors by
    cosine, ties broken (votes desc, label asc) so the output is a pure
    function of the table.

    - **single** (``classifier.knn_classify``): the neighbor search is
      ``similarity.cosine_topk_exact`` (bounded targets broadcast,
      corpus scanned once map-side); the vote is one |targets|·k-row
      groupBy.
    - **batched** (``classifier.knn_classify_batched``, r9 promotion of
      the unbounded-target-set path): targets hash-split into
      ``batch_rows=8`` deterministic batches (4/4/13 real batches at
      sf0.001/0.01/0.1), each run through the ordinary search with a
      bounded query-side broadcast. Per-target output is provably
      identical to single-shot — each target's neighbors depend only on
      the labeled corpus — so the oracle replays the SAME SQL under
      both tags; a batching bug (dropped batch, wrong split, cross-batch
      interference) breaks the row count or the hash.
    - **centroid** (``classifier.nearest_centroid_classify``, r11
      promotion): Rocchio nearest-centroid over the full embeddings
      table against a pinned 16-class labeled set with THREE members
      per class, each member an integer lattice vector
      ``((c·73 + d·37 + m·11) mod 19) − 9``. Integer coordinates make
      the distributed per-class mean ENGINE-EXACT (integer double sums
      are order-independent; one IEEE division by 3), so the oracle
      replays the whole chain — mean, cosine, argmax — not just the
      scoring GEMM; measured top1−top2 argmax margins are ≥ 2.7e-5 at
      sf0.1 (≥ 9.0e-5 / 1.7e-4 at sf0.01/0.001), ten orders above
      cross-engine float jitter. Only integer outputs are hashed
      (``score`` stays internal; ``votes`` is NULL on this leg).
      Multi-member FLOAT-mean averaging is deliberately NOT oracle-
      promoted (summation order is engine-specific — the same reason
      MLlib-LR coefficients stay pytest-only); the float path is
      covered by the synth-corpus accuracy pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    labeled = emb.filter(F.col("vec_id") % 20 != 0)
    targets = emb.filter(F.col("vec_id") % 20 == 0)
    single = classifier.knn_classify(labeled, targets, k=5).withColumn(
        "votes", F.col("votes").cast("long")
    )
    batched = classifier.knn_classify_batched(
        labeled, targets, k=5, batch_rows=8
    ).withColumn("votes", F.col("votes").cast("long"))
    class_members = spark.createDataFrame(
        [
            (
                int(100_000 + c * 3 + m),
                [float(((c * 73 + d * 37 + m * 11) % 19) - 9) for d in range(64)],
                int(c),
            )
            for c in range(16)
            for m in range(3)
        ],
        "vec_id bigint, embedding array<double>, label int",
    )
    centroid = classifier.nearest_centroid_classify(class_members, emb)
    centroid_leg = centroid.select(
        F.lit("centroid").alias("mode"),
        "vec_id",
        "predicted_label",
        F.lit(None).cast("long").alias("votes"),
    )
    return (
        single.select(F.lit("single").alias("mode"), "*")
        .unionAll(batched.select(F.lit("batched").alias("mode"), "*"))
        .unionAll(centroid_leg)
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
    "media_neardup_suite",
    # r8 fold of image_neardup + the (previously pytest-only) video and
    # audio near-dup paths — one tagged row, all three modalities on the
    # shared hamming_pairs block-LSH. Constants-replay partial oracle
    # (the multimodal_features pattern applied to PAIR STRUCTURE): every
    # twin is a re-encode/truncation/re-master of the SAME synthesized
    # content, so each leg's expected pair set is exactly its twin
    # relation — replayable as id arithmetic. NOT circular: the Spark
    # side decodes five real codecs (PPM/PNG/JPEG, y4m, WAV) and
    # block-joins real 64-bit prints; a broken decoder/hash either drops
    # pairs (rows mismatch) or admits cross-content pairs (hash
    # mismatch).
    oracle="""
    SELECT 'image' AS leg, doc_id AS id_a, doc_id + 10000000 AS id_b
    FROM documents WHERE doc_id >= 2 AND doc_id < 500
    UNION ALL
    SELECT 'video', doc_id, doc_id + 10000000
    FROM documents WHERE doc_id >= 2 AND doc_id < 500
    UNION ALL
    SELECT 'audio', doc_id, doc_id + 10000000
    FROM documents WHERE doc_id >= 2 AND doc_id < 500
    """,
)
def media_neardup_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection across all three media modalities,
    driver-checked end to end; every leg pins ``doc_id ∈ [2, 500)`` so
    its margin is a measured INVARIANT across every sf dir (all three
    ship docs 0–499+; the payloads are seed-deterministic, so the print
    sets are literally identical between sf dirs). ``doc_id < 2`` is
    excluded because the synth fixtures seed 0 and 1 identically
    (``seed or 1``) — a fixture degeneracy, not an operator property.

    - **image**: PPM base vs re-encoded twin — PNG (lossless) for even
      ids, baseline JPEG q95 (lossy requant) for odd — decode →
      bidirectional dHash → pigeonhole block join at hamming ≤ 6.
      Margin: twin distances ≤ 3 (369/500 at 0), nearest non-twin 11.
    - **video**: 8-frame y4m base vs 5-frame truncated twin
      (``synth_frames`` keys each frame by (seed, frame), so the twin's
      frames are byte-identical to the base's first five) → per-frame
      dHash → block join at hamming ≤ 4, pair requires all 5 shared
      frames to match. Margin: shared frames at 0, nearest cross-doc
      frame pair 8, same-doc distinct frames ≥ 10.
    - **audio**: ``synth_melody`` WAV base vs gain-0.5 re-master (the
      loudness-normalized duplicate; band-energy RATIOS cancel gain
      exactly up to int16 rounding) → ``ahash64`` → block join at
      hamming ≤ 1. Margin: twins ≤ 1 (494/498 at 0), nearest distinct
      pair 2 (mean 29). G.711 re-encode twins sit at ≤ 6 — beyond the
      distinct floor — so they stay a pytest recall bound, not an
      oracle claim.

    Full-scale evidence (5000 docs × resize twins at sf0.1) is the
    bench's ``image_neardup`` point; transform recall (resize/JPEG/PNG,
    µ-law/A-law, temporal offset) is pinned in pytest. Scale shape:
    prints are 8–16 B per item after one Arrow decode pass per modality
    — the block joins shuffle blocks·n short rows, never pixels,
    frames, or samples."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") >= 2) & (F.col("doc_id") < 500))
        .repartition(32)  # spread Python-side decode across cores
    )
    # image leg
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
    image_pairs = multimodal.image_neardup_pairs(
        base.unionAll(twins), max_hamming=6, blocks=8
    ).select(F.lit("image").alias("leg"), "id_a", "id_b")

    # video leg
    vbase = multimodal.video_from_documents(docs, n_frames=8, width=16, height=16)
    vtwin = multimodal.video_from_documents(
        docs, n_frames=5, width=16, height=16
    ).withColumn("media_id", F.col("media_id") + F.lit(10_000_000))
    video_pairs = multimodal.video_neardup_pairs(
        vbase.unionAll(vtwin), max_hamming=4, blocks=8, min_frame_matches=5
    ).select(F.lit("video").alias("leg"), "id_a", "id_b")

    # audio leg
    abase = multimodal.audio_from_documents(docs, n_samples=8000, synth="melody")
    atwin = multimodal.audio_from_documents(
        docs, n_samples=8000, synth="melody", gain=0.5
    ).withColumn("media_id", F.col("media_id") + F.lit(10_000_000))
    audio_pairs = multimodal.audio_neardup_pairs(
        abase.unionAll(atwin), max_hamming=1, blocks=8
    ).select(F.lit("audio").alias("leg"), "id_a", "id_b")

    return image_pairs.unionAll(video_pairs).unionAll(audio_pairs)


@query(
    "heavy_hitters",
    # Registered r8 (slot freed by the agg_grouping_suite fold): output
    # above the Misra–Gries guarantee threshold is DETERMINISTIC — every
    # value with frequency > n/(k+1) is in some partition summary
    # regardless of partitioning, the recount is exact, and the
    # min_count filter cuts precisely at the guarantee — so plain
    # GROUP-BY-HAVING replays it.
    oracle="""
    WITH w AS (
      SELECT word FROM (
        SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents
      ) WHERE word <> ''
    )
    SELECT word, count(*) AS cnt
    FROM w
    GROUP BY word
    HAVING count(*) > (SELECT count(*) // 33 FROM w)
    """,
)
def heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens WITHOUT a full-key shuffle: per-partition
    Misra–Gries summaries (k=32 counters, one Arrow pass, no shuffle) →
    ≤ partitions·k candidates broadcast → exact recount of candidate
    rows only — thresholded at the guarantee (count > n/33), where the
    output is provably partitioning-independent. At web-corpus
    cardinality the full ``groupBy(token)`` shuffle carries billions of
    distinct keys to answer a top-handful question; this plan's shuffle
    carries candidate rows only. (The sf corpus' small vocabulary makes
    every word a candidate — the guarantee arithmetic, not the
    candidate pruning, is what the oracle exercises; the pruning bound
    is pinned under 1/4/32-partition layouts in pytest.)"""
    from distributed_computing_platform_mapreduce_spark.operators.frequent import (
        heavy_hitters,
    )
    from distributed_computing_platform_mapreduce_spark.plans.maplejuice import tokenize

    docs = load_table(spark, sf_dir, "documents")
    words = tokenize(docs)
    k = 32
    n = words.count()  # one bounded-scalar job (the CC-checksum pattern)
    return heavy_hitters(words, "word", k=k, min_count=n // (k + 1) + 1).select(
        "word", F.col("count").alias("cnt")
    )


@query(
    "dedup_survivors_suite",
    # r8 fold of dedup_survivors + dedup_cc_survivors (slot freed for the
    # r8 registry additions; both policies' oracles intact, tagged).
    # r9 adds the 'incr'/'incr_index' legs — the previously pytest-only
    # nightly incremental-dedup chain, replayed with the SAME exact-
    # Jaccard graph restricted by wave (doc_id % 3): wave 0 seeds the
    # index, waves 1 and 2 are successive increments. The MinHash
    # component-match estimator's kill decisions were measured equal to
    # exact Jaccard at sf0.001/0.01/0.1 (313/312/3115 survivors, zero
    # diffs), so the exact replay is the estimator's oracle at this
    # corpus' operating point.
    oracle="""
    WITH RECURSIVE sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
    ),
    -- exact Jaccard via a shingle INVERTED INDEX (r10 oracle-scaling
    -- rewrite; identical results, pinned 256 pairs / 477 component
    -- rows at sf0.1 against the old form): |A∩B| is the shared-
    -- shingle count straight off the index self-join (shingle lists
    -- are distinct), so J >= 0.5 needs no list_intersect and only
    -- candidate pairs are priced (~1.1M at sf0.1, not all ~12.5M);
    -- MATERIALIZED stops DuckDB re-deriving the whole pipeline at
    -- every reference (the legs reference pairs/comp repeatedly —
    -- inlined, the sf0.1 oracle took >10 min; materialized, seconds).
    -- Same candidates-then-verify algebra the Spark side runs.
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
    sh3 AS MATERIALIZED (
      SELECT doc_id, doc_id % 3 AS wave,
             list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS s
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
            FROM documents)
    ),
    -- same inverted-index rewrite for the incremental legs: a kill
    -- decision needs j >= 0.5 > 0, so no-shared-shingle pairs (j = 0)
    -- can never appear in idead1/idead2, and |A∩B| is the shared-
    -- shingle count off the index
    sizes3 AS MATERIALIZED (SELECT doc_id, len(s) AS sz FROM sh3),
    shx3 AS (SELECT doc_id, wave, unnest(s) AS sg FROM sh3),
    cand3 AS MATERIALIZED (
      SELECT a.doc_id AS new_id, b.doc_id AS other_id,
             a.wave AS wa, b.wave AS wb, count(*) AS inter
      FROM shx3 a JOIN shx3 b ON a.sg = b.sg AND a.doc_id <> b.doc_id
      WHERE a.wave > 0
      GROUP BY 1, 2, 3, 4
    ),
    jac AS MATERIALIZED (
      SELECT new_id, other_id, wa, wb,
             inter::DOUBLE
               / greatest(za.sz + zb.sz - inter, 1)::DOUBLE AS j
      FROM cand3
      JOIN sizes3 za ON za.doc_id = cand3.new_id
      JOIN sizes3 zb ON zb.doc_id = cand3.other_id
    ),
    idead1 AS MATERIALIZED (
      SELECT DISTINCT new_id FROM jac
      WHERE wa = 1 AND j >= 0.5 AND (wb = 0 OR (wb = 1 AND other_id < new_id))
    ),
    idead2 AS MATERIALIZED (
      SELECT DISTINCT new_id FROM jac
      WHERE wa = 2 AND j >= 0.5 AND (
        wb = 0 OR (wb = 1 AND other_id NOT IN (SELECT new_id FROM idead1))
        OR (wb = 2 AND other_id < new_id))
    ),
    isurv AS MATERIALIZED (
      SELECT doc_id FROM sh3 WHERE wave > 0
        AND doc_id NOT IN (SELECT new_id FROM idead1)
        AND doc_id NOT IN (SELECT new_id FROM idead2)
    ),
    qual AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS ntok
      FROM documents
    ),
    winners AS (
      SELECT id FROM (
        SELECT c.id,
               row_number() OVER (
                 PARTITION BY c.component ORDER BY q.ntok DESC, c.id ASC
               ) AS rk
        FROM comp c JOIN qual q ON q.doc_id = c.id
      ) WHERE rk = 1
    ),
    scents AS (
      SELECT c, list_transform(range(0, 64), d -> ((((c*73 + d*37) % 19) - 9))::DOUBLE) AS cv
      FROM (SELECT unnest(range(0, 16)) AS c)
    ),
    sev AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    ssims AS (
      SELECT sev.vec_id, scents.c,
             list_dot_product(sev.ev, scents.cv)
               / (sqrt(list_dot_product(sev.ev, sev.ev))
                  * sqrt(list_dot_product(scents.cv, scents.cv))) AS cos
      FROM sev CROSS JOIN scents
    ),
    sbest AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, c AS cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS rk
        FROM ssims) WHERE rk = 1
    ),
    scellv AS MATERIALIZED (SELECT b.vec_id, b.cell, e.ev FROM sbest b JOIN sev e ON e.vec_id = b.vec_id),
    spairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM scellv a JOIN scellv b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.ev, b.ev)
              / (sqrt(list_dot_product(a.ev, a.ev))
                 * sqrt(list_dot_product(b.ev, b.ev))) >= 0.35
    ),
    sedges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM spairs
    ),
    sreach(src, dst) AS (
      SELECT src, dst FROM sedges
      UNION
      SELECT r.src, e.dst FROM sreach r JOIN sedges e ON r.dst = e.src
    ),
    scomp AS MATERIALIZED (
      SELECT src AS id, least(src, min(dst)) AS component FROM sreach GROUP BY src
    )
    SELECT 'semdedup' AS policy, vec_id AS doc_id,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS source
    FROM embeddings
    WHERE vec_id NOT IN (SELECT id FROM scomp WHERE id <> component)
    UNION ALL
    SELECT 'pair' AS policy, d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
    UNION ALL
    SELECT 'cc', d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
    UNION ALL
    SELECT 'cc_quality', d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM comp)
       OR d.doc_id IN (SELECT id FROM winners)
    UNION ALL
    SELECT 'incr', d.doc_id, d.lang, d.source
    FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM isurv)
    UNION ALL
    SELECT 'incr_index', d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id % 3 = 0 OR d.doc_id IN (SELECT doc_id FROM isurv)
    """,
)
def dedup_survivors_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both near-dedup survivor POLICIES over the same LSH pair set,
    tagged legs under one registry row (r8 fold of ``dedup_survivors``
    and ``dedup_cc_survivors``):

    - ``pair`` (pair-dominated): a document survives iff it is not the
      higher-id member of any ≥θ near-dup pair. Deliberately NOT
      transitive — in a chain A~B~C with no (A,C) pair, C drops via
      (B,C) even though B drops too; a doc whose only near-dups have
      higher ids always survives.
    - ``cc`` (transitive closure — the composition a real LLM data
      pipeline runs): ``minhash_lsh_pairs`` (banded candidates, exact
      verify, no all-pairs self-join) →
      ``connected_components_twostar`` (alternating large/small-star,
      O(log n) rounds, per-round localCheckpoint) → one min-id survivor
      per component; in the A~B~C chain the whole cluster collapses to
      A. Oracle: DuckDB ``WITH RECURSIVE`` transitive closure over the
      exact-Jaccard graph. Semantics anchor: the reference's only dedup
      is the E9 last-write race
      (``/root/reference/src/MapReduceMaster.java:371-374``); these are
      the policy surface a corpus pipeline actually needs.

    The pair set is computed ONCE and shared by both legs (the CC leg's
    iterative rounds run at plan-build time against it). Exact-Jaccard
    oracles apply because LSH candidate recall is 100% on this corpus
    (pinned by ``test_minhash_lsh_equals_exact_jaccard``). bench.py's
    ``dedup_cc_survivors`` point times ``filter(policy = 'cc')`` — the
    pair leg's branch prunes under the literal filter.

    r9 adds ``cc_quality`` — the max-QUALITY survivor policy
    (``dedup.dedup_survivors_cc_best``): within each component keep the
    highest-token-count doc (min id on ties) instead of the min id —
    the policy production curation actually wants, since copies in a
    near-dup cluster differ (truncations, boilerplate variants) and
    min-id keeps whichever was crawled first, not the fullest copy.
    The CC solve is computed ONCE and shared with the ``cc`` leg; the
    ranking window runs over component members only (bounded by
    2·pairs), never the corpus. The oracle replays the argmax with the
    same token-count expression the text_stats oracle uses.

    r9 also adds the nightly-increment legs (the last major dedup
    family without a SQL twin):

    - ``incr``: documents in waves 1 and 2 (``doc_id % 3``) that
      survive two successive ``dedup.incremental_dedup`` increments
      against the persisted signature index seeded by wave 0 —
      history TEXT is never re-read, only ~300 B/doc signatures; a new
      doc dies on any component-match-estimate ≥ θ vs the index or vs
      a lower-id doc of its own increment.
    - ``incr_index``: membership of the FINAL updated index (wave 0 ∪
      both increments' survivors) — the artifact a production pipeline
      writes back nightly; verifying it pins the index-update algebra,
      not just the survivor set.

    The oracle replays both increments with exact Jaccard; the
    estimator's decisions were MEASURED equal to exact at all three sf
    dirs (zero survivor diffs), the same operating-point argument the
    LSH legs use. Bench evidence: ``incremental_index_build`` /
    ``incremental_dedup_increment`` points (r9).

    r10 adds the ``semdedup`` leg (``operators/semdedup.py``) — the
    SEMANTIC member of the survivor family, over the embeddings table:
    pinned-codebook k-means cells (the ``_pinned_cluster_codebook``
    replay) bound the pair search, within-cell exact-cosine pairs at
    θ=0.35 feed the same CC → min-id machinery, and DuckDB replays
    the whole chain (argmax-cosine cells, cell-join cosine pairs,
    WITH RECURSIVE closure). Promotion argument: the θ gate's measured
    min |cos − θ| margin is 6.7e-4 / 2.5e-4 / 1.2e-6 at
    sf0.001/0.01/0.1 — ≥6 orders above cross-engine float64 summation
    jitter — and the survivor policy is integer-exact; 725 within-cell
    pairs collapse at sf0.1 (non-vacuous). The Lloyd-trained codebook
    path and the paper's centroid_far policy keep their pytest
    differentials."""
    docs = load_table(spark, sf_dir, "documents")
    # the LSH banded join + verify feeds BOTH legs; a lazy checkpoint
    # (materialized once by the CC leg's plan-build rounds) keeps the
    # pair leg from re-running the whole candidate/verify pipeline —
    # the checkpoint is bounded at the near-dup pair count
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
    ).localCheckpoint(eager=False)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    pair_leg = docs.join(losers, "doc_id", "left_anti").select(
        F.lit("pair").alias("policy"), "doc_id", "lang", "source"
    )
    # ONE CC solve shared by the min-id and max-quality policies (the
    # lazy checkpoint materializes with the first leg's rounds)
    comps = dedup.connected_components_twostar(pairs).localCheckpoint(eager=False)
    cc_leg = dedup.dedup_survivors_cc(docs, pairs, "doc_id", comps=comps).select(
        F.lit("cc").alias("policy"), "doc_id", "lang", "source"
    )
    from distributed_computing_platform_mapreduce_spark.operators.text import token_count_ws

    ccq_leg = dedup.dedup_survivors_cc_best(
        docs.withColumn("__ntok", token_count_ws(F.col("text"))),
        pairs,
        "doc_id",
        quality_col="__ntok",
        comps=comps,
    ).select(F.lit("cc_quality").alias("policy"), "doc_id", "lang", "source")

    w0 = docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
    w1 = docs.filter(F.pmod("doc_id", F.lit(3)) == 1)
    w2 = docs.filter(F.pmod("doc_id", F.lit(3)) == 2)
    # lazy checkpoints pin each chain stage the way the nightly job's
    # parquet writes would — the second increment must read the UPDATED
    # index, never re-derive wave 1's work
    idx0 = dedup.minhash_index(w0, "doc_id", "text").localCheckpoint(eager=False)
    s1, u1 = dedup.incremental_dedup(w1, idx0)
    s2, u2 = dedup.incremental_dedup(w2, u1.localCheckpoint(eager=False))
    incr_leg = s1.unionAll(s2).select(
        F.lit("incr").alias("policy"), "doc_id", "lang", "source"
    )
    idx_leg = (
        u2.select(F.col("id").alias("doc_id"))
        .join(docs, "doc_id")
        .select(F.lit("incr_index").alias("policy"), "doc_id", "lang", "source")
    )
    from distributed_computing_platform_mapreduce_spark.operators import semdedup as sd

    emb = load_table(spark, sf_dir, "embeddings")
    sem_leg = sd.semdedup(
        emb, threshold=0.35, centroids=_pinned_cluster_codebook()
    ).select(
        F.lit("semdedup").alias("policy"),
        F.col("vec_id").alias("doc_id"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
    )
    return (
        sem_leg.unionAll(pair_leg)
        .unionAll(cc_leg)
        .unionAll(ccq_leg)
        .unionAll(incr_leg)
        .unionAll(idx_leg)
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


def _pinned_cluster_codebook(n_clusters: int = 16, dim: int = 64):
    """Deterministic unit-row codebook for the driver's cluster-sample
    leg: integer lattice ``((c·73 + d·37) mod 19) − 9`` then L2-row-
    normalize. Pinned (not Lloyd-trained) so the cell ASSIGNMENT is a
    pure arithmetic function DuckDB can replay; measured top1−top2
    cosine margins on the driver corpora are ≥ 1.7e-6 (sf0.1) — nine
    orders above cross-engine float64 summation jitter, so the argmax
    is engine-independent."""
    import numpy as np

    c = np.arange(n_clusters)[:, None] * 73
    d = np.arange(dim)[None, :] * 37
    mat = ((c + d) % 19 - 9).astype(np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


@query(
    "sample_stratified",
    # r9 fold: 'lang' = the original exact-budget stratified sample;
    # 'cluster' promotes the previously pytest-only diversity-aware
    # cluster-quota sampler — the codebook is pinned (see
    # _pinned_cluster_codebook), so DuckDB replays the argmax-cosine
    # cell assignment AND the identical GF(2³¹−1) seed-11 rank draw.
    # r10 fold: 'mixture'/'split' replay the same GF arithmetic as
    # stateless filters; 'weighted' replays the A-ES -ln(u)/w key
    # quantized to 6 decimals (round_key — ln's cross-libm ulp cannot
    # survive the rounding, ties resolve by id); 'bins' replays
    # quantile_bins at relative_error=0 — Spark's exact quantile is
    # the sorted value at 1-based rank ceil(p·n) (probed over ties,
    # duplicates, and n∈{4..100}), which the nt/cuts CTEs reproduce,
    # and assign_bins is a pure count-of-cuts-below expression.
    oracle="""
    WITH nt AS (
      SELECT doc_id, lang, source,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT n_tokens,
             row_number() OVER (ORDER BY n_tokens) AS rn,
             count(*) OVER () AS n
      FROM nt
    ),
    cuts AS (
      SELECT
        max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c1,
        max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c2,
        max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_tokens END)::DOUBLE AS c3
      FROM ranked
    ),
    cents AS (
      SELECT c, list_transform(range(0, 64), d -> ((((c*73 + d*37) % 19) - 9))::DOUBLE) AS cv
      FROM (SELECT unnest(range(0, 16)) AS c)
    ),
    sims AS (
      SELECT e.vec_id, c.c,
             list_dot_product(e.embedding::DOUBLE[], c.cv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cv, c.cv))) AS cos
      FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, c AS cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS rk
        FROM sims) WHERE rk = 1
    )
    SELECT 'lang' AS leg, doc_id AS id, lang AS stratum, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 10
    UNION ALL
    SELECT 'cluster', vec_id, CAST(cell AS VARCHAR), NULL
    FROM (
      SELECT vec_id, cell,
             row_number() OVER (
               PARTITION BY cell
               ORDER BY (15330096 * (vec_id % 2147483647) + 1941083619) % 2147483647,
                        vec_id
             ) AS rk
      FROM best)
    WHERE rk <= 10
    UNION ALL
    SELECT 'budget', doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             SUM(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> ''))) OVER (
               PARTITION BY lang
               ORDER BY (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cumtok
      FROM documents)
    WHERE cumtok <= CASE lang WHEN 'en' THEN 3000 WHEN 'es' THEN 2000 ELSE 1000 END
    UNION ALL
    SELECT 'bins', doc_id,
           CAST((CASE WHEN n_tokens > c1 THEN 1 ELSE 0 END
               + CASE WHEN n_tokens > c2 THEN 1 ELSE 0 END
               + CASE WHEN n_tokens > c3 THEN 1 ELSE 0 END) AS VARCHAR),
           source
    FROM nt CROSS JOIN cuts
    UNION ALL
    SELECT 'mixture', doc_id, lang, source
    FROM documents
    WHERE (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647 <
          CASE lang WHEN 'en' THEN 1073741823
                    WHEN 'es' THEN 536870911
                    ELSE 214748364 END
    UNION ALL
    SELECT 'split', doc_id,
           CASE WHEN (15330096 * (doc_id % 2147483647) + 1941083619)
                     % 2147483647 < 429496729
                THEN 'valid' ELSE 'train' END,
           source
    FROM documents
    UNION ALL
    SELECT 'weighted', doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY round(
                 -ln((((15330096 * (doc_id % 2147483647) + 1941083619)
                        % 2147483647) + 1) / 2147483647.0) / n_tokens, 6),
                 doc_id
             ) AS rk
      FROM nt)
    WHERE rk <= 10
    UNION ALL
    SELECT 'temp', doc_id, lang, source
    FROM documents JOIN (
      -- temperature rates replayed bit-exactly: sqrt is IEEE
      -- correctly-rounded in both engines, the normalizer z is a
      -- left-fold in sorted-lang order, divisions associate
      -- left-to-right, and the threshold floors to an integer —
      -- identical thresholds verified at every SF
      SELECT lang,
             CAST(floor(least(1.0, budget * sqrt(n::DOUBLE) / z / n::DOUBLE)
                        * 2147483647.0) AS BIGINT) AS thr
      FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY lang) c
      CROSS JOIN (
        SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(sqrt(n::DOUBLE) ORDER BY lang)), (a, b) -> a + b) AS z,
               CAST(sum(n) // 2 AS DOUBLE) AS budget
        FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY lang)
      ) zz
    ) t USING (lang)
    WHERE (15330096 * (doc_id % 2147483647) + 1941083619) % 2147483647 < thr
    """,
)
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling suite, tagged legs:

    - **lang**: exact-budget stratified sample — 10 documents per
      language, ranked by an affine hash of doc_id over GF(2^31−1) with
      an id tie-break (seed 11 → multiplier 15330096, offset 1941083619
      — the oracle replays the identical arithmetic, so the SAMPLE SET
      itself is hash-checked, not just its size). Unlike Spark's
      per-partition Bernoulli ``sample``, the draw is a pure function
      of (doc_id, seed): the same subset reproduces on any cluster
      layout — what a training data recipe requires. Plan: one shuffle
      on the stratum column, WindowGroupLimit prunes to 10 rows/stratum
      map-side.
    - **cluster** (r9 promotion): diversity-aware cluster-quota
      sampling (``sampling.cluster_sample``) — k-means cells as strata,
      exactly 10 embeddings per cell via the same GF draw. The driver
      leg pins the codebook so the assignment is replayable arithmetic;
      the Lloyd-TRAINED path (and its rare-mode over-representation
      guarantee) stays pinned in pytest. One Arrow GEMM assignment
      pass; the only shuffle is the per-cell ranking window.
    - **budget** (r9, ``sampling.token_budget_sample``): per-domain
      TOKEN-budget sampling — the DoReMi/Pile mixture contract in the
      unit a trainer pays for: each language contributes the ranked
      prefix of its docs whose inclusive token cumsum fits the budget
      (en 3000 / es 2000 / default 1000 — exercises both mapped and
      default budgets non-vacuously). Rate-based mixtures skew the
      realized token mix when strata have different length
      distributions; this leg pins the token-denominated policy. Same
      one-shuffle window profile; the whitespace token count is the
      SAME expression the text_stats/sequence_packing oracles replay.
    - **bins** (r10, ``sampling.quantile_bins``): equi-population
      quartile binning of the token-count column at
      ``relative_error=0`` — the GK sketch's exact operating point,
      where Spark's quantile is the sorted value at rank ``ceil(p·n)``
      and DuckDB recomputes the identical cuts from rank arithmetic
      (the sketch-approximate path stays pinned in pytest, where both
      sides of the tolerance band live in one engine). Every doc's bin
      is hash-checked, so ``assign_bins``' strictly-below counting
      convention is driver-certified too.
    - **mixture** / **split** (r10, ``sampling.mixture_sample`` /
      ``train_valid_split``): per-source keep-rates (en 0.5 / es 0.25
      / default 0.1) and the 20% held-out split — both stateless
      GF(2³¹−1) filters (no shuffle at all); the oracle replays the
      exact integer cuts ``int(rate·P)``.
    - **weighted** (r10, ``sampling.weighted_sample_stratified``): the
      Efraimidis–Spirakis A-ES draw weighted by token count, 10 docs
      per language, with ``round_key=6`` so the ranking key is
      quantized below any cross-libm ``ln`` ulp (ties → id, total
      order on both engines).
    - **temp** (r11, ``sampling.temperature_mixture_sample``): the
      T5/mT5/XLM-R temperature recipe — per-language rates ∝ n^0.5 at
      a half-corpus budget, flattening the mixture toward low-resource
      languages (en keeps ~0.36, the tail ~0.6). Promotable because at
      alpha = 0.5 the power is IEEE-correctly-rounded ``sqrt`` and the
      normalizer a sorted-order left-fold, so the integer thresholds
      ``int(rate·P)`` are BIT-IDENTICAL across engines (verified at
      all three SFs); non-0.5 alphas go through libm ``pow`` and stay
      pytest-pinned. Same stateless GF filter as mixture/split —
      no shuffle beyond the one bounded count."""
    docs = load_table(spark, sf_dir, "documents")
    lang = sampling.stratified_sample_exact(
        docs, ["lang"], "doc_id", 10, seed=11
    ).select(
        F.lit("lang").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    budget = sampling.token_budget_sample(
        docs,
        "lang",
        "doc_id",
        budgets={"en": 3000, "es": 2000},
        default_budget=1000,
        seed=11,
    ).select(
        F.lit("budget").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    clus = sampling.cluster_sample(
        emb,
        "vec_id",
        "embedding",
        n_clusters=16,
        per_cluster=10,
        seed=11,
        centroids=_pinned_cluster_codebook(),
    ).select(
        F.lit("cluster").alias("leg"),
        F.col("vec_id").alias("id"),
        F.col("cluster_cell").cast("string").alias("stratum"),
        F.lit(None).cast("string").alias("source"),
    )
    docs_nt = docs.withColumn(
        "n_tokens", packing.whitespace_token_count(F.col("text")).cast("bigint")
    )
    binned, _cuts = sampling.quantile_bins(
        docs_nt, "n_tokens", n_bins=4, relative_error=0.0
    )
    bins_leg = binned.select(
        F.lit("bins").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("bin").cast("string").alias("stratum"),
        "source",
    )
    mixture = sampling.mixture_sample(
        docs,
        "lang",
        weights={"en": 0.5, "es": 0.25},
        id_col="doc_id",
        seed=11,
        default_rate=0.1,
    ).select(
        F.lit("mixture").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    train, valid = sampling.train_valid_split(docs, "doc_id", 0.2, seed=11)
    split = train.select(
        F.lit("split").alias("leg"),
        F.col("doc_id").alias("id"),
        F.lit("train").alias("stratum"),
        "source",
    ).unionAll(
        valid.select(
            F.lit("split").alias("leg"),
            F.col("doc_id").alias("id"),
            F.lit("valid").alias("stratum"),
            "source",
        )
    )
    weighted = sampling.weighted_sample_stratified(
        docs_nt, ["lang"], "doc_id", "n_tokens", 10, seed=11, round_key=6
    ).select(
        F.lit("weighted").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    temp = sampling.temperature_mixture_sample(
        docs, "lang", "doc_id", alpha=0.5, budget_frac=0.5, seed=11
    ).select(
        F.lit("temp").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("lang").alias("stratum"),
        "source",
    )
    return (
        lang.unionAll(clus)
        .unionAll(budget)
        .unionAll(bins_leg)
        .unionAll(mixture)
        .unionAll(split)
        .unionAll(weighted)
        .unionAll(temp)
    )


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


# --- r8 registry additions (slots freed by the window/survivor/join folds) --


from distributed_computing_platform_mapreduce_spark.operators.text import _URL_RE as _URL_PATTERN


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


@query(
    "triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT least(user_id % 97, event_id % 97) AS lo,
                      greatest(user_id % 97, event_id % 97) AS hi
      FROM events
      WHERE (user_id % 97) <> (event_id % 97)
    ),
    tri AS (
      SELECT w1.p AS x, w1.a AS y, w2.b AS z
      FROM (SELECT lo AS p, hi AS a FROM e) w1
      JOIN (SELECT lo AS p, hi AS b FROM e) w2 ON w1.p = w2.p AND w1.a < w2.b
      JOIN e cl ON cl.lo = w1.a AND cl.hi = w2.b
    )
    SELECT id, count(*) AS triangles FROM (
      SELECT x AS id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ) GROUP BY id
    """,
)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (r8 driver promotion of the r7 graph
    operator) over a deterministic mod-97 projection of the events
    edge list — dense enough that most nodes close triangles, sparse
    enough (a handful of absent edges) that a wedge-join bug cannot
    hide behind a complete graph.

    The operator (``graph.triangle_count``) canonicalizes edges to
    (lo, hi), dedups, enumerates wedges from the LOW endpoint (the
    power-law hub mitigation — a hub's wedges generate from its
    lower-degree neighbors), and closes each wedge with one more
    equi-join; the oracle is the identical algebra as three DuckDB
    joins. Every stage is an equi-join — no cross product (plan-linted
    with the rest of the registry)."""
    from distributed_computing_platform_mapreduce_spark.operators.graph import (
        triangle_count,
    )

    ev = load_table(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 97).alias("src"), (F.col("event_id") % 97).alias("dst")
    )
    return triangle_count(edges)


def _pagerank_oracle(n_iter: int = 5, damping: float = 0.85, mod: int = 97) -> str:
    """Damped PageRank unrolled to ``n_iter`` explicit CTE stages —
    recursive CTEs can't aggregate over their own recursive reference,
    so each iteration is generated as a full stage. Every constant is
    CAST to DOUBLE (DuckDB numeric literals are DECIMAL; Spark computes
    in doubles) and the final ranks round to 8 decimals on both engines
    so summation-order jitter (~1e-16 relative) cannot flip a hash."""
    d = f"CAST({damping} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    pre = f"""
    WITH e AS (
      SELECT DISTINCT user_id % {mod} AS src, event_id % {mod} AS dst FROM events
    ),
    nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT id, {one} / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(n_iter):
        steps.append(f"""
    dang{i} AS (
      SELECT coalesce(sum(r.rank), CAST(0.0 AS DOUBLE)) AS m FROM r{i} r
      WHERE r.id NOT IN (SELECT src FROM deg)
    ),
    r{i + 1} AS (
      SELECT nd.id,
             ({one} - {d}) / (SELECT n FROM nn)
             + {d} * (SELECT m FROM dang{i}) / (SELECT n FROM nn)
             + {d} * coalesce(inf.inflow, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.deg) AS inflow
        FROM e JOIN r{i} r ON e.src = r.id JOIN deg dg ON e.src = dg.src
        GROUP BY e.dst
      ) inf ON nd.id = inf.dst
    )""")
    return (
        pre + "," + ",".join(steps)
        + f"\n    SELECT id, round(rank, 8) AS rank FROM r{n_iter}"
    )


@query("pagerank", oracle=_pagerank_oracle())
def pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (5 iterations, d=0.85) over the mod-97 events
    graph — an ITERATIVE distributed algorithm under the full
    rows+schema+hash gate (r8; slot freed by folding the IVF row into
    ``similarity_topk_suite``).

    The operator (``graph.pagerank``) runs one contribution join + one
    bounded one-row dangling-mass aggregate per round, with periodic
    localCheckpoint lineage cuts — the loop a 100 TB graph job actually
    executes. The oracle unrolls the same recurrence (nodes = src ∪ dst
    of the distinct edge set, inflow = Σ rank/out-degree, dangling mass
    redistributed uniformly) as five generated DuckDB CTE stages; both
    sides round to 8 decimals so double summation order (~1e-16
    relative jitter) cannot flip the value hash, while any semantic
    error (a missed dangling term, an off-by-one iteration, degree
    miscount) shifts ranks at the 1e-3 scale and cannot hide."""
    from distributed_computing_platform_mapreduce_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 97).alias("src"), (F.col("event_id") % 97).alias("dst")
    )
    return pagerank(edges, n_iter=5, damping=0.85).select(
        "id", F.round("rank", 8).alias("rank")
    )


@query(
    "dedup_spans",
    # The oracle recomputes ExactSubstr from first principles: token
    # lists, every k-gram materialized as its STRING (the Spark side
    # matches 61-bit rolling hashes — equivalence is exact up to a
    # ~n²/2⁶² collision probability, deterministic per corpus), repeat
    # counts, covered positions, per-doc rebuild via ordered string_agg.
    # r9 fold: the 'decontam' leg replays decontaminate_spans with the
    # IDENTICAL gram-string machinery — eval grams (doc_id % 10 = 7)
    # semi-select the training side's (doc_id % 10 <> 7) cut starts.
    # r10 fold: the 'para' leg promotes remove_repeated_paragraphs —
    # the corpus has no newlines, so BOTH engines first synthesize the
    # same paragraph structure (tokens chunked in 6s, chunks joined by
    # \\n; DuckDB list slices are INCLUSIVE: ts[p : p+5] is 6 tokens),
    # then drop every paragraph appearing in >1 DISTINCT documents and
    # rebuild in original order (non-vacuous: 124 of 500 docs lose a
    # paragraph at sf0.01, 1711 of 5000 at sf0.1).
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
      FROM documents
    ),
    positions AS (
      SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4 + 2, 1))) AS pos FROM toks
    ),
    grams AS (
      SELECT doc_id, pos, array_to_string(ts[pos : pos + 4 - 1], ' ') AS g FROM positions
    ),
    rep AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 7),
    starts AS (
      SELECT 'repeat' AS leg, doc_id, pos FROM grams WHERE g IN (SELECT g FROM rep)
      UNION ALL
      SELECT 'decontam', doc_id, pos FROM grams
      WHERE doc_id % 10 <> 7 AND g IN (SELECT g FROM eval_g)
    ),
    covered AS (
      SELECT DISTINCT leg, doc_id, pos + unnest(range(0, 4)) AS p FROM starts
    ),
    tokpos AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS p FROM toks
    ),
    tokrows AS (SELECT doc_id, p, ts[p] AS tok FROM tokpos),
    legdocs AS (
      SELECT 'repeat' AS leg, doc_id, ts FROM toks
      UNION ALL
      SELECT 'decontam', doc_id, ts FROM toks WHERE doc_id % 10 <> 7
    ),
    kept AS (
      SELECT ld.leg, tr.doc_id, tr.p, tr.tok
      FROM legdocs ld
      JOIN tokrows tr ON ld.doc_id = tr.doc_id
      LEFT JOIN covered c
        ON c.leg = ld.leg AND tr.doc_id = c.doc_id AND tr.p = c.p
      WHERE c.p IS NULL
    )
    SELECT ld.leg, ld.doc_id,
           coalesce(ka.txt, '') AS text,
           len(ld.ts) - coalesce(ka.n, 0) AS n_tokens_removed
    FROM legdocs ld LEFT JOIN (
      SELECT leg, doc_id, string_agg(tok, ' ' ORDER BY p) AS txt, count(*) AS n
      FROM kept GROUP BY leg, doc_id
    ) ka ON ld.leg = ka.leg AND ld.doc_id = ka.doc_id
    UNION ALL
    SELECT 'para', t.doc_id,
           coalesce(pk.txt, '') AS text,
           CAST(len(t.ts) - coalesce(pk.ntok, 0) AS BIGINT) AS n_tokens_removed
    FROM toks t LEFT JOIN (
      SELECT doc_id,
             string_agg(para, chr(10) ORDER BY p) AS txt,
             -- CAST: DuckDB types sum(BIGINT) as HUGEINT, which the driver's
             -- pandas conversion renders as float64 and hash-mismatches
             -- against Spark's bigint even when values are identical
             -- (the one red row of CORRECTNESS_r10.json).
             CAST(sum(least(p + 5, lents) - p + 1) AS BIGINT) AS ntok
      FROM (
        SELECT doc_id, p, lents,
               array_to_string(ts[p : least(p + 5, lents)], ' ') AS para
        FROM (
          SELECT doc_id, ts, len(ts) AS lents,
                 unnest(range(1, len(ts) + 1, 6)) AS p
          FROM toks)
      )
      WHERE para NOT IN (
        SELECT para FROM (
          SELECT array_to_string(ts[p : least(p + 5, len(ts))], ' ') AS para,
                 doc_id
          FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 6)) AS p
                FROM toks))
        GROUP BY para HAVING count(DISTINCT doc_id) > 1)
      GROUP BY doc_id
    ) pk ON t.doc_id = pk.doc_id
    """,
)
def dedup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-surgery suite, tagged legs (r9 fold promotes the previously
    pytest-only decontamination path to a full driver oracle):

    - **repeat**: exact repeated-substring removal (ExactSubstr, Lee et
      al. ACL'22) — every 4-token run occurring ≥ 2 times anywhere in
      the corpus is cut from EVERY occurrence and the documents are
      rebuilt. On this corpus the operating point is richly non-vacuous
      — 369 of 500 docs lose at least one span at sf0.01 (birthday
      collisions over the small synthetic vocabulary), so the rebuilt
      texts AND the per-document removal counts both carry signal.
    - **decontam**: GPT-3-style span decontamination
      (``dedup.decontaminate_spans``) — docs with ``doc_id % 10 = 7``
      stand in as the EVAL corpus, the rest as training data; every
      training-side 4-token run that also appears anywhere in the eval
      slice is cut, the document's clean remainder survives. Production
      k is 13 (GPT-3's n-gram); k=4 here so the tiny driver corpus
      exercises real overlaps through the same machinery.

    Both legs match grams by 61-bit rolling polynomial hash — 8-byte
    shuffle keys, never text — while the oracle compares gram STRINGS;
    agreement therefore also certifies the rolling hash's injectivity
    on this corpus (a collision would cut a span the oracle keeps and
    hash-mismatch). Production k for the repeat leg is ~50 (the paper's
    operating point) — that cost is the bench's ``dedup_spans_k50``
    point.

    - **para** (r10 fold, ``dedup.remove_repeated_paragraphs``):
      boilerplate removal at paragraph granularity — every paragraph
      whose exact text appears in more than one DISTINCT document is
      dropped from all of them, survivors rebuild in original order
      (Dolma/RefinedWeb recipe). The corpus carries no newlines, so
      the leg first synthesizes a deterministic paragraph structure
      both engines reproduce (tokens chunked in 6s, '\\n'-joined);
      the operator itself shuffles 8-byte xxhash64 paragraph keys,
      the oracle compares paragraph STRINGS — so like the gram legs,
      agreement also certifies hash injectivity on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    rep = dedup.remove_repeated_spans(docs, "doc_id", "text", k=4).select(
        F.lit("repeat").alias("leg"), "doc_id", "text", "n_tokens_removed"
    )
    train = docs.filter(F.pmod("doc_id", F.lit(10)) != 7)
    eval_df = docs.filter(F.pmod("doc_id", F.lit(10)) == 7)
    # eval_broadcast: the eval corpus is tiny by construction (10% of docs),
    # so the registered leg exercises the 100 TB shuffle lever it documents —
    # broadcast-semi the eval gram set instead of sort-merge-shuffling every
    # training gram (plan pinned by tests/test_plan_lint.py).
    dec = dedup.decontaminate_spans(
        train, eval_df, "doc_id", "text", "doc_id", "text", k=4, eval_broadcast=True
    ).select(F.lit("decontam").alias("leg"), "doc_id", "text", "n_tokens_removed")

    toks = text.tokens(F.col("text"))
    n_chunk_hi = F.floor((F.size(toks) - F.lit(1)) / F.lit(6)).cast("int")
    # Empty/whitespace-only docs make n_chunk_hi = -1 and F.sequence(0, -1)
    # DESCENDS to [0, -1], synthesizing two phantom empty paragraphs; gate
    # the synthesis so such docs pass through as '' like the oracle.
    para_text = F.when(
        F.size(toks) > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_chunk_hi),
                lambda i: F.array_join(F.slice(toks, i * F.lit(6) + F.lit(1), 6), " "),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    para_docs = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("__orig_n"),
        para_text.alias("text"),
    )
    para = dedup.remove_repeated_paragraphs(
        para_docs, "doc_id", "text", sep="\n", max_docs=1
    ).select(
        F.lit("para").alias("leg"),
        "doc_id",
        "text",
        (
            F.col("__orig_n")
            - packing.whitespace_token_count(F.col("text")).cast("bigint")
        ).alias("n_tokens_removed"),
    )
    return rep.unionAll(dec).unionAll(para)
