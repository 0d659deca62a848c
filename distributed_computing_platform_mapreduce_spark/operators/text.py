"""Text-analysis operators over the documents table.

Language ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash fingerprinting.
All built-in expressions — no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deterministic, embedded (no external model); real pipelines would swap
# in fastText — the operator contract (text → lang, score) is the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}

# BPE-ish tokenizer regex: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + individual symbols
    (regexp_extract_all, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit count over the document's token set."""
    toks = F.array_distinct(F.transform(tokens(text), lambda t: F.lower(t)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over language marker scores; 'und' when nothing matches."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def quality_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: list[Column] | None = None,
) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite score in [0,1]. ``extra_cols`` are
    appended to the projection so callers can compute further per-doc
    expressions (e.g. the fingerprint) in the same single scan instead
    of a self-join."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count_ws(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(
        F.filter(F.transform(tokens(t), lambda x: F.lower(x)), lambda x: F.array_contains(en_stop, x))
    )
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    mean_word_len = (n_chars - n_tok + 1).cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.when(n_tok >= 5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.0, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        token_count_bpe(t).alias("n_bpe_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
        *(extra_cols or []),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-tokenization step of a training pipeline (context-sized
    pieces with overlap so no boundary text is lost).

    Emits (id, chunk_idx, n_chunk_tokens, chunk_text). Pure expressions:
    a stepped ``sequence`` over window starts, ``slice`` + ``concat_ws``
    per window — the same JVM-side shape as ``word_shingles``, so it
    scales as a linear scan with no Python in the row path. Documents
    shorter than ``chunk_size`` yield exactly one chunk; empty documents
    yield none.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # Window starts 1, 1+step, 1+2·step … covering the final token:
    # last start = the greatest start whose window begins within the doc.
    last_start = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_size)).cast("double") / F.lit(step))).cast("int")
        * F.lit(step)
        + F.lit(1),
    )
    starts = F.when(n > 0, F.sequence(F.lit(1), last_start, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.slice(toks, s, chunk_size).alias("toks"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.explode(chunks).alias("c"),
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.toks").alias("n_chunk_tokens"),
        F.concat_ws(" ", "c.toks").alias("chunk_text"),
    )


def fingerprint(text: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling-hash document fingerprint over character codes:
    h = Σ (h·base + ascii(c)) mod p — a sequential integer fold
    (``F.aggregate``), exact and order-defined, so SQL-oracle-able."""
    chars = F.split(text, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 1.0
) -> DataFrame:
    """Per-document cross-entropy under an add-α bigram LM trained on the
    corpus itself — the CCNet/Gopher-style quality signal: documents
    whose token transitions are unlike the corpus (boilerplate, garbled
    text, wrong language) score low and can be filtered or
    quality-weighted. Returns ``(id, n_bigrams, avg_logp)`` with
    ``avg_logp = mean over bigram positions of
    ln((c(w1,w2)+α)/(c(w1)+α·V))``; docs with <2 tokens have no bigrams
    and are absent (no transitions to score).

    Scale shape: positions via ``posexplode`` (scan-side), bigrams via a
    ``lag`` window partitioned by doc — state is one doc's tokens, one
    shuffle on id. Count tables shuffle on their own keys: c(w1,w2) and
    c(w1) join back on the same keys the bigram rows already carry, and
    the join strategy is left to Spark's size estimates / AQE — on a
    web-scale corpus the distinct-token set (URLs, typos, numbers) is
    effectively unbounded, so forcing a broadcast of c(w1) would risk
    OOM exactly where this module claims to scale; only the ONE-ROW
    vocab-size scalar rides as an explicit broadcast. All JVM
    expressions; ``ln`` keeps the driver row honest only under rounding
    (see the registered query).
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bi = (
        toks.select("id", F.lag("tok").over(w).alias("w1"), F.col("tok").alias("w2"))
        .filter(F.col("w1").isNotNull())
    )
    big = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = toks.agg(F.countDistinct("tok").alias("v"))
    logp = F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    return (
        bi.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(F.count("*").alias("n_bigrams"), F.avg(logp).alias("avg_logp"))
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFKC",
    lower: bool = False,
    strip_accents: bool = False,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode-normalize a text column — the preprocessing step web
    corpora need BEFORE dedup/tokenization (NFC-vs-NFD twins of the
    same visible text otherwise hash apart, full-width forms miss
    ASCII-keyed vocab, etc.). Spark has no built-in Unicode
    normalization, so this is an Arrow-batched ``unicodedata`` pass —
    one scan, no shuffle, composing with every downstream operator.

    ``strip_accents`` decomposes to NFD and drops combining marks
    (then re-applies ``form``); ``collapse_whitespace`` maps runs of
    Unicode whitespace to single spaces and trims. Applied in the
    deterministic order normalize → strip_accents → lower → whitespace,
    so the output is a pure function of (text, flags)."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC|NFD|NFKC|NFKD, got {form!r}")
    ensure_shipped(df.sparkSession)
    out = out_col or text_col

    def one(t: str) -> str:
        s = unicodedata.normalize(form, t)
        if strip_accents:
            s = unicodedata.normalize(
                form,
                "".join(
                    c for c in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(c)
                ),
            )
        if lower:
            s = s.lower()
        if collapse_whitespace:
            s = " ".join(s.split())
        return s

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: one(t) if t is not None else None)

    return df.withColumn(out, norm(F.col(text_col)))


#: URL pattern: scheme://host[:port][/path][?query][#fragment] —
#: anchored, case-normalized host. Optional userinfo (user[:pass]@) is
#: consumed before the host so credentials never leak into host/domain
#: columns. The path group ``((?:/[^?#]*)?)`` requires a leading ``/``
#: (or is empty), which pins the port digit run to a component boundary:
#: a malformed authority like ``http://h:8a/p`` fails WHOLE instead of
#: backtracking into port=8, path="a/p" (documented contract: malformed
#: → empty parts, port −1). Deliberately RE2-compatible (no lookahead):
#: DuckDB replays the identical pattern in the driver oracle.
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:[^/?#@]*@)?([^/:?#@]+)(?::(\d+))?((?:/[^?#]*)?)(?:\?([^#]*))?(?:#(.*))?$"


def extract_url_parts(
    df: DataFrame, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Split a URL column into typed parts — ``scheme``, ``host``,
    ``registered_domain`` (last two host labels — the statistical
    workhorse for per-site caps/dedup; a full public-suffix list is a
    deployment swap-in), ``port`` (int, −1 if absent), ``path``,
    ``query``, ``fragment``. Pure JVM ``regexp_extract`` — one scan,
    codegen, no Python; malformed URLs yield empty strings (and −1
    port), never an error row."""
    c = F.col(url_col)
    host = F.lower(F.regexp_extract(c, _URL_RE, 2))
    p = prefix
    labels = F.split(host, r"\.")
    nlab = F.size(labels)
    regdom = F.when(
        nlab >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    return df.select(
        "*",
        F.regexp_extract(c, _URL_RE, 1).alias(f"{p}scheme"),
        host.alias(f"{p}host"),
        regdom.alias(f"{p}registered_domain"),
        # cast through long, then range-check: a silly \d+ run larger
        # than int (port spam) must yield -1, not an overflow NULL
        F.coalesce(
            F.when(
                F.regexp_extract(c, _URL_RE, 3) != "",
                F.when(
                    F.regexp_extract(c, _URL_RE, 3).cast("long").between(0, 65535),
                    F.regexp_extract(c, _URL_RE, 3).cast("long").cast("int"),
                ),
            ),
            F.lit(-1),
        ).alias(f"{p}port"),
        F.regexp_extract(c, _URL_RE, 4).alias(f"{p}path"),
        F.regexp_extract(c, _URL_RE, 5).alias(f"{p}query"),
        F.regexp_extract(c, _URL_RE, 6).alias(f"{p}fragment"),
    )
