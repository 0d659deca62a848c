"""End-to-end pipeline integration: the whole engine composing.

One synthetic web-crawl increment flows raw → validated → URL-parsed →
Unicode-normalized → quality-gated → per-host capped → incrementally
deduped against a historical signature index → quality-binned →
stratified-sampled → BPE-tokenized → sequence-packed. Every stage is a
DataFrame-in/DataFrame-out operator from this package; the test pins
the pipeline's determinism (two runs over different partitionings,
identical outputs) and each stage's visible effect on the survivor set
— the composition a 100 TB deployment runs nightly.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.operators import dedup
from distributed_computing_platform_mapreduce_spark.operators import validate as V
from distributed_computing_platform_mapreduce_spark.operators.bpe import bpe_encode_ids, bpe_train
from distributed_computing_platform_mapreduce_spark.operators.packing import pack_sequences
from distributed_computing_platform_mapreduce_spark.operators.sampling import (
    quantile_bins,
    stratified_sample_exact,
)
from distributed_computing_platform_mapreduce_spark.operators.text import (
    extract_url_parts,
    normalize_text,
)

_GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank " * 3,
    "pack my box with five dozen liquor jugs before winter arrives early " * 3,
    "distributed systems shuffle data between executors during wide stages " * 3,
    "perceptual hashes summarize images audio and video for deduplication " * 3,
    "tokenizers learn merges from word frequency tables at corpus scale " * 3,
    "sequence packing concatenates documents into fixed length windows " * 3,
]


def _crawl_fixture(spark):
    """A deterministic fake crawl increment with every pathology the
    pipeline exists for: NFC/NFD twins, an exact dup, one hot host the
    per-host cap must bite, short junk, and clean docs — each on its
    own host so the dedup assertions stay crisp."""
    rows = [
        (i, f"https://site{i}.example.com/page", t) for i, t in enumerate(_GOOD)
    ]
    # hot host: four genuinely distinct (gate-passing) pages; cap keeps
    # 2 — texts share no phrasing so the dedup stage cannot also bite
    spam_texts = [
        "breaking celebrity gossip roundup with exclusive red carpet photos " * 3,
        "ten unbelievable kitchen gadgets reviewed by our shopping experts " * 3,
        "daily horoscope predictions for every zodiac sign this coming week " * 3,
        "local weather forecast heavy rain expected across northern regions " * 3,
    ]
    for j, t in enumerate(spam_texts):
        rows.append((20 + j, "https://spam.example.net/p%d" % j, t))
    # NFC/NFD twins of the same visible text: normalize converges them,
    # dedup then keeps the min id
    nfc = unicodedata.normalize("NFC", "café résumé naïve coöperate " * 6)
    nfd = unicodedata.normalize("NFD", "café résumé naïve coöperate " * 6)
    rows.append((100, "https://twin-a.example.com/x", nfc))
    rows.append((101, "https://twin-b.example.com/x", nfd))
    # exact dup of doc 0 on another host
    rows.append((102, "https://mirror.example.org/copy", _GOOD[0]))
    # short junk (fails the min-length gate)
    rows.append((103, "https://junk.example.com/j", "ok"))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def _run_pipeline(spark, raw, history_index):
    # 1. gate ingestion on structural expectations
    V.expect(
        raw,
        checks=[V.not_null("doc_id"), V.not_null("url"), V.matches("url", r"^https?://")],
        unique=[["doc_id"]],
    )
    # 2. URL parts + 3. Unicode normalization
    parsed = extract_url_parts(raw)
    normed = normalize_text(
        parsed, lower=True, strip_accents=True, collapse_whitespace=True
    )
    # 4. cheap quality gate: ≥ 10 whitespace tokens
    gated = normed.filter(F.size(F.split("text", r"\s+")) >= 10)
    # 5. per-host cap (2 docs per host, deterministic hash priority)
    capped = stratified_sample_exact(gated, ["host"], "doc_id", 2)
    # 6. incremental near-dedup against the running index
    survivors, updated_index = dedup.incremental_dedup(
        capped.select("doc_id", "text"), history_index, threshold=0.5
    )
    survivors = survivors.join(capped.select("doc_id", "host"), "doc_id")
    # 7. quality-ish score → equi-population bins → per-bin budget
    #    (budget sized above the fixture so the stage is exercised
    #    without making the survivor assertions depend on hash order)
    scored = survivors.withColumn("score", F.length("text").cast("double"))
    binned, _cuts = quantile_bins(scored, "score", 2)
    sampled = stratified_sample_exact(binned, ["bin"], "doc_id", 10)
    # 8. learned tokenization + 9. packing metadata
    merges = bpe_train(sampled, n_merges=12)
    tokens = bpe_encode_ids(sampled, merges)
    packed = pack_sequences(tokens, id_col="doc_id", max_tokens=64, count_col="n_token_ids")
    return sampled, packed, updated_index


@pytest.mark.usefixtures("spark")
def test_pipeline_end_to_end_composes_and_is_deterministic(spark):
    raw = _crawl_fixture(spark)
    empty_history = dedup.minhash_index(
        raw.filter(F.lit(False)), "doc_id", "text"
    ).localCheckpoint()

    sampled, packed, updated = _run_pipeline(spark, raw, empty_history)
    ids = sorted(r["doc_id"] for r in sampled.select("doc_id").collect())

    # stage effects, each attributable to exactly one operator:
    assert 103 not in ids  # quality gate
    assert 102 not in ids  # exact dup loses to doc 0 (min id wins)
    assert all(i in ids for i in range(6))  # clean docs all survive
    assert 100 in ids and 101 not in ids  # normalized twins → min id
    spam = [i for i in ids if 20 <= i < 24]
    assert len(spam) == 2  # per-host cap bit the hot host
    # packing covers every sampled doc exactly once
    prows = {r["doc_id"]: r for r in packed.collect()}
    assert sorted(prows) == ids
    # the updated index carries the survivors for the next increment
    assert updated.count() == len(ids)

    # determinism: the ENTIRE pipeline is a pure function of the input
    sampled2, packed2, _ = _run_pipeline(spark, raw.repartition(7), empty_history)
    assert sorted(r["doc_id"] for r in sampled2.select("doc_id").collect()) == ids
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, packed2.collect()))
    assert a == b

    # a second increment: a dup of a round-1 survivor dies INDEX-ONLY
    # (its text never re-read), a fresh doc passes and extends the index
    inc2 = spark.createDataFrame(
        [
            (500, "https://rerun.example.com/again", _GOOD[0]),
            (
                501,
                "https://fresh.example.net/new",
                "a wholly new second wave document sharing vocabulary with nobody " * 3,
            ),
        ],
        "doc_id long, url string, text string",
    )
    s2, _p2, u2 = _run_pipeline(spark, inc2, updated.localCheckpoint())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids2 == [501]
    assert u2.count() == len(ids) + 1


def test_retrieval_pipeline_chunk_embed_pool_ann(spark):
    """The retrieval composition: chunk_tokens → embed_texts per chunk →
    mean_pool_embeddings back to one vector per doc → cosine_topk_exact.
    A doc REUSING another's text must rank as its own nearest neighbor;
    the pooled corpus also flows through the LSH path unchanged."""
    from distributed_computing_platform_mapreduce_spark.operators import similarity
    from distributed_computing_platform_mapreduce_spark.operators.text import chunk_tokens

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank while "
        "herons wade through shallow water hunting silver fish at dawn",
        "distributed query engines exchange shuffle blocks between executors and "
        "spill sorted runs to local disk under memory pressure during wide joins",
        "a sourdough starter needs regular feeding with equal parts flour and "
        "water kept warm until bubbles double the volume overnight",
    ]
    rows = [(i, t * 3) for i, t in enumerate(base)]
    # doc 10 = doc 1's text with a short suffix — its nearest neighbor
    # through the whole pipeline must be doc 1
    rows.append((10, base[1] * 3 + " with adaptive execution enabled"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    chunks = chunk_tokens(docs, "doc_id", "text", chunk_size=16, overlap=4)
    assert chunks.count() > len(rows)  # genuinely chunked
    emb = similarity.embed_texts(
        chunks.withColumnRenamed("chunk_text", "text"), id_col="doc_id", dim=64
    )
    pooled = similarity.mean_pool_embeddings(emb, "id").withColumnRenamed(
        "id", "vec_id"
    )
    nn = similarity.cosine_topk_exact(
        pooled, pooled.filter(F.col("vec_id") == 10), k=1
    ).collect()
    assert len(nn) == 1 and nn[0]["neighbor_id"] == 1 and nn[0]["cos"] > 0.9

    lsh = similarity.cosine_topk_lsh(
        pooled, pooled.filter(F.col("vec_id") == 10), dim=64, k=1, n_planes=4, bands=8
    ).collect()
    assert lsh and lsh[0]["neighbor_id"] == 1
