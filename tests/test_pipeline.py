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


def test_multimodal_curation_recipe_cross_modality(spark):
    """r7 verdict item 7: the FULL multimodal curation composition in one
    call — text gates + exact/near text dedup PLUS media near-dedup
    (image dHash, audio band-energy prints, video frame prints → the
    shared hamming block join → CC → min-id survivors), down to one
    survivor table. Fixture carries a pathology per stage: an exact text
    dup, a transitive text near-dup, a gate-fail doc, a JPEG re-encode
    image twin, an amplitude-scaled audio twin, and a truncated video
    twin — each must die through ITS stage, everything else survives."""
    import numpy as np
    import pandas as pd

    from distributed_computing_platform_mapreduce_spark.operators import curation
    from distributed_computing_platform_mapreduce_spark.operators import multimodal as mm
    from distributed_computing_platform_mapreduce_spark.operators.jpeg import encode_jpeg

    def block_img(seed, w=64, h=64, grid=8):
        x = np.arange(grid * grid * 3, dtype=np.uint64) + np.uint64(
            (seed * 0x9E3779B97F4A7C15) % (1 << 64)
        )
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
        b = (x & np.uint64(0xFF)).astype(np.uint8).reshape(grid, grid, 3)
        return mm.resize_nearest(b, w, h)

    def melody(seed, n=8000, rate=8000):
        seg = n // 8
        out = np.zeros(n)
        for k in range(8):
            t = np.arange(seg) / rate
            f1 = 150 + ((seed * 131 + k * 379) % 1700)
            f2 = 300 + ((seed * 241 + k * 523) % 3300)
            out[k * seg : (k + 1) * seg] = 9000 * np.sin(
                2 * np.pi * f1 * t
            ) + 5000 * np.sin(2 * np.pi * f2 * t)
        return np.clip(out, -32768, 32767).astype(np.int16)

    a_text = (
        "the quick brown fox jumps over the lazy dog near the old river bank today"
    )
    texts = {
        0: a_text,
        1: a_text,                     # exact text dup → dies (0 survives)
        2: a_text + " and tomorrow",   # text near-dup of A → dies via CC
        3: "pack my box with five dozen liquor jugs before the long winter arrives",
        4: "xx yy",                    # fails the min_tokens gate
        5: "distributed systems shuffle data between executors during wide stages",
        6: "tokenizers learn merge tables from word frequency counts at corpus scale",
        7: "sequence packing concatenates documents into fixed length training windows",
    }
    docs = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")

    img3 = block_img(12)
    frames0 = np.stack([block_img(100 + f, 32, 32)[:, :, 0] for f in range(8)])
    media_rows = [
        # images: docs 0, 3 distinct; doc 5 = JPEG re-encode twin of doc 3
        (0, "image", mm.encode_ppm(block_img(11))),
        (3, "image", mm.encode_ppm(img3)),
        (5, "image", encode_jpeg(img3, quality=85)),
        # audio: doc 6; doc 7 = amplitude-scaled twin of 6
        (6, "audio", mm.encode_wav(melody(1), 8000)),
        (7, "audio", mm.encode_wav((melody(1) * 0.4).astype(np.int16), 8000)),
        # video: doc 0; doc 2 = truncated twin of 0 (pairs, min-id 0 wins)
        (0, "video", mm.encode_y4m(frames0)),
        (2, "video", mm.encode_y4m(frames0[:5])),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(
            [(i, k, bytearray(p), -1, -1, 1) for i, k, p in media_rows],
            columns=["media_id", "kind", "payload", "width", "height", "n_frames"],
        ),
        schema=mm.MEDIA_SCHEMA,
    )

    out = curation.multimodal_curation_recipe(
        docs,
        media,
        lm_percentile_floor=0,  # skip the LM floor: stage deaths stay attributable
    )
    survivors = sorted(r["doc_id"] for r in out.collect())
    # 1 exact-dup, 2 text-near-dup (and video twin), 4 gate-fail,
    # 5 image twin of 3, 7 audio twin of 6 → survivors 0, 3, 6
    assert survivors == [0, 3, 6]

    # stage attribution: with media dedup OFF (text recipe alone),
    # 5 and 7 would have survived — the media stage is what kills them
    text_only = sorted(
        r["doc_id"]
        for r in curation.curation_recipe(docs, lm_percentile_floor=0).collect()
    )
    assert text_only == [0, 3, 5, 6, 7]

    # media pair legs each fired on their own modality
    pairs = {
        (r["id_a"], r["id_b"])
        for r in curation.media_neardup_pairs(media).collect()
    }
    assert (3, 5) in pairs and (6, 7) in pairs and (0, 2) in pairs
