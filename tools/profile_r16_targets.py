"""Per-phase profiling of the r16 optimization targets (guide §1).

Times each suspect operator's internal phases with the noop sink /
bounded actions so the expensive stage is identified BEFORE any rewrite.
Run AFTER the bench (never concurrently — host contention poisons both).

Usage: python tools/profile_r16_targets.py [target ...]
Targets: stream_incr incr_1gb bpe cc paras spans
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_computing_platform_mapreduce_spark import get_spark  # noqa: E402
from distributed_computing_platform_mapreduce_spark.sources.catalog import (  # noqa: E402
    load_table,
)

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(label, fn, n=3):
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    med = statistics.median(samples)
    print(f"  {label:55s} {med:8.3f}s  (min {min(samples):.3f} max {max(samples):.3f})")
    return med


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_stream_incr(spark):
    print("== stream_incr_dedup_3batch phases ==")
    from distributed_computing_platform_mapreduce_spark.operators import dedup
    from distributed_computing_platform_mapreduce_spark.streaming.sinks import (
        incremental_dedup_sink,
    )

    docs = load_table(spark, SF_DIR, "documents")
    waves = [
        docs.filter(F.pmod("doc_id", F.lit(3)) == w).localCheckpoint(eager=True)
        for w in (0, 1, 2)
    ]

    def drain():
        root = tempfile.mkdtemp(prefix="prof_incr_sink_")
        try:
            sink = incremental_dedup_sink(
                os.path.join(root, "index"), os.path.join(root, "out")
            )
            for bid, w in enumerate(waves):
                sink(w, bid)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    t("full 3-trigger drain", drain, n=2)

    # phase split for ONE trigger shape: minhash_index of one wave
    def mh():
        noop(dedup.minhash_index(waves[1], "doc_id", "text"))

    t("minhash_index(wave) alone (noop)", mh)

    # incremental_dedup survivors only vs survivors+index, vs empty hist
    hist = dedup.minhash_index(waves[0], "doc_id", "text").localCheckpoint(eager=True)

    def surv_only():
        s, _u = dedup.incremental_dedup(waves[1], hist)
        noop(s)

    t("incremental_dedup survivors only (noop)", surv_only)

    def surv_and_index():
        s, u = dedup.incremental_dedup(waves[1], hist)
        noop(s)
        noop(u)

    t("incremental_dedup survivors + full index (2 noops)", surv_and_index)

    # per-trigger IO: write survivors + full index parquet
    def trigger_io():
        root = tempfile.mkdtemp(prefix="prof_trig_")
        try:
            s, u = dedup.incremental_dedup(waves[1], hist)
            s.withColumn("__batch_id", F.lit(1)).write.mode("overwrite").partitionBy(
                "__batch_id"
            ).parquet(os.path.join(root, "out"))
            u.write.mode("overwrite").parquet(os.path.join(root, "index", "v=1"))
        finally:
            shutil.rmtree(root, ignore_errors=True)

    t("one trigger incl. parquet writes", trigger_io)


def profile_incr_1gb(spark):
    print("== incremental_increment_1gb phases ==")
    from bench import REF_SCALES, _ensure_unique_docs_corpus  # noqa: E402

    from distributed_computing_platform_mapreduce_spark.operators import dedup

    big = spark.read.parquet(_ensure_unique_docs_corpus(spark, "1gb", REF_SCALES["1gb"]))
    hist_big = dedup.minhash_index(
        big.filter(F.pmod("doc_id", F.lit(2)) == 0), "doc_id", "text"
    ).localCheckpoint(eager=True)
    new_big = big.filter(F.pmod("doc_id", F.lit(2)) == 1)

    def shingles():
        noop(dedup.shingle_rows(new_big, "doc_id", "text", 3))

    t("shingle_rows(new half) (noop)", shingles, n=2)

    def hashed_only():
        sh = dedup.shingle_rows(new_big, "doc_id", "text", 3)
        noop(sh.select("id", F.pmod(F.xxhash64("shingle"), F.lit((1 << 31) - 1)).alias("h")))

    t("shingles + xxhash (noop)", hashed_only, n=2)

    def mh_index():
        noop(dedup.minhash_index(new_big, "doc_id", "text"))

    t("minhash_index(new half) (noop)", mh_index, n=2)

    def pairs_only():
        new_index = dedup.minhash_index(new_big, "doc_id", "text")
        p = dedup.incremental_minhash_pairs(new_index, hist_big)
        noop(p)

    t("minhash_index + pairs (noop)", pairs_only, n=2)

    def full():
        _s, u = dedup.incremental_dedup(new_big, hist_big)
        assert (
            u.agg(F.sum(F.element_at("signature", 1) + F.col("sz"))).collect()[0][0]
            is not None
        )

    t("full incremental_dedup (bench shape)", full, n=2)


def profile_bpe(spark):
    print("== bpe_train phases ==")
    from distributed_computing_platform_mapreduce_spark.operators import bpe

    docs = load_table(spark, SF_DIR, "documents")

    def wc():
        noop(bpe.word_counts(docs))

    t("word_counts (noop)", wc)

    def train8():
        m = bpe.bpe_train(docs, n_merges=8)
        assert len(m) >= 0

    t("bpe_train n_merges=8", train8, n=2)

    def train64():
        m = bpe.bpe_train(docs, n_merges=64)
        assert len(m) >= 0

    t("bpe_train n_merges=64 (bench shape)", train64, n=2)


def profile_bpe_incr_1gb(spark):
    print("== bpe_train_incr_30k_1gb phases ==")
    from bench import REF_SCALES, _ensure_unique_docs_corpus  # noqa: E402

    from distributed_computing_platform_mapreduce_spark.operators import bpe

    big = spark.read.parquet(_ensure_unique_docs_corpus(spark, "1gb", REF_SCALES["1gb"]))

    def wc():
        noop(bpe.word_counts(big))

    t("word_counts 1gb (noop)", wc, n=2)

    wcs = bpe.word_counts(big)
    n = wcs.count()
    print(f"  word table rows: {n}")
    rows = wcs.collect()
    wc_list = [(r["word"], r["count"]) for r in rows]

    def driver_loop():
        m = bpe._train_incremental_from_counts(wc_list, 30000, 2)
        assert len(m) >= 0

    t("driver incremental loop 30k merges", driver_loop, n=2)


def profile_cc(spark):
    print("== dedup_cc_survivors phases ==")
    from distributed_computing_platform_mapreduce_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")

    def lsh_pairs():
        p = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
        )
        noop(p)

    t("minhash_lsh_pairs (noop)", lsh_pairs, n=2)

    def cc_only():
        p = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
        ).localCheckpoint(eager=False)
        comps = dedup.connected_components_twostar(p)
        noop(comps)

    t("pairs + CC twostar (noop)", cc_only, n=2)

    from distributed_computing_platform_mapreduce_spark.plans import QUERIES

    def suite_cc():
        out = QUERIES["dedup_survivors_suite"](spark, SF_DIR).filter(
            F.col("policy") == "cc"
        )
        assert out.agg(F.bit_xor(F.xxhash64(F.struct("*")))).collect()[0][0] is not None

    t("dedup_survivors_suite filter cc (bench shape)", suite_cc, n=2)


def profile_paras(spark):
    print("== remove_repeated_paragraphs ==")
    from distributed_computing_platform_mapreduce_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")

    def paras():
        noop(dedup.remove_repeated_paragraphs(docs, "doc_id", "text"))

    t("remove_repeated_paragraphs (noop)", paras)


def profile_spans(spark):
    print("== remove_repeated_spans (sf0.1 + gram pass split) ==")
    from distributed_computing_platform_mapreduce_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")

    def grams():
        noop(dedup._gram_start_rows(docs, "doc_id", "text", 50))

    t("gram pass alone (noop)", grams)

    def spans():
        out = dedup.remove_repeated_spans(docs, "doc_id", "text", k=50, min_count=2)
        assert out.agg(F.sum("n_tokens_removed")).collect()[0][0] is not None

    t("remove_repeated_spans (bench shape)", spans)


PROFILES = {
    "stream_incr": profile_stream_incr,
    "incr_1gb": profile_incr_1gb,
    "bpe": profile_bpe,
    "bpe_incr_1gb": profile_bpe_incr_1gb,
    "cc": profile_cc,
    "paras": profile_paras,
    "spans": profile_spans,
}


def main():
    targets = sys.argv[1:] or list(PROFILES)
    spark = get_spark(
        "r16-profile",
        master=f"local[{CPUS}]",
    )
    for name in targets:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        PROFILES[name](spark)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
