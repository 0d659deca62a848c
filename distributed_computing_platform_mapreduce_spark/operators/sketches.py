"""Mergeable distinct-count sketches: incremental corpus statistics.

"How many distinct tokens / users / URLs does the corpus have" is a
full shuffle of every distinct value when asked exactly — and at 100 TB
it gets asked after EVERY increment. The mergeable answer is the
Apache DataSketches HLL family Spark 4 ships natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):
sketch each increment once (bytes per group, not values), persist the
sketch table, and answer every later question — per-group counts,
whole-corpus rollups, increment-over-increment growth — by merging
kilobyte blobs. The relative error is ~1.04/√2^lgK (~1.6% at the
default lgK=12); the exact pipeline never needs to re-run.

Same storage pattern as ``dedup.minhash_index``: the sketch table IS
the persisted artifact; raw increments are never re-read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_table(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` → ``(*group_cols,
    sketch binary)``. One scan, partial-aggregated shuffle (sketches
    merge map-side — the whole point); write the result to parquet as
    the increment's distinct-count artifact."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def hll_merge_tables(tables: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge per-increment sketch tables → ``(*group_cols, sketch)``
    covering the union. Kilobytes per group move; the raw data does
    not."""
    if not tables:
        raise ValueError("hll_merge_tables needs at least one table")
    unioned = tables[0]
    for t in tables[1:]:
        unioned = unioned.unionAll(t)
    return unioned.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )


def hll_estimate(table: DataFrame, group_cols: list[str]) -> DataFrame:
    """Readout: ``(*group_cols, n_distinct long)`` from a sketch table."""
    return table.select(
        *group_cols, F.hll_sketch_estimate("sketch").alias("n_distinct")
    )


def hll_total(table: DataFrame) -> int:
    """Whole-table distinct estimate: union every group's sketch into
    one and read it — a single bounded-driver scalar."""
    row = table.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n")
    ).collect()[0]
    # an EMPTY sketch table unions to NULL — zero distinct, not a crash
    return int(row["n"]) if row["n"] is not None else 0


# ---------------------------------------------------------------------------
# Bloom membership filter — the runtime-prefilter sketch
# ---------------------------------------------------------------------------
#
# Spark's AQE can inject `bloom_filter_agg`-based runtime filters into
# fact-dim joins, but the aggregate is NOT a public SQL function in
# every build (UNRESOLVED_ROUTINE here), and AQE decides for you. This
# is the explicit, persistable version of the same 100 TB lever: build
# a fixed-size bit array over a dimension's keys (128 KB regardless of
# key count — the regime where broadcasting the exact key set stops
# being possible), persist/merge it like the HLL tables, and drop fact
# rows at the SCAN, before any shuffle. No false negatives by
# construction; false-positive rate (1 − e^(−k·n/m))^k is sized by the
# caller (the default 2^20 bits / 7 hashes holds FP < 1e-10 for
# n ≤ 10k keys; raise m_bits with n).


def _bloom_positions_cols(key_col: str, m_bits: int, k: int, seed: int):
    """k bit positions per key as Spark columns — Kirsch–Mitzenmacher
    double hashing over two xxhash64 draws. Both hashes reduce mod
    m BEFORE the i-multiply so ANSI int64 arithmetic cannot overflow
    (i·h2 with a raw 63-bit h2 would). The stride is
    ``h2 = 1 + pmod(draw, m-1)`` — never zero — so the k positions can
    never all collapse onto h1 (with a mod-m stride, a key whose second
    draw ≡ 0 mod m would effectively get ONE hash and its
    false-positive exposure would rise from (kn/m)^k to ~kn/m)."""
    m = F.lit(int(m_bits)).cast("long")
    h1 = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), m)
    h2 = F.lit(1).cast("long") + F.pmod(
        F.xxhash64(F.col(key_col), F.lit(seed + 1)), m - F.lit(1).cast("long")
    )
    return [F.pmod(h1 + F.lit(i).cast("long") * h2, m) for i in range(k)]


_BLOOM_META_COLS = ("m_bits", "k", "seed")


def _bloom_check_params(name: str, got: tuple, want: tuple) -> None:
    if got != want:
        raise ValueError(
            f"{name}: bloom parameter mismatch — artifact was built with "
            f"(m_bits, k, seed)={want} but got {got}; a mismatched probe/merge "
            "would silently produce false negatives, so it is refused"
        )


def bloom_filter_table(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    seed: int = 0,
) -> DataFrame:
    """Build the filter as a SPARSE word table ``(word_idx long,
    bits long, m_bits long, k int, seed long)`` — only words with at
    least one set bit appear, so the artifact is at most ``m_bits/64``
    rows (16384 at the default) and usually far fewer. One scan:
    explode each key to its k positions, partial-aggregated ``bit_or``
    shuffle. Persist to parquet as the increment's membership artifact.

    The build parameters ride WITH the artifact as constant columns and
    are validated by ``bloom_probe`` / ``bloom_merge_tables`` — a probe
    or merge under mismatched (m_bits, k, seed) computes positions mod
    the wrong m and silently yields false negatives, so it is refused
    at the artifact level rather than trusted to the caller.

    NULL contract: NULL keys are dropped at build time and never
    admitted at probe time — matching SQL semi-join semantics, where
    ``key IN (...)`` never admits NULL (Spark's xxhash64 treats NULL as
    a no-op, so hashing it would set real bits and over-admit)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pos = F.explode(F.array(*_bloom_positions_cols(key_col, m_bits, k, seed)))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos.alias("pos"))
        .select(
            (F.col("pos") / F.lit(64)).cast("long").alias("word_idx"),
            # python-API shiftleft takes only a literal shift — SQL form
            # accepts the per-row bit offset
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "word"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("bits"))
        .select(
            "word_idx",
            "bits",
            F.lit(int(m_bits)).cast("long").alias("m_bits"),
            F.lit(int(k)).cast("int").alias("k"),
            F.lit(int(seed)).cast("long").alias("seed"),
        )
    )


def bloom_merge_tables(tables: list[DataFrame]) -> DataFrame:
    """Merge per-increment filters: union + one ``bit_or`` per word —
    the same mergeable-artifact shape as ``hll_merge_tables``. The
    merged filter answers membership for the UNION of the increments'
    key sets, and carries the shared (m_bits, k, seed) forward.

    Incompatible inputs (any m_bits/k/seed disagreement) are REFUSED —
    OR-ing bitmaps built under different hash geometry is not a Bloom
    filter and yields false negatives. The validation is one bounded
    driver read of the distinct parameter triples (the artifacts are
    ≤ m_bits/64 rows each; in the persisted-artifact workflow this is a
    re-scan of small parquet, not a recompute)."""
    if not tables:
        raise ValueError("bloom_merge_tables needs at least one table")
    unioned = tables[0]
    for t in tables[1:]:
        unioned = unioned.unionAll(t)
    params = sorted(
        tuple(r) for r in unioned.select(*_BLOOM_META_COLS).distinct().collect()
    )
    if len(params) > 1:
        _bloom_check_params("bloom_merge_tables", params[1], params[0])
    return unioned.groupBy("word_idx", *_BLOOM_META_COLS).agg(
        F.bit_or("bits").alias("bits")
    ).select("word_idx", "bits", *_BLOOM_META_COLS)


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom_table: DataFrame,
    m_bits: int | None = None,
    k: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Keep the rows of ``df`` whose ``key_col`` the filter admits —
    the scan-side prefilter. The word table collects to a numpy bitmap
    (≤ m_bits/8 bytes — 128 KB at the default; the bounded collect IS
    the design: that is what rides to every task) and the k hash draws
    are computed JVM-side; the only Python work is the Arrow-batched
    bit test ``bitmap[pos >> 6] >> (pos & 63) & 1`` — the
    closure-shipped-artifact pattern the int8 GEMM scan and the pinned
    codebooks use. No shuffle, no join: rows drop inside the scan
    stage.

    The hash geometry (m_bits, k, seed) is read FROM the artifact's
    metadata columns; passing any of them explicitly only asserts they
    match the build (mismatch raises — probing under the wrong geometry
    silently yields false negatives). NULL probe keys are never
    admitted, matching SQL semi-join semantics (see
    ``bloom_filter_table``). An EMPTY artifact admits nothing — the
    semi join against an empty key set."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    # pandas/Arrow fetch, not collect(): a megabit-scale filter's word
    # table is ~m_bits/64 rows, and Row objects would cost ~3 orders of
    # magnitude more driver memory than two int64 numpy columns
    pdf = bloom_table.select("word_idx", "bits", *_BLOOM_META_COLS).toPandas()
    if pdf.empty:
        return df.filter(F.lit(False))
    art_params = set(
        zip(
            pdf["m_bits"].astype(int), pdf["k"].astype(int), pdf["seed"].astype(int)
        )
    )
    if len(art_params) > 1:
        a, b = sorted(art_params)[:2]
        _bloom_check_params("bloom_probe (artifact self-inconsistent)", b, a)
    art_m, art_k, art_seed = (int(x) for x in next(iter(art_params)))
    for name, passed in (("m_bits", m_bits), ("k", k), ("seed", seed)):
        if passed is not None and int(passed) != {"m_bits": art_m, "k": art_k, "seed": art_seed}[name]:
            _bloom_check_params(
                f"bloom_probe ({name})", (m_bits, k, seed), (art_m, art_k, art_seed)
            )
    m_bits, k, seed = art_m, art_k, art_seed
    n_words = m_bits // 64
    words = np.zeros(n_words, dtype=np.int64)
    idx = pdf["word_idx"].to_numpy(dtype=np.int64)
    if idx.size and (int(idx.min()) < 0 or int(idx.max()) >= n_words):
        raise ValueError(
            f"bloom word_idx outside m_bits={m_bits}: corrupt artifact"
        )
    words[idx] = pdf["bits"].to_numpy(dtype=np.int64)
    bitmap = words.view(np.uint64)

    kk = int(k)

    @F.pandas_udf("boolean")
    def admits(hs: pd.DataFrame) -> pd.Series:
        # Kirsch–Mitzenmacher positions recomputed HERE from the two
        # JVM hash draws — shipping (h1, h2) instead of k position
        # columns cuts the Arrow transfer k/2-fold (measured: the
        # transfer, not the bit test, dominates probe cost at k=7).
        # Same int64 arithmetic as _bloom_positions_cols: h1, h2 < m,
        # i ≤ k, so h1 + i·h2 < (k+1)·m ≪ 2^63 — no overflow.
        h1 = hs["h1"].to_numpy(dtype=np.int64)
        h2 = hs["h2"].to_numpy(dtype=np.int64)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(kk):
            p = (h1 + i * h2) % m_bits
            ok &= (
                (bitmap[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)
            ).astype(bool)
        return pd.Series(ok)

    m = F.lit(int(m_bits)).cast("long")
    h_struct = F.struct(
        F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), m).alias("h1"),
        (
            F.lit(1).cast("long")
            + F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + 1)), m - F.lit(1).cast("long"))
        ).alias("h2"),
    )
    # NULL keys are never admitted (semi-join semantics): xxhash64 of a
    # NULL input degenerates to the seed hash, so without this guard a
    # NULL probe key could alias a real key's bit pattern
    return df.filter(F.col(key_col).isNotNull() & admits(h_struct))
