"""Sequence packing for LLM training data: concat-and-chunk.

Pretraining pipelines concatenate the token stream of an ordered corpus
and cut it into fixed-size sequences (``max_tokens``); each document
lands at a deterministic (sequence, offset) and may straddle a cut.
This operator computes that assignment as metadata — (doc_id, n_tokens,
seq_id, seq_offset, straddles) — the shuffle-free precursor to actually
materializing packed token arrays with a tokenizer.

No reference parity to cite: the reference has no notion of token
streams; this belongs to the training-data-pipeline extension surface
(SURVEY §6) beside dedup/sampling/quality scoring.

Scale design — the global exclusive prefix sum is the whole problem:

- A single ``Window.orderBy`` with no ``partitionBy`` funnels the corpus
  through ONE task (Spark even warns) — the classic scale-killer. We
  run the textbook two-phase distributed scan instead:

  1. ``repartitionByRange(doc_id)`` gives totally ordered partitions;
     ``spark_partition_id`` tags rows with their rank-order partition.
  2. Per-partition token totals (one tiny row per partition) get their
     own exclusive prefix sum — a window over ``n_partitions`` rows,
     negligible by construction — and broadcast-join back as offsets.
  3. Within each partition, a ``partitionBy(pid)`` window (parallel)
     adds the local exclusive cumsum to the partition offset.

- Branch consistency: steps 2 and 3 both consume the range exchange;
  Spark's ReusedExchange collapses the identical subplans, so both see
  the SAME partition boundaries in one job. We additionally pin the
  plan with ``localCheckpoint(eager=False)`` so even multi-action
  consumers (count + collect, or a retried stage) can't observe two
  different samplings of the range partitioner.
- Shuffle ledger: one range exchange of (id, n_tokens) — O(8+4 bytes)
  per doc, no text — plus a broadcast of n_partitions offset rows.
  At 100 TB of *text* the shuffled metadata is a few GB; n_partitions
  rows ride the driver like any scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_computing_platform_mapreduce_spark.operators.text import token_count_ws


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count — DELEGATES to ``text.token_count_ws`` so
    there is exactly one definition of the tokenization that both
    ``text_stats`` and ``sequence_packing`` oracles replay (a silent
    divergence between copies would break oracle parity; r6 review)."""
    return token_count_ws(text)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_partitions: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Assign each document its (seq_id, seq_offset) under concat-and-
    chunk packing of the ``id_col``-ordered token stream.

    Output: (doc_id, n_tokens bigint, seq_id bigint, seq_offset bigint,
    straddles boolean). ``straddles`` marks docs cut by a sequence
    boundary. Deterministic: a pure function of (corpus, max_tokens) —
    partitioning only changes WHERE rows are computed, never the global
    prefix sum they receive.

    ``count_col`` (late-r6) packs by a caller-supplied per-doc token
    count instead of the whitespace default — the hook that lets a REAL
    tokenizer drive packing (``bpe.bpe_encode``'s ``n_bpe_tokens``
    composes directly; see the composition test).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    count_expr = (
        F.col(count_col)
        if count_col is not None
        else whitespace_token_count(F.col(text_col))
    )
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        count_expr.cast("bigint").alias("n_tokens"),
    )
    if n_partitions:
        t = t.repartitionByRange(n_partitions, "doc_id")
    else:
        t = t.repartitionByRange("doc_id")
    ranged = t.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)

    # tiny: one row per partition; the no-partitionBy window is over
    # n_partitions rows by construction, not the corpus
    ptot = ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__psum"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    poff = ptot.select(
        "__pid", F.coalesce(F.sum("__psum").over(woff), F.lit(0)).alias("__poff")
    )

    wloc = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.col("__poff") + F.coalesce(F.sum("n_tokens").over(wloc), F.lit(0))
    # exact integer floor-div: (cum - cum % m) is a multiple of m, so the
    # double division is exact (until 2^53 total tokens — ~400 PB of text)
    seq_id = ((cum - cum % F.lit(max_tokens)) / F.lit(max_tokens)).cast("bigint")
    return (
        ranged.join(F.broadcast(poff), "__pid")
        .select(
            "doc_id",
            "n_tokens",
            seq_id.alias("seq_id"),
            (cum % F.lit(max_tokens)).alias("seq_offset"),
            ((cum % F.lit(max_tokens)) + F.col("n_tokens") > F.lit(max_tokens)).alias(
                "straddles"
            ),
        )
    )


def pack_manifest(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_partitions: int | None = None,
) -> DataFrame:
    """The per-sequence manifest a trainer's data loader consumes:
    (seq_id, doc_ids, n_docs, seq_tokens, has_straddle), where
    ``doc_ids`` lists the documents STARTING in the sequence in stream
    order and ``seq_tokens`` sums their token counts (a straddling
    doc's tokens count in its start sequence).

    Zero-token documents are excluded: they occupy no stream position,
    and — the scale reason — an adversarial run of millions of empty
    docs would otherwise land in ONE sequence's ``collect_list``. With
    them gone every doc consumes ≥1 token of its start sequence, so a
    group is hard-bounded at ``max_tokens`` entries — a bounded
    collect_list, same argument as the per-key juice contract."""
    per_doc = pack_sequences(docs, id_col, text_col, max_tokens, n_partitions)
    nonempty = per_doc.filter(F.col("n_tokens") > 0)
    return (
        nonempty.groupBy("seq_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq_offset", "doc_id"))),
                lambda s: s["doc_id"],
            ).alias("doc_ids"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.max(F.col("straddles")).alias("has_straddle"),
        )
    )


def pack_bins_bfd(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    n_groups: int = 32,
    count_col: str | None = None,
    oversize: str = "error",
) -> DataFrame:
    """WHOLE-document bin packing via Best-Fit Decreasing — the
    padding-minimizing counterpart to :func:`pack_sequences`: where
    concat-and-chunk cuts documents at sequence boundaries (straddles),
    SFT/instruction-tuning pipelines must keep each document intact and
    instead pack documents into fixed-capacity bins, padding the
    remainder. The packing quality IS the training cost: every wasted
    token is a padded position the forward pass still pays for.

    Output: ``(doc_id, n_tokens bigint, bin_group int, bin_id bigint,
    oversized boolean)`` — bins never exceed ``capacity``; zero-token
    docs are excluded (they occupy no positions). ``oversize`` policy
    for docs longer than ``capacity``: ``'error'`` (default — packing a
    doc that cannot fit is a pipeline bug) or ``'own_bin'`` (isolate
    each in its own flagged bin, the truncate-downstream convention).

    Algorithm: documents hash-split into ``n_groups`` deterministic
    groups (``xxhash64(id) % G`` — a pure function of the corpus, so
    the packing is layout-independent); each group runs Best-Fit
    Decreasing independently in one Arrow batch (sort by (n_tokens
    desc, id), place each doc into the fullest bin it fits — smallest
    remaining capacity, lowest bin id on ties — else open a new bin;
    a bisect-maintained (remaining, bin) list makes placement
    O(log bins) amortized). BFD carries the classic 11/9·OPT + 6/9
    guarantee PER GROUP, and the group split costs at most a
    partially-filled tail bin per group — negligible for G ≪ total
    bins (asserted as the (11/9)·⌈group_tokens/capacity⌉ + 1 bound in
    pytest).

    Scale shape: one shuffle of (id, n_tokens) rows — 16 bytes/doc,
    never text — keyed by the group hash; per-task state is one
    group's (remaining, bin) table, and the caller sizes ``n_groups``
    so a group's doc rows fit an Arrow batch (the same bounded-group
    contract as the per-key juice reduce). Global ``bin_id`` =
    ``bin_group · 2⁴⁰ + local_bin`` — collision-free while a group
    opens < 2⁴⁰ bins.
    """
    import pandas as pd

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    if oversize not in ("error", "own_bin"):
        raise ValueError(f"oversize must be error|own_bin, got {oversize!r}")
    count_expr = (
        F.col(count_col)
        if count_col is not None
        else whitespace_token_count(F.col(text_col))
    )
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        count_expr.cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    if oversize == "error":
        # fail AT EXECUTION on any oversize doc, folded into the KEPT
        # column — a standalone assert_true column gets column-pruned
        # away (a separate count() would add a job; this rides the scan)
        small = t.select(
            "doc_id",
            F.when(F.col("n_tokens") <= F.lit(capacity), F.col("n_tokens"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"pack_bins_bfd: doc exceeds capacity {capacity}: id="
                        ),
                        F.col("doc_id").cast("string"),
                    )
                )
            )
            .alias("n_tokens"),
        )
    else:
        big = t.filter(F.col("n_tokens") > capacity)
        small = t.filter(F.col("n_tokens") <= capacity)

    grouped = small.withColumn(
        "bin_group", F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).cast("int")
    )

    schema = (
        "doc_id bigint, n_tokens bigint, bin_group int, bin_id bigint, "
        "oversized boolean"
    )

    def bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        group = int(pdf["bin_group"].iloc[0])
        base = group << 40
        # sorted list of (remaining, bin_local): bisect for the smallest
        # remaining >= tok; ties resolve to the lowest bin id because the
        # list is sorted on the pair
        open_bins: list[tuple[int, int]] = []
        n_bins = 0
        assigned = []
        for tok in pdf["n_tokens"].to_numpy():
            tok = int(tok)
            i = bisect.bisect_left(open_bins, (tok, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                bisect.insort(open_bins, (rem - tok, b))
                assigned.append(base + b)
            else:
                assigned.append(base + n_bins)
                bisect.insort(open_bins, (capacity - tok, n_bins))
                n_bins += 1
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "bin_group": group,
                "bin_id": assigned,
                "oversized": False,
            }
        )

    packed = grouped.groupBy("bin_group").applyInPandas(bfd, schema)
    if oversize == "own_bin":
        solo = big.select(
            "doc_id",
            "n_tokens",
            F.lit(-1).cast("int").alias("bin_group"),
            (F.lit(1 << 62) + F.col("doc_id")).alias("bin_id"),
            F.lit(True).alias("oversized"),
        )
        packed = packed.unionByName(solo)
    return packed


def bin_manifest(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-bin manifest from :func:`pack_bins_bfd` output:
    ``(bin_id, doc_ids, n_docs, bin_tokens, padding)`` — the loader-side
    view, plus the padding each bin pays. One groupBy keyed by bin_id;
    the collect_list is bounded at ``capacity`` entries because every
    packed doc holds ≥ 1 token. Padding is clamped at 0: an
    ``oversize='own_bin'`` solo bin holds > capacity tokens and pays no
    padding (it overflows — the loader truncates or re-chunks it), so a
    negative value would understate every aggregate built on top."""
    return packed.groupBy("bin_id").agg(
        F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.greatest(
            F.lit(capacity) - F.sum("n_tokens"), F.lit(0)
        ).alias("padding"),
    )


def packing_waste(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row summary ``(n_bins, total_tokens, padded_positions,
    waste_pct, oversize_bins, oversize_tokens)`` — the number a
    pipeline tracks per packing run. ``oversize='own_bin'`` solo bins
    hold > capacity tokens, so they are EXCLUDED from the waste
    aggregate (their ``capacity − tokens`` is negative and would
    understate — even negate — ``padded_positions``/``waste_pct`` on an
    oversize-heavy corpus) and reported separately. One groupBy keyed
    by ``bin_id`` then a scalar aggregate — the same single shuffle the
    old ``countDistinct(bin_id)`` form paid."""
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("__bt"),
        F.max("oversized").alias("__ov"),
    )
    packed_bins = F.sum(F.when(~F.col("__ov"), 1).otherwise(0))
    pad = F.sum(
        F.when(~F.col("__ov"), F.lit(capacity) - F.col("__bt")).otherwise(
            F.lit(0)
        )
    )
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("__bt").alias("total_tokens"),
        pad.alias("padded_positions"),
        F.round(
            pad * 100.0 / F.greatest(packed_bins * F.lit(capacity), F.lit(1)),
            3,
        ).alias("waste_pct"),
        F.sum(F.when(F.col("__ov"), 1).otherwise(0)).alias("oversize_bins"),
        F.sum(F.when(F.col("__ov"), F.col("__bt")).otherwise(F.lit(0))).alias(
            "oversize_tokens"
        ),
    )
