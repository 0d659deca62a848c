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
