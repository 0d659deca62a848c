"""Iterative graph analytics over edge DataFrames: PageRank.

The reference's RWLG job builds the reverse web-link graph
(``applications/web-link-graph``); PageRank is the canonical analysis
run ON that graph, and the second iterative DataFrame algorithm in this
repo beside two-star connected components (``dedup.py``) — same
discipline: per-round ``localCheckpoint`` to cut lineage, one bounded
driver scalar per round, everything else stays distributed.

Semantics (classic damped PageRank with dangling-mass redistribution):

    pr(v) = (1-d)/N + d * [ Σ_{u→v} pr(u)/deg(u)  +  dangling_mass/N ]

where ``dangling_mass`` is the rank held by nodes with no out-edges —
redistributed uniformly, so total rank stays exactly 1 per round (the
property the convergence test pins). Fixed ``n_iter`` rounds keeps the
result a pure function of the input (deterministic for oracles/twins);
power iteration converges geometrically at rate d, so 10–20 rounds is
the production envelope.

Scale: each round is one join of ranks onto edges (shuffle on the edge
source key — the same key every round, so co-partitioning is reused)
plus a groupBy(dst) sum; the dangling scalar is a one-row aggregate
broadcast back. Rounds shuffle O(|E|) contributions — the identical
profile Spark's own example and GraphX use; no per-round collect except
the bounded dangling sum, which rides the same job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Damped PageRank over a directed edge list; returns (id, rank).

    Nodes = every id appearing as src or dst (deduplicated). Parallel
    edges count once (the edge set is made distinct — link multiplicity
    is not link weight in the classic formulation). Ranks sum to 1.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # out-degree rides with the edge list so each round's contribution
    # is a single expression on the joined row
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    # dangling-ness is loop-invariant: pin the no-out-edge node set once
    # so the per-round mass aggregate doesn't re-run the edge distinct +
    # degree shuffle every iteration (r6 review finding)
    dangling_ids = nodes.join(deg, nodes.id == deg.src, "left_anti").localCheckpoint(
        eager=False
    )

    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for i in range(n_iter):
        contrib = (
            ed.join(ranks, ed.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank parked on nodes with no out-edges; one
        # bounded one-row aggregate per round (the CC-checksum pattern)
        dangling = (
            ranks.join(dangling_ids, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # cut lineage before plans stack n_iter joins deep
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED reading of the edge
    list → ``(id, triangles long)`` (nodes in no triangle omitted —
    left-join a node table for zeros).

    The classical shuffle-efficient shape: canonicalize each edge to
    (lo, hi) and dedup (direction and multiplicity must not double-
    count), then join the oriented edge list with itself on the shared
    low endpoint to enumerate wedges (lo→a, lo→b with a < b), and
    close each wedge by joining the (a, b) pair back against the edge
    set. Orienting low→high bounds the wedge fan-out by each node's
    LOW-degree, the standard mitigation that keeps a power-law hub
    from exploding the wedge join (its wedges are generated from its
    lower-degree neighbors instead). Every stage is an equi-join —
    no cross product anywhere; self-loops are dropped."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)  # consumed three times below
    )
    w1 = e.select(F.col("lo").alias("p"), F.col("hi").alias("a"))
    w2 = e.select(F.col("lo").alias("p"), F.col("hi").alias("b"))
    wedges = w1.join(w2, "p").filter(F.col("a") < F.col("b"))
    closed = wedges.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b")), ["a", "b"]
    )
    per_corner = (
        closed.select(F.col("p").alias("id"))
        .unionAll(closed.select(F.col("a").alias("id")))
        .unionAll(closed.select(F.col("b").alias("id")))
    )
    return per_corner.groupBy("id").agg(F.count("*").alias("triangles"))
