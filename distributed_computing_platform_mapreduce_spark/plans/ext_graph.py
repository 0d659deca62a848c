"""Graph extension queries: triangle counting and PageRank (split
out of plans/extensions.py in r12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_computing_platform_mapreduce_spark.plans.registry import query
from distributed_computing_platform_mapreduce_spark.sources.catalog import load_table

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
