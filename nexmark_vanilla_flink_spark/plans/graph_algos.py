"""Unrolled iterative graph algorithms as declarative plans.

The connected-components operator (operators/graph.py) iterates until
convergence with a driver-side loop; the entries here take the OTHER
canonical shape for distributed graph analytics: a FIXED number of
iterations unrolled into one declarative plan — no driver action at all,
every iteration is a join + partial-aggregated exchange that Catalyst
sees whole (and can ReusedExchange across).

Determinism discipline: ranks are FIXED-POINT BIGINTs (mass scaled by
1e12) and every operation is integer arithmetic (`DIV`), so the result
is bit-identical across engines and across summation orders — a float
PageRank would hash-differently per partitioning because IEEE addition
is not associative. Fixed-point is how you make a distributed PageRank
reproducible, not a test convenience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_PR_SCALE = 1_000_000_000_000  # fixed-point: total rank mass = 1e12
_PR_ITERS = 3
_PR_TOPK = 50

_PR_ORACLE_HEAD = f"""
WITH pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(count(*) AS BIGINT) AS w
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS (
  SELECT u, v, w FROM pairs UNION ALL SELECT v AS u, u AS v, w FROM pairs
),
deg AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges GROUP BY 1),
nb AS (
  SELECT {_PR_SCALE} // CAST(count(*) AS BIGINT) AS base,
         (15 * ({_PR_SCALE} // CAST(count(*) AS BIGINT))) // 100 AS tele
  FROM deg
),
r0 AS (SELECT d.u, nb.base AS r FROM deg d CROSS JOIN nb)
"""

_PR_ORACLE_ITER = """,
r{i} AS (
  SELECT e.v AS u,
         nb.tele + (85 * CAST(SUM((r.r // d.wdeg) * e.w) AS BIGINT)) // 100 AS r
  FROM edges e
  JOIN r{p} r ON r.u = e.u
  JOIN deg d ON d.u = e.u
  CROSS JOIN nb
  GROUP BY e.v, nb.tele
)"""

_PR_ORACLE_TAIL = f"""
SELECT r.u AS part_id, d.wdeg, r.r AS rank_fp
FROM r{_PR_ITERS} r JOIN deg d ON d.u = r.u
ORDER BY r.r DESC, r.u
LIMIT {_PR_TOPK}
"""

_PR_ORACLE = (
    _PR_ORACLE_HEAD
    + "".join(
        _PR_ORACLE_ITER.format(i=i, p=i - 1) for i in range(1, _PR_ITERS + 1)
    )
    + _PR_ORACLE_TAIL
)


@register(
    "copurchase_pagerank",
    oracle=_PR_ORACLE,
    tags=("graph", "iterative", "tpch"),
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the product co-purchase graph — "important
    products" the way a recommender bootstraps: parts are nodes, an edge
    joins two parts that appear in the same order (weight = co-occurrence
    count), and 3 damped power iterations (d = 0.85) redistribute rank
    mass along the edges. Top-50 parts by final rank.

    Scale: the edge build is a self-join on l_orderkey — BOUNDED per
    order (TPC-H ≤ 7 lines/order, so ≤ 21 pairs/order: linear in the
    fact table, never corpus²). The iteration count is FIXED and
    unrolled declaratively: no driver-side loop or collect; each of the
    3 iterations is edges ⋈ ranks ⋈ degrees on `u` (the same join key,
    so the exchanges co-locate and AQE reuses the cached edge/degree
    shuffles) followed by a partial-aggregated sum on `v`. Per-node
    scalar `base`/`tele` come from ONE count aggregate broadcast back
    (crossJoin(broadcast), the q11/q15 de-funnel pattern). The top-50 is
    orderBy+limit = TakeOrderedAndProject — a distributed partial top-k,
    not a single-partition sort. All arithmetic is fixed-point BIGINT
    (contribution = (r DIV wdeg) * w, bounded by total mass 1e12, so
    85·sum stays far under 2^53) — reproducible across engines and
    partitionings."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = pairs.unionAll(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).cache()
    deg = edges.groupBy("u").agg(F.sum("w").alias("wdeg")).cache()
    nb = deg.agg(F.count(F.lit(1)).alias("n")).select(
        F.expr(f"{_PR_SCALE} DIV n").alias("base"),
        F.expr(f"(15 * ({_PR_SCALE} DIV n)) DIV 100").alias("tele"),
    )
    ranks = deg.crossJoin(F.broadcast(nb)).select("u", F.col("base").alias("r"))
    for _ in range(_PR_ITERS):
        ranks = (
            edges.join(ranks, "u")
            .join(deg, "u")
            .select(
                F.col("v"),
                (F.expr("r DIV wdeg") * F.col("w")).alias("contrib"),
            )
            .groupBy("v")
            .agg(F.sum("contrib").alias("s"))
            .crossJoin(F.broadcast(nb))
            .select(
                F.col("v").alias("u"),
                (F.col("tele") + F.expr("(85 * s) DIV 100")).alias("r"),
            )
        )
    return (
        ranks.join(deg, "u")
        .select(F.col("u").alias("part_id"), "wdeg", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "part_id")
        .limit(_PR_TOPK)
    )
