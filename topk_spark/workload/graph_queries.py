"""Iterative graph analytics with a HASH-CHECKED oracle: PageRank over the
co-purchase graph in exact fixed-point arithmetic.

Iterative algorithms are normally the first thing to lose oracle
checkability (float accumulation is partition-order-dependent, and SQL
engines restrict aggregates in recursive CTEs). Both problems die at once
by (a) storing ranks as BIGINT millionths — every operation is integer
multiply / floor-divide / sum, bit-identical at any parallelism — and
(b) unrolling the fixed iteration count into chained CTEs for DuckDB.

The repo's other iterative op (connected components, ops/fuzzy_dedup.py)
uses the same loop discipline this module does: constant-size plans per
round via eager materialization, never an unbounded lineage chain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_ITERS = 5
_SCALE = 1_000_000  # ranks in millionths
_TOPN = 20


def _oracle() -> str:
    prev = "r0"
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f"""
r{i} AS (
  SELECT n.node,
         base.b + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM nodes n
  CROSS JOIN base
  LEFT JOIN (
    SELECT e.dst, SUM(p.r // d.deg) AS c
    FROM {prev} p
    JOIN edges e ON e.src = p.node
    JOIN deg d ON d.node = p.node
    GROUP BY e.dst
  ) s ON s.dst = n.node
)""")
        prev = f"r{i}"
    return f"""
WITH pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
base AS (SELECT (15 * {_SCALE} // 100) // count(*) AS b FROM nodes),
r0 AS (
  SELECT node, {_SCALE} // (SELECT count(*) FROM nodes) AS r FROM nodes
),{",".join(steps)}
SELECT node AS l_partkey, CAST(r AS BIGINT) AS rank_millionths
FROM {prev}
ORDER BY r DESC, node ASC
LIMIT {_TOPN}
"""


@register("pagerank_copurchase", tags=("graph", "iterative"), oracle=_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, damping 0.85) over the undirected
    co-purchase graph, in BIGINT-millionths fixed point: contribution =
    rank DIV degree, update = base + (85·Σcontrib) DIV 100 — floor-divides
    land at identical points in both engines, so an ITERATIVE algorithm
    gets a full value-hash oracle (unrolled CTEs on the DuckDB side).
    Spark shape per round: edges ⋈ ranks on src (hash, edges re-used),
    partial+final SUM by dst, right-join back to nodes — each round is
    localCheckpoint-free here because the lineage is 5 rounds flat;
    the production loop for unbounded iteration counts is
    connected_components' eager-materialize pattern. Top-20 by final rank
    via TakeOrderedAndProject."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("src", "dst")
    )
    # Eagerly materialize the edge list ONCE: everything downstream (deg,
    # nodes, the per-iteration joins, the scalar count) re-reads the tiny
    # materialized edges instead of replaying the expensive pair-generation
    # join per consumer.
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar loop constant (node-set size), not data
    base = (15 * _SCALE // 100) // n_nodes
    ranks = nodes.withColumn("r", F.lit(_SCALE // n_nodes))
    edges_deg = edges.join(
        deg.withColumnRenamed("src", "node"),
        edges["src"] == F.col("node"),
    ).select("src", "dst", "deg").localCheckpoint()
    for _ in range(_ITERS):
        contrib = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .select(
                "dst", F.expr("r div deg").alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(c, 0L) div 100")
                ).alias("r"),
            )
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(_TOPN)
        .select(F.col("node").alias("l_partkey"), F.col("r").alias("rank_millionths"))
    )
