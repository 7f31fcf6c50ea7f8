"""Third graph-analytics batch: link prediction over the co-purchase graph.

``link_prediction_jaccard`` scores NON-edges by neighborhood overlap — the
classic common-neighbors / Jaccard link predictor (Liben-Nowell & Kleinberg
2003): candidates are two-hop pairs (a −n− b with a<b), score =
|N(a)∩N(b)| / |N(a)∪N(b)| in exact ppm, existing edges excluded. This is
the "recommend related products" query a co-purchase store serves.

Graph semantics shared with pagerank/triangles (graph2_queries._EDGES_SQL:
parts co-purchased in ≥2 orders, undirected). Scores are integer ppm, so
the ranking hash-matches DuckDB at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.ops.topk import topn
from topk_spark.workload import register
from topk_spark.workload.graph2_queries import _EDGES_SQL, _pairs

_TOP = 20

_LINKPRED_ORACLE = f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
two_hop AS (
  SELECT e1.dst AS a, e2.dst AS b, count(*) AS common
  FROM sym e1 JOIN sym e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2
),
cand AS (
  SELECT t.a, t.b, t.common
  FROM two_hop t
  ANTI JOIN pairs p ON p.src = t.a AND p.dst = t.b
  WHERE t.common >= 2
)
SELECT a AS node_a, b AS node_b, CAST(common AS BIGINT) AS common_neighbors,
       CAST(common * 1000000 // (da.deg + db.deg - common) AS BIGINT)
         AS jaccard_ppm
FROM cand
JOIN deg da ON da.node = cand.a
JOIN deg db ON db.node = cand.b
ORDER BY jaccard_ppm DESC, common DESC, node_a, node_b
LIMIT {_TOP}
"""


@register("link_prediction_jaccard", tags=("graph", "linkpred"), oracle=_LINKPRED_ORACLE)
def link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links by neighborhood-Jaccard (ppm), common ≥ 2,
    existing edges anti-joined out.

    100 TB posture: candidates come from the two-hop equi-join on the
    shared middle vertex (one hash shuffle on node id; fan-out bounded by
    degree², the inherent cost of common-neighbor scoring — hub nodes are
    capped upstream by the ≥2-co-orders edge definition), the edge
    anti-join and the two degree joins are plain equi-joins on node id,
    and the final top-20 is a bounded heap. No cartesian anywhere."""
    edges = _pairs(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "node"
    )
    e1 = sym.select(F.col("src").alias("n"), F.col("dst").alias("a"))
    e2 = sym.select(F.col("src").alias("n"), F.col("dst").alias("b"))
    two_hop = (
        e1.join(e2, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= 2)
    )
    cand = two_hop.join(
        edges,
        (two_hop["a"] == edges["src"]) & (two_hop["b"] == edges["dst"]),
        "left_anti",
    )
    scored = (
        cand.join(deg.withColumnRenamed("deg", "da"), F.col("a") == F.col("node"))
        .drop("node")
        .join(deg.withColumnRenamed("deg", "db"), F.col("b") == F.col("node"))
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            F.col("common").cast("long").alias("common_neighbors"),
            # integral div mirrors the oracle's exact '//' (drift ppm notes)
            F.expr(
                "CAST(common * 1000000 div (da + db - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return topn(
        scored,
        [
            F.desc("jaccard_ppm"),
            F.desc("common_neighbors"),
            F.asc("node_a"),
            F.asc("node_b"),
        ],
        _TOP,
    )


_KHOP = 3
_KHOP_TOP = 25

_KHOP_ORACLE = f"""
WITH {_EDGES_SQL},
sym AS (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM pairs
),
h1 AS (
  SELECT DISTINCT src AS node, dst AS r FROM sym
),
h2 AS (
  SELECT DISTINCT h1.node, s.dst AS r
  FROM h1 JOIN sym s ON s.src = h1.r
),
h3 AS (
  SELECT DISTINCT h2.node, s.dst AS r
  FROM h2 JOIN sym s ON s.src = h2.r
),
reach AS (
  SELECT node, r FROM h1
  UNION SELECT node, r FROM h2
  UNION SELECT node, r FROM h3
)
SELECT node, count(*)::BIGINT AS n_reach
FROM reach WHERE r <> node
GROUP BY node
ORDER BY n_reach DESC, node
LIMIT {_KHOP_TOP}
"""


@register("khop_reach_count", tags=("graph", "reach"), oracle=_KHOP_ORACLE)
def khop_reach_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop reachability: for each node, how many OTHER nodes sit within
    ≤3 edges (the neighborhood-size centrality behind 'influence radius'
    features), top-25. Iterative frontier expansion — each round joins the
    current reach set to the edge list and re-distincts — exactly the
    bounded-depth form of the connected-components loop.

    100 TB posture: k rounds of equi-join on node id; the reach set is
    capped by k-hop neighborhood sizes, and dedup between rounds keeps the
    frontier from exponentiating. No full transitive closure is ever
    materialized."""
    edges = _pairs(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).select(F.col("src").alias("a"), F.col("dst").alias("b"))
    reach = sym.select(F.col("a").alias("node"), F.col("b").alias("r")).distinct()
    frontier = reach
    for _ in range(_KHOP - 1):
        frontier = (
            frontier.join(
                sym.select(F.col("a").alias("r"), F.col("b").alias("r2")), "r"
            )
            .select("node", F.col("r2").alias("r"))
            .distinct()
        )
        reach = reach.unionByName(frontier).distinct()
    from topk_spark.ops.topk import topn

    counts = (
        reach.filter(F.col("r") != F.col("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_reach"))
    )
    return topn(counts, [F.desc("n_reach"), F.asc("node")], _KHOP_TOP)
