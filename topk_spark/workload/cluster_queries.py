"""Grid-density clustering over the embedding space — round-2d: the
DBSCAN shape (dense regions merged through adjacency) expressed the way it
actually distributes. Point-level DBSCAN needs an ε-radius search per
point; the scalable form quantizes to grid cells, keeps cells with ≥
minPts points (density), and merges 4-adjacent dense cells with connected
components — each step a bounded aggregate or a cell-table join, never a
point-pair join.

``grid_density_clusters``: cells of 0.1×0.1 over embedding dims 1-2,
minPts = 5, clusters = components of the dense-cell adjacency graph
(labels = min cell key, the engine's CC convention). Emits one row per
dense cell with its cluster label and the cluster's total point count.
Oracle: the same grid arithmetic plus a recursive-CTE closure over the
adjacency — the iterative operator hash-checked end-to-end, as with
neardup_cluster_dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_MINPTS = 5
_SCALE = 10  # cells of 1/_SCALE per side
_OFF = 1000  # grid offset so cell keys are positive: key = (gx+OFF)*10^6 + gy+OFF

_GRID_ORACLE = f"""
WITH RECURSIVE pts AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS gx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * {_SCALE}) AS BIGINT) AS gy
  FROM embeddings
),
cells AS (
  SELECT gx, gy, (gx + {_OFF}) * 1000000 + gy + {_OFF} AS cid,
         count(*)::BIGINT AS n_points
  FROM pts GROUP BY gx, gy
  HAVING count(*) >= {_MINPTS}
),
edges AS (
  SELECT a.cid AS ca, b.cid AS cb
  FROM cells a JOIN cells b
    ON (b.gx = a.gx + 1 AND b.gy = a.gy)
    OR (b.gx = a.gx AND b.gy = a.gy + 1)
),
sym AS (
  SELECT ca, cb FROM edges UNION SELECT cb, ca FROM edges
),
reach(id, r) AS (
  SELECT DISTINCT ca AS id, ca AS r FROM sym
  UNION
  SELECT s.cb, reach.r FROM reach JOIN sym s ON s.ca = reach.id
),
comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
),
labeled AS (
  SELECT c.cid, c.gx, c.gy, c.n_points,
         COALESCE(comp.component, c.cid) AS cluster
  FROM cells c LEFT JOIN comp ON comp.id = c.cid
),
sizes AS (
  SELECT cluster, SUM(n_points) AS cluster_points FROM labeled GROUP BY cluster
)
SELECT l.gx, l.gy, l.n_points, CAST(l.cluster AS BIGINT) AS cluster,
       CAST(s.cluster_points AS BIGINT) AS cluster_points
FROM labeled l JOIN sizes s USING (cluster)
ORDER BY l.gx, l.gy
"""


@register("grid_density_clusters", tags=("cluster", "dbscan"), oracle=_GRID_ORACLE)
def grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-cell clustering (module docstring): grid → density filter →
    4-adjacency connected components → per-cluster point totals.

    100 TB posture: points reduce to cells in one partial+final count (the
    only pass over the data); adjacency, components, and sizes all run on
    the dense-cell table, whose cardinality is bounded by the grid, not
    the corpus. Dense cells with no dense neighbor stay singleton clusters
    (left join + coalesce to own id)."""
    from topk_spark.ops.fuzzy_dedup import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    gx = F.floor(F.expr("CAST(embedding[0] AS DOUBLE)") * _SCALE).cast("long")
    gy = F.floor(F.expr("CAST(embedding[1] AS DOUBLE)") * _SCALE).cast("long")
    cells = (
        emb.select(gx.alias("gx"), gy.alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= _MINPTS)
        .withColumn(
            "cid", (F.col("gx") + _OFF) * F.lit(1000000) + F.col("gy") + _OFF
        )
    )
    a = cells.select(
        F.col("cid").alias("id_a"), F.col("gx").alias("ax"), F.col("gy").alias("ay")
    )
    b = cells.select(
        F.col("cid").alias("id_b"), F.col("gx").alias("bx"), F.col("gy").alias("by")
    )
    edges = a.join(
        b,
        ((F.col("bx") == F.col("ax") + 1) & (F.col("by") == F.col("ay")))
        | ((F.col("bx") == F.col("ax")) & (F.col("by") == F.col("ay") + 1)),
    ).select("id_a", "id_b")
    comp = connected_components(edges)
    labeled = cells.join(
        comp.select(F.col("id").alias("cid"), "component"), "cid", "left"
    ).withColumn("cluster", F.coalesce("component", "cid"))
    sizes = labeled.groupBy("cluster").agg(
        F.sum("n_points").alias("cluster_points")
    )
    return (
        labeled.join(sizes, "cluster")
        .select(
            "gx",
            "gy",
            "n_points",
            F.col("cluster").cast("long").alias("cluster"),
            F.col("cluster_points").cast("long").alias("cluster_points"),
        )
        .orderBy("gx", "gy")
    )
