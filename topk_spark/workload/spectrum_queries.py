"""PCA preparation over the embedding corpus — the distributed half of a
principal-component analysis: the (un-normalized) covariance matrix
accumulated EXACTLY, so the only approximate step left (the driver-side
eigendecomposition of a tiny d×d matrix) starts from bit-agreed inputs.

Exactness contract: vectors quantize to BIGINT (floor(x·2^20), every step
correctly-rounded IEEE so engine-identical); second moments M_ij = Σ x_i·x_j
and first moments S_i = Σ x_i are exact integer sums; the centered quantity
N·M_ij − S_i·S_j is combined in DECIMAL(38,0)/HUGEINT — no float touches
the pipeline, so a statistic that is normally float-fuzzy value-hashes.

Scale shape: the d(d+1)/2 products per vector are built in ONE projection
(nested transform over the array, codegen) and partial-aggregated map-side;
the shuffle carries at most d(d+1)/2 rows per partition (2080 for d=64),
independent of corpus size. This is the textbook "sufficient statistics"
reduction — the same shape Spark MLlib's computeCovariance uses, here
exact-integer and oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_QSCALE = 1 << 20
_TOP_CELLS = 20

_COV_ORACLE = f"""
WITH qv AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}) AS BIGINT)) AS xi
  FROM embeddings
),
idx AS (SELECT CAST(i AS INT) AS i FROM unnest(range(1, 65)) AS t(i)),
cells AS (
  SELECT a.i AS i, b.i AS j,
         SUM(CAST(qv.xi[a.i] AS HUGEINT) * qv.xi[b.i]) AS m,
         SUM(CAST(qv.xi[a.i] AS HUGEINT)) AS si,
         SUM(CAST(qv.xi[b.i] AS HUGEINT)) AS sj,
         count(*) AS n
  FROM qv, idx a, idx b WHERE a.i <= b.i
  GROUP BY a.i, b.i
),
cov AS (
  SELECT i, j, n * m - si * sj AS cov_n2 FROM cells
),
rk AS (
  SELECT i, j, cov_n2,
         row_number() OVER (ORDER BY abs(cov_n2) DESC, i ASC, j ASC) AS rnk
  FROM cov WHERE i < j
)
SELECT i, j, CAST(cov_n2 AS VARCHAR) AS cov_n2_str, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= {_TOP_CELLS}
ORDER BY rnk
"""


@register("embedding_covariance_head", tags=("PCA-prep",), oracle=_COV_ORACLE)
def embedding_covariance_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 strongest off-diagonal covariance cells of the embedding
    corpus, exact: N·M_ij − S_i·S_j over floor(x·2^20) BIGINT components,
    combined in DECIMAL(38,0). One corpus scan builds all d(d+1)/2
    products in-projection; partial aggregation collapses them map-side,
    so the shuffle is O(d²) rows per partition regardless of N. The cell
    values are emitted as strings so the 128-bit integers compare
    engine-portably."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.expr(
            f"transform(embedding, x -> cast(floor(cast(x as double)"
            f" * {_QSCALE}) as bigint))"
        ).alias("xi")
    )
    # all (i, j<=i... actually i<=j) product cells in one projection:
    # flatten(transform(xi, (x,i) -> transform(slice from i), ...))
    cells = qv.select(
        F.explode(
            F.expr(
                "flatten(transform(xi, (x, i) ->"
                " transform(slice(xi, i + 2, size(xi) - i - 1), (y, k) ->"
                " struct(i + 1 as i, i + 2 + k as j,"
                " x * y as p, x as xa, y as xb))))"
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.p", "c.xa", "c.xb")
    agg = cells.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(28,0)")).alias("m"),
        F.sum(F.col("xa").cast("decimal(28,0)")).alias("si"),
        F.sum(F.col("xb").cast("decimal(28,0)")).alias("sj"),
        F.count("*").alias("n"),
    )
    cov = agg.select(
        "i",
        "j",
        (
            F.col("n").cast("decimal(12,0)") * F.col("m").cast("decimal(25,0)")
            - F.col("si").cast("decimal(18,0)") * F.col("sj").cast("decimal(18,0)")
        ).alias("cov_n2"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.abs(F.col("cov_n2")).desc(), F.asc("i"), F.asc("j"))
    head = (
        cov.orderBy(F.abs(F.col("cov_n2")).desc(), F.asc("i"), F.asc("j"))
        .limit(_TOP_CELLS)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
    )
    return head.select(
        "i", "j", F.col("cov_n2").cast("string").alias("cov_n2_str"), "rnk"
    ).orderBy("rnk")
