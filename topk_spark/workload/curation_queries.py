"""Corpus-curation diagnostics (round 2): the reporting queries a dedup
pipeline runs AFTER hashing — how big are duplicate clusters, and which
sources copy from each other. Both run on a LEADING-CONTENT
fingerprint (md5 of the first 64 chars) — the coarse crawl-dedup signal
used when full-text digests are too strict (boilerplate-leading mirrors,
truncated re-crawls); the same queries run unchanged on any digest column
(swap in the `docs_exact_dedup` full-text digest or a MinHash band key).
Group sizes = rows a dedup pass would collapse; overlap = source-level
provenance of the duplication.

Scale shape: everything reduces to the per-digest aggregate first (one
digest shuffle — 32-char keys, never text); cluster histograms and the
source-overlap matrix are aggregations over that already-tiny table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_HIST_ORACLE = """
WITH g AS (
  SELECT md5(substr(text, 1, 64)) AS h, count(*) AS sz
  FROM documents GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * sz AS BIGINT) AS n_docs,
       CAST(count(*) * (sz - 1) AS BIGINT) AS removable_docs
FROM g GROUP BY sz
ORDER BY cluster_size
"""


@register("dup_cluster_histogram", tags=("DD-report",), oracle=_HIST_ORACLE)
def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram: for each cluster size, how
    many clusters, how many docs they hold, and how many rows dedup would
    remove (size−1 per cluster) — the before/after accounting line every
    dedup run reports. Two cheap aggs after the digest reduction; the
    histogram domain is bounded by the largest cluster, so output is tiny
    at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5(F.substring("text", 1, 64)).alias("h")).agg(
        F.count("*").alias("sz")
    )
    return (
        g.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("n_clusters") * F.col("cluster_size")).alias("n_docs"),
            (F.col("n_clusters") * (F.col("cluster_size") - 1)).alias(
                "removable_docs"
            ),
        )
        .orderBy("cluster_size")
    )


_OVERLAP_ORACLE = """
WITH ds AS (
  SELECT DISTINCT md5(substr(text, 1, 64)) AS h, source
  FROM documents
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS shared_digests
FROM pairs GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register("cross_source_overlap", tags=("DD-report",), oracle=_OVERLAP_ORACLE)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-by-source duplication matrix: for each pair of sources, how
    many content digests they share — the provenance question (is source B
    a mirror of source A?) asked before deciding which copy survives
    dedup. The pair expansion happens per digest over the DISTINCT
    (digest, source) reduction, so fan-out is bounded by sources-per-digest
    (≤ |sources|), never corpus size; the self-join key is the digest,
    co-partitioned on both sides."""
    d = load_table(spark, sf_dir, "documents")
    ds = d.select(
        F.md5(F.substring("text", 1, 64)).alias("h"), "source"
    ).distinct()
    a = ds.select("h", F.col("source").alias("source_a"))
    b = ds.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_digests"))
        .orderBy("source_a", "source_b")
    )
