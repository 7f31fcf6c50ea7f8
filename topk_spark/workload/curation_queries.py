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
from pyspark.sql import DataFrame, SparkSession, Window

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


_ALLOC_BUDGET = 10000

_ALLOC_ORACLE = f"""
WITH n AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total, count(*) AS n_sources FROM n),
q AS (
  SELECT n.source, n.n_docs,
         CAST(n.n_docs * {_ALLOC_BUDGET} // tot.n_total AS BIGINT) AS base_alloc,
         CAST(n.n_docs * {_ALLOC_BUDGET} % tot.n_total AS BIGINT) AS rem,
         tot.n_total
  FROM n, tot
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rem_rank,
         {_ALLOC_BUDGET} - SUM(base_alloc) OVER () AS leftover
  FROM q
)
SELECT source, n_docs, base_alloc,
       CAST(CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS extra,
       CAST(base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS final_alloc
FROM r
ORDER BY source
"""


@register(
    "largest_remainder_allocation", tags=("MIX-alloc",), oracle=_ALLOC_ORACLE
)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Hamilton (largest-remainder) apportionment of a 10k-sample
    batch budget across sources proportional to document counts — the
    integer-exact way to turn mixture WEIGHTS into per-source COUNTS that
    sum to the budget exactly (naive floor leaves a deficit; float
    rounding breaks the sum). Pure integer arithmetic: quotas as
    (n_s·B div N, n_s·B mod N), leftovers to the largest remainders with
    a stable tiebreak. The window runs over the per-source table
    (|sources| rows) — trivially bounded at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = n.agg(F.sum("n_docs").alias("n_total"))
    q = n.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        # integral div mirrors the oracle's exact '//' (decimal-widened:
        # n_docs·budget outgrows 2^53 at full-corpus doc counts)
        F.expr(
            f"CAST(CAST(n_docs AS DECIMAL(38,0)) * {_ALLOC_BUDGET}"
            " div n_total AS BIGINT)"
        ).alias("base_alloc"),
        F.expr(
            f"CAST(pmod(CAST(n_docs AS DECIMAL(38,0)) * {_ALLOC_BUDGET},"
            " n_total) AS BIGINT)"
        ).alias("rem"),
    )
    w_rank = Window.orderBy(F.desc("rem"), F.asc("source"))
    w_all = Window.partitionBy()
    r = q.select(
        "source",
        "n_docs",
        "base_alloc",
        F.row_number().over(w_rank).alias("rem_rank"),
        (F.lit(_ALLOC_BUDGET) - F.sum("base_alloc").over(w_all)).alias("leftover"),
    )
    return r.select(
        "source",
        "n_docs",
        "base_alloc",
        (F.col("rem_rank") <= F.col("leftover")).cast("long").alias("extra"),
        (
            F.col("base_alloc")
            + (F.col("rem_rank") <= F.col("leftover")).cast("long")
        ).alias("final_alloc"),
    ).orderBy("source")


_QNORM_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS n_s
  FROM documents
),
pooled AS (
  SELECT n_chars AS v,
         row_number() OVER (ORDER BY n_chars, doc_id) AS p
  FROM documents
),
n AS (SELECT count(*) AS n_total FROM documents),
t AS (
  SELECT ranked.*, CAST(ceil(CAST(r AS DOUBLE) * n.n_total / n_s) AS BIGINT)
           AS target_p
  FROM ranked, n
)
SELECT t.doc_id, t.source, t.n_chars,
       CAST(pooled.v AS BIGINT) AS norm_chars
FROM t JOIN pooled ON pooled.p = t.target_p
WHERE t.doc_id % 7 = 3
ORDER BY t.doc_id
"""


@register("quantile_normalize_scores", tags=("MIX-qnorm",), oracle=_QNORM_ORACLE)
def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of a per-doc score (n_chars):
    each document's score is replaced by the POOLED distribution's value at
    the same quantile — the calibration step before comparing quality
    scores produced by different sources/heuristics. Scale-safe pooled
    lookup: instead of a global row_number sort (one-partition funnel),
    the pooled CDF is built per VALUE (count + running end position over
    the bounded score domain) and broadcast; a position p maps to its
    value by range containment. The only per-row window partitions by
    source. Exact integers throughout except one correctly-rounded ceil
    division.

    NOTE on ties: pooled positions within equal values share that value,
    so value-level CDF containment is exactly the row-level answer."""
    d = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_src).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("n_s"),
    )
    cdf = (
        d.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "v",
            "cnt",
            F.sum("cnt").over(Window.orderBy("v")).alias("cum_end"),
        )
        .select(
            "v", (F.col("cum_end") - F.col("cnt") + 1).alias("cum_start"), "cum_end"
        )
    )
    n_total = d.agg(F.count("*").alias("n_total"))
    t = ranked.crossJoin(F.broadcast(n_total)).select(
        "doc_id",
        "source",
        "n_chars",
        F.ceil(F.col("r").cast("double") * F.col("n_total") / F.col("n_s"))
        .cast("long")
        .alias("target_p"),
    )
    return (
        t.join(
            F.broadcast(cdf),
            (F.col("target_p") >= F.col("cum_start"))
            & (F.col("target_p") <= F.col("cum_end")),
        )
        .filter(F.col("doc_id") % 7 == 3)
        .select("doc_id", "source", "n_chars", F.col("v").alias("norm_chars"))
        .orderBy("doc_id")
    )
