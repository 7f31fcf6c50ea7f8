"""OLAP + training-pipeline utility operators: deterministic train/test
split, skew-safe heavy hitters, exact percentiles, and pivot.

These are engine-generic capabilities a 100 TB training-data pipeline needs
on top of the reference's serving surface. Each is chosen to have an exact
cross-engine oracle (md5 and linear-interpolation percentiles are
bit-identical between Spark and DuckDB — verified, not assumed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register


def hash_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic, engine-portable bucket in [0, buckets): first 8 hex
    chars of md5 of the id's decimal string. Stable across runs, engines,
    partitionings — the property a train/test split must have so that
    re-running the pipeline (or running it on another engine) never migrates
    a document across the split."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


@register(
    "corpus_curation_pipeline",
    tags=("PIPE-e2e", "DD-exact", "TXT-quality", "PIPE-split"),
    oracle="""
WITH dedup AS (
  SELECT min_by(documents, doc_id) AS d FROM documents GROUP BY md5(text)
),
flat AS (
  SELECT d.doc_id AS doc_id, d.text AS text, d.lang AS lang FROM dedup
),
quality AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM flat
  WHERE len(string_split(text, ' ')) >= 20
),
split AS (
  SELECT lang, n_tokens,
         CASE WHEN CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS INT) < 80
              THEN 'train' ELSE 'test' END AS split
  FROM quality
)
SELECT split, lang,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens
FROM split
GROUP BY split, lang
ORDER BY split, lang
""",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation in ONE dataflow: exact dedup
    (content-hash, min-doc_id canonical) → quality gate (token floor) →
    deterministic hash-bucket train/test split → per-(split, lang) corpus
    stats. The whole pipeline is three narrow stages + two shuffles (dedup
    hash, final group-by); no stage carries document text past the point
    it's needed — at 100 TB the shuffle payload after dedup is (doc_id,
    lang, n_tokens), ~20 bytes/doc."""
    from topk_spark.ops.dedup import dedup_first_seen
    from topk_spark.workload.olap_queries import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    deduped = dedup_first_seen(
        d.withColumn("text_md5", F.md5("text")),
        ["text_md5"],
        [F.col("doc_id").asc()],
    )
    quality = deduped.select(
        "doc_id", "lang", F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    split = quality.withColumn(
        "split",
        F.when(hash_bucket(F.col("doc_id"), 100) < 80, "train").otherwise("test"),
    )
    return (
        split.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.sum("n_tokens").cast("double") / F.count("*"), 6).alias(
                "avg_tokens"
            ),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: bounded within-group self-join
# ---------------------------------------------------------------------------


@register(
    "topk_with_ties",
    tags=("K2", "topk"),
    oracle="""
WITH freq AS (
  SELECT l_returnflag, l_quantity, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT *, RANK() OVER (PARTITION BY l_returnflag
                         ORDER BY cnt DESC) AS rnk
  FROM freq
)
SELECT l_returnflag, l_quantity, cnt, rnk
FROM ranked WHERE rnk <= 3
""",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order quantities per return flag, top-3 WITH TIES
    (`rank() <= k`): tied frequencies share a rank and all survive, so no
    arbitrary tiebreak ever drops a row that is genuinely top-k — the
    deterministic way to top-k a coarse integer metric
    (ops/topk.py:rank_topk_with_ties). Pre-aggregation shrinks the fact
    to (flag, quantity) groups before the window, so the rank pass sees
    O(flags × quantities) rows."""
    from topk_spark.ops.topk import rank_topk_with_ties

    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    return rank_topk_with_ties(
        freq, ["l_returnflag"], [F.desc("cnt")], 3
    ).select("l_returnflag", "l_quantity", "cnt", "rnk")
