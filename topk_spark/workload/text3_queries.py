"""Tokenizer-training operators: adjacent-pair (first-BPE-iteration)
counts and collocation lift — the corpus statistics a BPE/WordPiece
trainer computes per merge round, expressed as one explode + one hash
aggregation so the 100 TB shape is a straight map-side tokenize feeding a
partial+final count (no per-doc state, no Python in the loop).

Determinism: counts are BIGINT; the lift score is scaled to parts-per-
million by integer floor-divide, so ranking needs no float anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"


def _tokens_arr():
    return F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
    ).alias("toks")


_BPE_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pairs AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
)
SELECT pair, count(*) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 30
"""


@register("bpe_pair_counts", tags=("TXT-bpe", "tokenizer"), oracle=_BPE_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration: frequency of every ADJACENT token pair
    across the corpus, top 30. Spark side builds the pair list inside one
    projection (transform over sequence — stays in whole-stage codegen),
    explodes, and counts: tokenize+pair is map-side, the only shuffle is
    the partial+final count on pair. A BPE trainer is this query in a
    loop with a merge applied between rounds."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs.select(_tokens_arr()).select(
        F.explode(
            # guard: sequence(0, -1) would DESCEND in Spark, so short docs
            # must short-circuit to an empty pair list
            F.expr(
                "case when size(toks) < 2 then array()"
                " else transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1])) end"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(30)
    )


_LIFT_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
uni AS (
  SELECT unnest(t) AS tok FROM toks
),
uni_counts AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
total AS (SELECT count(*) AS n FROM uni),
pairs AS (
  SELECT t[i] AS a, t[i + 1] AS b
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
),
pair_counts AS (SELECT a, b, count(*) AS pc FROM pairs GROUP BY a, b)
SELECT p.a, p.b, p.pc,
       (p.pc * total.n * 1000000) // (ca.c * cb.c) AS lift_ppm
FROM pair_counts p
JOIN uni_counts ca ON ca.tok = p.a
JOIN uni_counts cb ON cb.tok = p.b
CROSS JOIN total
WHERE p.pc >= 20
ORDER BY lift_ppm DESC, p.a ASC, p.b ASC
LIMIT 20
"""


@register("collocation_lift", tags=("TXT-colloc", "tokenizer"), oracle=_LIFT_ORACLE)
def collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation strength (PMI without the log — lift ranks
    identically): lift = P(a,b)/(P(a)P(b)) = pair_count·N/(c_a·c_b),
    scaled to ppm by integer floor-divide so the score is an exact BIGINT.
    Unigram counts are a small token-vocabulary table, broadcast onto the
    pair counts twice; N is a 1-row broadcast. Min support 20 keeps
    noise pairs out. At 100 TB only the two count aggs touch full data."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(_tokens_arr())
    uni = toks.select(F.explode("toks").alias("tok"))
    uni_counts = uni.groupBy("tok").agg(F.count("*").alias("c"))
    total = uni.agg(F.count("*").alias("n"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "case when size(toks) < 2 then array()"
                " else transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] as a, toks[i + 1] as b)) end"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pair_counts = (
        pairs.groupBy("a", "b").agg(F.count("*").alias("pc")).filter(F.col("pc") >= 20)
    )
    return (
        pair_counts.join(
            F.broadcast(uni_counts.withColumnRenamed("tok", "a").withColumnRenamed("c", "ca")),
            "a",
        )
        .join(
            F.broadcast(uni_counts.withColumnRenamed("tok", "b").withColumnRenamed("c", "cb")),
            "b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "pc",
            F.expr("(pc * n * 1000000) div (ca * cb)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


_CDC_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS t
  FROM documents
),
bounds AS (
  SELECT doc_id, t,
         list_filter(range(1, len(t) + 1), i -> md5(t[i]) < '2') AS bidx
  FROM toks WHERE len(t) > 0
),
spans AS (
  SELECT doc_id,
         list_concat([1], bidx) AS starts,
         list_concat(bidx, [len(t) + 1]) AS ends,
         t
  FROM bounds
),
chunks AS (
  SELECT doc_id,
         unnest(list_filter(
           list_transform(range(1, len(starts) + 1),
             k -> CASE WHEN ends[k] > starts[k]
                       THEN array_to_string(t[starts[k]:ends[k] - 1], ' ')
                  END),
           c -> c IS NOT NULL)) AS chunk
  FROM spans
)
SELECT md5(chunk) AS chunk_md5,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM chunks
GROUP BY md5(chunk)
HAVING count(*) >= 3
ORDER BY n_occurrences DESC, chunk_md5 ASC
LIMIT 20
"""


@register("cdc_chunk_dedup", tags=("DD-cdc", "chunking"), oracle=_CDC_ORACLE)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where a token's
    md5 hex sorts below '2' (a 1/8-rate boundary rule both engines
    evaluate identically as a STRING compare — no engine-specific hash),
    so identical passages chunk identically regardless of their offset in
    the doc — the property fixed-window chunking lacks and the reason
    storage dedup uses CDC. Chunk construction is pure array expressions
    in one projection (boundary indices → start/end span zip → joined
    token spans); the only shuffle is the chunk-signature count. Output:
    chunk signatures occurring ≥3 times."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = (
        docs.withColumn(
            "t", F.expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")
        )
        .withColumn(
            # 0-based boundary positions; guard: sequence(0,-1) descends
            "bidx",
            F.expr(
                "case when size(t) = 0 then array()"
                " else filter(sequence(0, size(t) - 1), i -> md5(t[i]) < '2') end"
            ),
        )
        .withColumn("starts", F.expr("concat(array(0), bidx)"))
        .withColumn("ends", F.expr("concat(bidx, array(size(t)))"))
    )
    chunks = staged.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter("
                " zip_with(starts, ends,"
                "   (s, e) -> if(e > s, array_join(slice(t, s + 1, e - s), ' '), null)),"
                " c -> c is not null)"
            )
        ).alias("chunk"),
    )
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_md5"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 3)
        .orderBy(F.desc("n_occurrences"), F.asc("chunk_md5"))
        .limit(20)
    )
