"""Corpus-hygiene batch: the quality/safety gates a training-data pipeline
runs between raw crawl and tokenization — intra-document repetition scoring
(the Gopher-style duplicate-n-gram signal), per-source document caps,
PII-style redaction, and eval-set contamination detection via shared n-grams.

These extend the reference's capability surface (it has no text pipeline —
SURVEY.md §2 "north-star extensions"); each stays in codegen'd array/regex
expressions (no Python UDFs) so the hot path is JVM-side at 100 TB, and each
carries a DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register


@register(
    "source_cap_sample",
    tags=("PIPE-domaincap",),
    oracle="""
SELECT doc_id, source, rn
FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
           AS rn
  FROM documents
)
WHERE rn <= 50
""",
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the per-domain cap every crawl pipeline
    applies so no single site dominates the corpus): deterministic keep-first-N
    by doc_id within each source. rank-within-partition + filter — Spark runs
    this as a single hash-partition-by-source pass; no global sort."""
    d = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    return (
        d.select("doc_id", "source", rn.cast("long").alias("rn"))
        .filter(F.col("rn") <= 50)
    )


@register(
    "pii_redact",
    tags=("TXT-redact",),
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redactions
FROM events
WHERE event_id % 25 = 0
""",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction pass (the PII-scrub shape: replace matches with a
    placeholder token and count what was removed). Digit runs stand in for
    the email/phone/SSN patterns a production scrubber uses — the dataflow
    (regexp_replace + regexp_extract_all count, map-only, codegen'd) is
    identical, only the pattern list differs."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 25 == 0).select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_redactions"),
    )


@register(
    "vocab_coverage",
    tags=("TXT-vocab",),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY word
),
vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS r FROM freq
  ) WHERE r <= 16
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
       round(count(*) FILTER (WHERE v.word IS NULL) / count(*), 4) AS oov_rate
FROM tok t LEFT JOIN vocab v USING (word)
WHERE t.doc_id % 11 = 0
GROUP BY t.doc_id
""",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep shape: induce a vocabulary as the corpus's top-K words
    by frequency (deterministic count-desc/word-asc tiebreak), then score
    each document's out-of-vocabulary token rate against it. Two passes over
    the corpus: a word-count aggregate whose top-K is tiny and broadcasts,
    then a map-side membership join — the 100-TB wordcount is the only
    shuffle, and it moves (word, count) pairs, not text."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ", -1)).alias("word"))
    freq = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    r = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("word"))
    )
    vocab = freq.select("word", r.alias("r")).filter(F.col("r") <= 16).select(
        "word", F.lit(True).alias("in_vocab")
    )
    scored = tok.filter(F.col("doc_id") % 11 == 0).join(
        F.broadcast(vocab), "word", "left"
    )
    n_tokens = F.count("*").cast("long")
    n_oov = F.count_if(F.col("in_vocab").isNull()).cast("long")
    return scored.groupBy("doc_id").agg(
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.round(n_oov / n_tokens, 4).alias("oov_rate"),
    )


@register(
    "eval_contamination",
    tags=("PIPE-contamination",),
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                     || w[i+3])) AS gram
  FROM t
  WHERE len(w) >= 4
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0),
tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 29 <> 0)
SELECT tr.doc_id,
       CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS n_shared_grams
FROM tr JOIN ev USING (gram)
GROUP BY tr.doc_id
""",
)
def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: flag training documents sharing any
    4-gram with the held-out eval set (here: doc_id % 29 == 0). The eval
    side is tiny by construction, so its distinct grams broadcast — the scan
    over the 100-TB training side never shuffles; contaminated-gram counts
    come from a partial-aggregated groupBy on doc_id. At production scale the
    join key would be xxhash64(gram) to move 8 bytes instead of strings
    (kept as raw strings here so the DuckDB oracle joins identically)."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", F.split("text", " ", -1).alias("w"))
        .filter(F.size("w") >= 4)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w)-4),"
                    " i -> concat(w[i],' ',w[i+1],' ',w[i+2],' ',w[i+3]))"
                )
            ).alias("gram"),
        )
    )
    ev = grams.filter(F.col("doc_id") % 29 == 0).select("gram").distinct()
    tr = grams.filter(F.col("doc_id") % 29 != 0)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("long").alias("n_shared_grams"))
    )
