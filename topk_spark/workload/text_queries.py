"""Text-analysis operators over the `documents` table (north-star
LLM-data-pipeline surface, BASELINE.json:6): token counting, quality scoring,
exact dedup by content hash, fingerprinting, multimodal binary plumbing.

All hot-path logic is built-in Catalyst expressions (split / higher-order
array functions / md5) — JVM-side, whole-stage-codegen'd, no Python in the
loop. At 100 TB these run as pure map-side scans: no shuffle except the final
group-bys on already-reduced data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

# Stopword set used by quality scoring — tiny, embedded in the plan as a
# literal array (broadcast-free).
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "token_stats",
    tags=("TXT-tokens",),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       n_chars,
       lang,
       source
FROM documents
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length accounting per document — the
    cheapest text-quality signal; single map-side scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
        "lang",
        "source",
    )


@register(
    "quality_score",
    tags=("TXT-quality",),
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({_SW_SQL}))) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, lang, n_tokens, n_stop,
       CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
       CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
FROM t
""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per doc: mean token length + stopword ratio, via
    higher-order array functions (no UDF). Docs with degenerate ratios are
    what a training-data pipeline filters out."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.filter(toks, lambda w: F.array_contains(sw, w))).cast("long").alias("n_stop"),
    )
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stop",
        (F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")).alias("avg_token_len"),
        (F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")).alias("stopword_ratio"),
    )


@register(
    "docs_exact_dedup",
    tags=("DD-exact",),
    oracle="""
SELECT md5(text) AS text_md5,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-zero-cost dedup: group by content hash, keep min doc_id as
    canonical. Hashing BEFORE the shuffle means the exchange carries 16-byte
    keys, not document payloads — the only way exact dedup scales to 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").cast("long").alias("canonical_doc_id"),
        F.count("*").alias("n_copies"),
    )


@register(
    "doc_fingerprint",
    tags=("TXT-fingerprint",),
    oracle="""
SELECT doc_id, md5(text) AS fingerprint,
       substring(md5(text), 1, 8) AS shard_key
FROM documents
WHERE doc_id % 10 = 0
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint + derived shard key (prefix) — the
    identity used for cross-run dedup joins and for partitioning a 100 TB
    corpus into balanced content-addressed shards."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.substring(F.md5("text"), 1, 8).alias("shard_key"),
    )


@register(
    "multimodal_binary_meta",
    tags=("MM-binary",),
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS payload_bytes,
       CAST(length(text) AS BIGINT) AS n_codepoints,
       source
FROM documents
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: treat content as an opaque binary payload
    (here utf-8 bytes standing in for image/audio blobs) with typed metadata
    alongside. Byte-length vs codepoint-length distinguishes the binary from
    the text view of the same column."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.length("text").cast("long").alias("n_codepoints"),
        "source",
    )
