"""Data-augmentation prep (round 2): T5/UL2-style span corruption planned
as a deterministic, engine-portable rule — the masking schedule a denoising
pretraining pipeline computes per document before writing (inputs, targets)
pairs.

The rule (shared verbatim with the oracle): a span STARTS at token position
p iff the first hex char of md5(doc_id || ':' || p) is '0' (≈ 1/16 of
positions); its LENGTH is 1 + ascii(second hex char) % 3 (1–3 tokens).
Overlapping spans merge by position-coverage semantics (a token is masked
if ANY span covers it). Everything is string/integer arithmetic on md5 hex
— the repo's standard portable-determinism device (cf. stratified split's
md5-rank) — so the whole schedule value-hashes between engines.

Scale shape: one explode scan; span starts expand to covered positions
in-projection (sequence() over 1–3 ints, bounded fan-out); the only
shuffle is the per-doc aggregate of masked-position counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_SPAN_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         CAST(generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
              AS BIGINT) AS pos
  FROM documents WHERE doc_id % 5 = 2
),
n AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
starts AS (
  SELECT doc_id, pos,
         1 + ascii(substr(md5(doc_id || ':' || pos), 2, 1)) % 3 AS span_len
  FROM toks
  WHERE substr(md5(doc_id || ':' || pos), 1, 1) = '0'
),
covered AS (
  SELECT DISTINCT s.doc_id, s.pos + u.i AS mpos
  FROM starts s, unnest(range(0, 3)) AS u(i)
  WHERE u.i < s.span_len
),
masked AS (
  SELECT c.doc_id, count(*) AS n_masked
  FROM covered c JOIN toks t ON t.doc_id = c.doc_id AND t.pos = c.mpos
  GROUP BY c.doc_id
),
st AS (SELECT doc_id, count(*) AS n_spans FROM starts GROUP BY doc_id)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(st.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(masked.n_masked, 0) AS BIGINT) AS n_masked,
       CAST(COALESCE(masked.n_masked, 0) * 1000000 // n.n_tokens AS BIGINT)
         AS mask_ppm
FROM n
LEFT JOIN st USING (doc_id)
LEFT JOIN masked ON masked.doc_id = n.doc_id
"""


@register("span_corruption_stats", tags=("AUG-span",), oracle=_SPAN_ORACLE)
def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-corruption schedule stats: number of mask spans,
    tokens covered (overlaps merged), and exact-ppm mask ratio under the
    deterministic md5 start/length rule. The coverage expansion is
    in-projection (sequence over ≤3 offsets); clipping to the document end
    rides the join back to real positions. One shuffle (per-doc agg)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"))
    key = F.md5(F.concat_ws("", F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")))
    n = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    starts = toks.withColumn("h", key).filter(
        F.substring("h", 1, 1) == "0"
    ).select(
        "doc_id",
        "pos",
        (1 + F.ascii(F.substring("h", 2, 1)) % 3).alias("span_len"),
    )
    covered = (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("span_len") - 1)
            ).alias("mpos"),
        )
        .distinct()
        .join(
            toks.select("doc_id", F.col("pos").alias("mpos")),
            ["doc_id", "mpos"],
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_masked"))
    )
    st = starts.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    return (
        n.join(st, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
            # integral div mirrors the oracle's exact '//' (drift ppm notes)
            F.expr(
                "CAST(coalesce(n_masked, 0) * 1000000 div n_tokens AS BIGINT)"
            ).alias("mask_ppm"),
        )
    )
