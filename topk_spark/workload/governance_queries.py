"""Data-governance / ops-tooling operators: lineage columns, k-anonymity
audit, key-skew profiling, and curriculum ordering — the operational layer
around a 100 TB corpus (who wrote this row, can it be re-identified, which
keys will melt a shuffle, what order to feed the trainer).

Determinism: lineage facts are derived from partition paths (not file
UUIDs); skew shares and curriculum scores are integer ppm; curriculum
tie-breaks use md5 hex (identical string in Spark and DuckDB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.ops.layout import materialize_once, write_partitioned_daily
from topk_spark.workload import register
from topk_spark.workload.layout_queries import _layout_root  # shared cache key


_PROVENANCE_ORACLE = """
SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
"""


@register(
    "file_provenance_partitions",
    tags=("governance", "lineage"),
    oracle=_PROVENANCE_ORACLE,
)
def file_provenance_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level lineage via input_file_name(): every row of the daily-
    partitioned events table reports WHICH partition path it was read
    from, and the path-derived date must equal the data's own date — the
    oracle is the plain group-by-date, so a hash match proves the lineage
    column, the hive partition layout, and the reader agree end-to-end.
    At 100 TB this is the audit query behind "which files fed this
    training run"."""
    path = materialize_once(
        _layout_root(sf_dir, "events_daily"),
        lambda p: write_partitioned_daily(load_table(spark, sf_dir, "events"), p),
    )
    df = spark.read.parquet(path)
    return (
        df.select(
            F.to_date(
                F.regexp_extract(F.input_file_name(), r"event_date=([0-9-]+)", 1)
            ).alias("event_date")
        )
        .groupBy("event_date")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_date")
    )


_KANON_ORACLE = """
WITH quasi AS (
  SELECT event_type,
         hour(ts) AS hr,
         CAST(floor(value / 10) AS BIGINT) AS value_band
  FROM events
)
SELECT event_type, hr, value_band, count(*) AS k
FROM quasi
GROUP BY event_type, hr, value_band
HAVING count(*) < 5
ORDER BY k ASC, event_type, hr, value_band
"""


@register("k_anonymity_audit", tags=("governance", "privacy"), oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (event_type,
    hour, value band): every combination observed fewer than 5 times is a
    re-identification risk and gets a row. One partial+final count on the
    quasi-id key — the HAVING gate runs post-aggregate on the (bounded)
    combination space, so output size is independent of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    quasi = ev.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") / 10).cast("long").alias("value_band"),
    )
    return (
        quasi.groupBy("event_type", "hr", "value_band")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") < 5)
        .orderBy("k", "event_type", "hr", "value_band")
    )


_SKEW_ORACLE = """
WITH per_key AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
tot AS (SELECT count(*) AS n FROM events)
SELECT user_id, cnt, (cnt * 1000000) // tot.n AS share_ppm
FROM per_key, tot
ORDER BY cnt DESC, user_id ASC
LIMIT 10
"""


@register("key_skew_profile", tags=("governance", "SKEW"), oracle=_SKEW_ORACLE)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic: the 10 heaviest join/agg keys with their
    corpus share in exact ppm (integer floor-divide — no float). This is
    the query you run BEFORE choosing salting factors (salted_skew_join)
    or AQE skew thresholds; one count per key + a bounded-heap top-10."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = ev.agg(F.count("*").alias("n"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id", "cnt", F.expr("(cnt * 1000000) div n").alias("share_ppm")
        )
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )


_CURRICULUM_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         (len(list_distinct(list_filter(
             string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))) * 1000000)
         // greatest(len(list_filter(
             string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')), 1)
           AS diversity_ppm
  FROM documents
),
binned AS (
  SELECT doc_id, diversity_ppm,
         ntile(10) OVER (ORDER BY diversity_ppm DESC, doc_id ASC) AS decile
  FROM scored
)
SELECT doc_id, diversity_ppm, decile
FROM binned
ORDER BY decile ASC, md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
LIMIT 100
"""


@register("curriculum_order", tags=("PIPE-curriculum",), oracle=_CURRICULUM_ORACLE)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: score every doc (token-diversity ppm —
    distinct/total tokens, exact integer), bin into quality deciles, then
    order easy-first with a deterministic md5 shuffle WITHIN each decile
    (so batches mix sources while the difficulty ramp holds).

    The decile is EXACT ntile(10) computed WITHOUT a global-order window:
    (1) per-score counts (score domain is bounded by the ppm scale, so
    this aggregate is small), (2) prefix-sum over the score table gives
    each score's global rank offset, (3) row_number PARTITIONED by score
    (distributed — ties break by doc_id) gives the within-score offset,
    (4) ntile's group-of-position formula (first n%10 groups get one
    extra row) is pure integer arithmetic on pos and the broadcast total.
    Hash-matching DuckDB's ntile() proves the decomposition exact. First
    100 rows of the curriculum via bounded-heap TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        F.expr(
            "(size(array_distinct(filter(split(lower(text), '[^a-z]+'), x -> x <> ''))) * 1000000)"
            " div greatest(size(filter(split(lower(text), '[^a-z]+'), x -> x <> '')), 1)"
        ).alias("diversity_ppm"),
    )
    per_score = scored.groupBy("diversity_ppm").agg(F.count("*").alias("cnt"))
    w_prefix = Window.orderBy(F.desc("diversity_ppm")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = per_score.select(
        "diversity_ppm",
        F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0)).alias("before"),
    )
    tot = scored.agg(F.count("*").alias("n"))
    w_in_score = Window.partitionBy("diversity_ppm").orderBy(F.asc("doc_id"))
    positioned = (
        scored.withColumn("in_score", F.row_number().over(w_in_score))
        .join(F.broadcast(prefix), "diversity_ppm")
        .crossJoin(F.broadcast(tot))
        .withColumn("pos", F.col("before") + F.col("in_score"))
    )
    # ntile(k): base = n div k, rem = n mod k; groups 1..rem hold base+1 rows
    binned = positioned.withColumn(
        "decile",
        F.expr(
            "CASE WHEN pos <= (n % 10) * ((n div 10) + 1)"
            " THEN (pos - 1) div ((n div 10) + 1) + 1"
            " ELSE (n % 10) + (pos - (n % 10) * ((n div 10) + 1) - 1) div (n div 10) + 1"
            " END"
        ).cast("int"),
    )
    return (
        binned.select("doc_id", "diversity_ppm", "decile")
        .orderBy(
            F.asc("decile"),
            F.asc(F.md5(F.col("doc_id").cast("string"))),
            F.asc("doc_id"),
        )
        .limit(100)
    )
