"""Entity-resolution and slowly-changing-dimension queries.

Two pipeline shapes every large-scale data platform needs that the
reference's OLAP surface implies but never ships (its dedup is exact-key
only, TopKStreamingJob.kt's keyed dedup):

- blocked fuzzy entity matching: candidate pairs come from equality
  blocking, the fuzzy predicate (levenshtein) runs only inside blocks —
  the standard answer to "all-pairs matching melts at scale".
- SCD2 reconstruction + point-in-time lookup: rebuild validity intervals
  from an event log with window functions, then answer "what was the
  entity's state at time T" without a range-join explosion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_LEV_MAX = 2
_PIT = "2024-01-15 12:00:00"


@register(
    "entity_blocked_pairs",
    tags=("er", "dedup"),
    oracle=f"""
SELECT a.c_custkey AS custkey_a,
       b.c_custkey AS custkey_b,
       a.c_nationkey AS nationkey,
       a.c_mktsegment AS mktsegment,
       levenshtein(a.c_name, b.c_name) AS name_dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_LEV_MAX}
""",
)
def entity_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-match candidates via equality blocking: pairs are
    generated ONLY within (nationkey, mktsegment) blocks — an equi-join
    Catalyst executes as one hash shuffle on the block key, so the
    candidate count is sum(block_size^2), never N^2. The fuzzy predicate
    (`levenshtein`, a JVM whole-stage-codegen builtin — no Python) then
    filters inside each block. At 100 TB the only change is a
    higher-cardinality blocking key (e.g. name-prefix + region) to keep
    blocks bounded; the plan shape is identical."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return (
        a.join(b, ["nationkey", "mktsegment"])
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn("name_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("name_dist") <= _LEV_MAX)
        .select("custkey_a", "custkey_b", "nationkey", "mktsegment", "name_dist")
    )


@register(
    "scd2_point_in_time",
    tags=("er", "temporal"),
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
versions AS (
  SELECT user_id, event_type, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes
)
SELECT user_id, event_type AS state_at_pit, valid_from
FROM versions
WHERE valid_from <= TIMESTAMP '{_PIT}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_PIT}')
""",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing dimension) reconstructed from the raw
    event log, then a point-in-time lookup: per user, collapse consecutive
    equal states into versions with [valid_from, valid_to) intervals (LAG
    to detect changes, LEAD to close intervals), and return each user's
    state valid at T. Both windows share PARTITION BY user_id ORDER BY
    (ts, event_id) → ONE shuffle + one sort, reused across both steps
    (Catalyst reuses the exchange). The PIT filter is a map-side predicate
    on the interval columns — no range join, no row amplification. At 100
    TB the dimension build is a single pass over the log; PIT reads are
    O(users), not O(events)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    versions = changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
    )
    pit = F.lit(_PIT).cast("timestamp")
    return versions.filter(
        (F.col("valid_from") <= pit)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > pit))
    ).select(
        "user_id",
        F.col("event_type").alias("state_at_pit"),
        "valid_from",
    )
