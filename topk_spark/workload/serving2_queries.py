"""Dashboard serving patterns over the top-k surface — round-8 late.

Two reads every leaderboard UI issues against an engine like the
reference (its serving tier exposes ranked group-by results,
TopKStreamingJob.kt + the HTTP API in serve/api.py):

- `topk_with_others`: top-N groups plus ONE residual row aggregating
  everything else — the classic "Top 3 + Other" pie/donut read. The
  residual makes the result self-normalizing (rows sum to the grand
  total), which a bare LIMIT N read cannot do.
- `leaderboard_delta`: rank movement between the two halves of the time
  range — the "trending" read. Emitted per current-top-10 user with the
  prior-half rank, so the UI can draw arrows without a second query.

100 TB posture: both run entirely over the (type, user) aggregate
(cardinality = active users x 5 types, orders of magnitude below raw
events), produced by one partial-agg shuffle; the rank windows partition
by event_type over that reduced table. The residual row is computed by
re-grouping the ranked aggregate, not by a second scan of raw data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.workload import register
from topk_spark.workload.events_queries import _ES, order_stream

_N = 3

_OTHERS_ORACLE = f"""
WITH {_ES},
t AS (
  SELECT event_type, user_id, CAST(SUM(revenue_cents) AS BIGINT) AS rev
  FROM es WHERE revenue_cents IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, rev,
         row_number() OVER (
           PARTITION BY event_type ORDER BY rev DESC, user_id
         ) AS rnk
  FROM t
)
SELECT event_type,
       CASE WHEN rnk <= {_N} THEN CAST(user_id AS VARCHAR)
            ELSE 'others' END AS who,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM r GROUP BY 1, 2
"""


@register(
    "topk_with_others",
    tags=("K4", "K7", "A4", "serving"),
    oracle=_OTHERS_ORACLE,
)
def topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by revenue per event type, plus one 'others' row per
    type carrying the residual revenue and the count of folded users —
    rows per type sum to the type's grand total by construction."""
    es = order_stream(spark, sf_dir).where(F.col("revenue_cents").isNotNull())
    t = es.groupBy("event_type", "user_id").agg(
        F.sum("revenue_cents").cast("long").alias("rev")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("rev"), F.asc("user_id"))
    r = t.withColumn("rnk", F.row_number().over(w))
    return (
        r.withColumn(
            "who",
            F.when(F.col("rnk") <= _N, F.col("user_id").cast("string"))
            .otherwise(F.lit("others")),
        )
        .groupBy("event_type", "who")
        .agg(
            F.sum("rev").cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_users"),
        )
    )


_DELTA_ORACLE = f"""
WITH {_ES},
b AS (SELECT min(epoch_ms(ts)) AS t0, max(epoch_ms(ts)) AS t1 FROM es
      WHERE revenue_cents IS NOT NULL),
t AS (
  SELECT event_type, user_id,
         CASE WHEN epoch_ms(ts) * 2 >= b.t0 + b.t1 THEN 1 ELSE 0 END AS half,
         revenue_cents
  FROM es CROSS JOIN b WHERE revenue_cents IS NOT NULL
),
s AS (
  SELECT event_type, user_id, half, CAST(SUM(revenue_cents) AS BIGINT) AS rev
  FROM t GROUP BY 1, 2, 3
),
r AS (
  SELECT event_type, user_id, half, rev,
         row_number() OVER (
           PARTITION BY event_type, half ORDER BY rev DESC, user_id
         ) AS rnk
  FROM s
)
SELECT now.event_type, now.user_id,
       CAST(now.rnk AS INT) AS rank_now,
       CAST(prev.rnk AS INT) AS rank_prev,
       CAST(coalesce(prev.rnk, 0) - now.rnk AS INT) AS delta
FROM (SELECT * FROM r WHERE half = 1 AND rnk <= 10) now
LEFT JOIN (SELECT * FROM r WHERE half = 0) prev
  ON now.event_type = prev.event_type AND now.user_id = prev.user_id
"""


@register(
    "leaderboard_delta",
    tags=("K4", "K7", "serving"),
    oracle=_DELTA_ORACLE,
)
def leaderboard_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending read: the current half-range top-10 per event type with
    each user's rank in the earlier half and the movement (positive =
    climbed; rank_prev 0 = new entrant). The half split is integer-exact
    (2*ts >= t0+t1 avoids the midpoint division both engines would have
    to round identically)."""
    es = order_stream(spark, sf_dir).where(F.col("revenue_cents").isNotNull())
    b = es.agg(
        F.min(F.unix_millis("ts")).alias("t0"),
        F.max(F.unix_millis("ts")).alias("t1"),
    )
    t = es.crossJoin(F.broadcast(b)).withColumn(
        "half",
        F.when(
            F.unix_millis("ts") * 2 >= F.col("t0") + F.col("t1"), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    s = t.groupBy("event_type", "user_id", "half").agg(
        F.sum("revenue_cents").cast("long").alias("rev")
    )
    w = Window.partitionBy("event_type", "half").orderBy(
        F.desc("rev"), F.asc("user_id")
    )
    r = s.withColumn("rnk", F.row_number().over(w))
    now = r.where((F.col("half") == 1) & (F.col("rnk") <= 10)).select(
        "event_type", "user_id", F.col("rnk").alias("rank_now")
    )
    prev = r.where(F.col("half") == 0).select(
        "event_type", "user_id", F.col("rnk").alias("rank_prev")
    )
    return (
        now.join(prev, ["event_type", "user_id"], "left")
        .select(
            "event_type",
            "user_id",
            "rank_now",
            "rank_prev",
            (F.coalesce(F.col("rank_prev"), F.lit(0)) - F.col("rank_now"))
            .cast("int")
            .alias("delta"),
        )
    )
