"""Heavy hitters via a mergeable Misra-Gries (SpaceSaving-family) sketch —
the bounded-memory frequent-items operator a top-k engine runs when the key
domain is too large to groupBy outright (reference: the continuous top-k
family, ProcessFunctions.kt:62-134, whose bounded per-key heaps are the same
"keep a small summary, never materialize the full histogram" discipline).

Two-pass, provably exact under the published Misra-Gries bound:

  Pass 1 (candidates) — each input partition folds its rows into a weighted
  Misra-Gries summary of capacity CAP (Arrow-batched `mapInPandas`; dict
  accumulate per batch, prune to CAP by subtracting the (CAP+1)-th largest
  residual when the dict overflows). The classic charging argument bounds
  the total subtraction any item suffers in partition p by W_p/(CAP+1)
  (each prune destroys >= (CAP+1)*cut of tracked weight, and the cuts' sum
  is what any single item can lose), so EVERY item whose true weight in p
  exceeds W_p/(CAP+1) survives with a positive counter. Mergeability across
  partitions is the pigeonhole: if an item's global weight exceeds
  W/(CAP+1) = sum_p W_p/(CAP+1), some partition has it above its local
  bound, hence it appears in that partition's summary — the union of the
  per-partition summaries (<= CAP rows each) is a guaranteed superset of
  the heavy set. [Misra & Gries 1982; Agarwal et al., "Mergeable
  Summaries", PODS 2012 — public results.]

  Pass 2 (exact rescore) — the candidate union is tiny (<= CAP * partitions
  rows), so it broadcasts; an exact weighted count restricted to candidates
  (broadcast semi-join BEFORE the shuffle, so only candidate rows shuffle)
  filters to `total_w >= T` with T > W/(CAP+1) by construction
  (T = floor(W/(CAP+1)) + 1). The DuckDB oracle computes the exact weighted
  histogram with no sketch at all — a candidate set that dropped any true
  heavy hitter hash-mismatches, so the gate tests the MG guarantee itself.

At 100 TB: pass 1 is map-side only (no shuffle of the raw keys — each task
emits <= CAP summary rows); pass 2 shuffles only rows matching <= CAP * P
candidates. This is the standard two-round heavy-hitters topology; the full
groupBy it replaces would shuffle every row of the fact table.

Fixture note: the driver tables are deliberately near-uniform, so the query
plants deterministic skew (cohort = user_id % 97, weight 20 where
cohort % 19 == 0 else 1 — same arithmetic in both engines). Heavy cohorts
carry ~9% of W each vs the 1/64 threshold share and plain cohorts ~0.5%,
so membership is stable at every scale factor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

#: Misra-Gries summary capacity. CAP + 1 = 64 divides the threshold: the
#: operator guarantees exactness for any T > W/64. Kept under the 97-cohort
#: key domain so the sketch genuinely cannot hold the full histogram.
_CAP = 63


def mg_summarize(batches: Iterator[pd.DataFrame], cap: int = _CAP) -> Iterator[pd.DataFrame]:
    """Weighted Misra-Gries fold over one partition's Arrow batches.

    Accumulates exact (key -> weight) per batch via a vectorized groupby,
    then prunes to `cap` entries by subtracting the (cap+1)-th largest
    residual from every counter and dropping the non-positive ones. Memory
    is O(cap + batch_distinct) regardless of partition size; the emitted
    summary is <= cap rows."""
    counters: dict[int, int] = {}
    for pdf in batches:
        part = pdf["w"].groupby(pdf["cohort"]).sum()
        for key, wt in part.items():
            counters[key] = counters.get(int(key), 0) + int(wt)
        if len(counters) > cap:
            cut = sorted(counters.values(), reverse=True)[cap]
            counters = {k: v - cut for k, v in counters.items() if v > cut}
    yield pd.DataFrame(
        {"cohort": pd.Series(list(counters), dtype="int64"),
         "est": pd.Series(list(counters.values()), dtype="int64")}
    )


def heavy_hitters_weighted(
    ev: DataFrame, key: str = "cohort", weight: str = "w", cap: int = _CAP
) -> DataFrame:
    """Two-pass exact heavy hitters: MG candidates, then exact rescore of
    candidates with threshold T = floor(W/(cap+1)) + 1. Returns
    (key, total_w) for every key whose exact weighted count >= T."""
    slim = ev.select(F.col(key).alias("cohort"), F.col(weight).alias("w"))
    cand = (
        slim.mapInPandas(mg_summarize, schema="cohort long, est long")
        .select("cohort")
        .distinct()
    )
    thresh = slim.agg(F.sum("w").cast("long").alias("W")).select(
        (F.floor(F.col("W") / (cap + 1)) + 1).cast("long").alias("T")
    )
    exact = (
        slim.join(F.broadcast(cand), "cohort")
        .groupBy("cohort")
        .agg(F.sum("w").cast("long").alias("total_w"))
    )
    return (
        exact.crossJoin(F.broadcast(thresh))
        .where(F.col("total_w") >= F.col("T"))
        .select(F.col("cohort").alias(key), "total_w")
    )


@register(
    "spacesaving_heavy_cohorts",
    tags=("K1", "A4", "sketch", "llm-pipeline"),
    oracle="""
WITH e AS (
  SELECT user_id % 97 AS cohort,
         CASE WHEN (user_id % 97) % 19 = 0 THEN 20 ELSE 1 END AS w
  FROM events
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM e)
SELECT cohort, CAST(SUM(w) AS BIGINT) AS total_w
FROM e CROSS JOIN tot
GROUP BY cohort, tot.wtot
HAVING SUM(w) >= CAST(floor(tot.wtot / 64.0) + 1 AS BIGINT)
""",
)
def spacesaving_heavy_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted heavy hitters over event cohorts: which user cohorts carry
    more than 1/64 of total event weight. The Spark side never computes the
    full histogram — Misra-Gries candidates (map-side, <= 63 rows per task)
    then an exact broadcast-restricted rescore; the oracle computes the
    full exact histogram, so the hash match proves the sketch's no-false-
    negative guarantee, not just the rescore arithmetic."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 97).alias("cohort")
    )
    ev = ev.withColumn(
        "w",
        F.when(F.col("cohort") % 19 == 0, F.lit(20)).otherwise(F.lit(1)).cast("long"),
    )
    return heavy_hitters_weighted(ev)
