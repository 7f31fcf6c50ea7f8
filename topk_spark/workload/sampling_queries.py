"""Weighted sampling for corpus construction — round-2c addition to the
LLM-data-pipeline surface.

``weighted_priority_sample`` is priority sampling (Duffield, Lund, Thorup
2007): each item draws priority q = w/u with u uniform on (0,1], and the
sample is the top-m priorities — inclusion probability is proportional to
weight in expectation, with an unbiased Horvitz-Thompson estimator given by
the (m+1)-th priority. The "random" u here is the engine-portable md5
uniform the repo already uses for masking/sampling schedules: the first 12
hex chars of md5(doc_id) as a 48-bit integer, so the whole draw is
deterministic and the DuckDB oracle replays it bit-for-bit.

Integer discipline: q = (w·2⁴⁸) div (u+1) in BIGINT with the weight
CLAMPED to w ≤ 2¹⁵−1, so the product is ≤ 2⁶³−2⁴⁸ and can never overflow
signed 64-bit — Spark would wrap silently to negative priorities while
DuckDB raises, corrupting the sample and diverging from the oracle the
moment any document reaches 32 Ki chars. The clamp is applied identically
in both engines (weight IS the clamped value, so the emitted rows agree
too); +1 guards the measure-zero u=0. Integer division collapses
near-ties, so the order includes doc_id as the deterministic tiebreak —
documented deviation from real-valued DLT, irrelevant at 48-bit precision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.ops.kmv import u48_expr
from topk_spark.workload import register
from topk_spark.ops.topk import topn

_M = 50  # sample size
_SCALE = 1 << 48

_W_CAP = (1 << 15) - 1  # max weight: cap·2^48 = 2^63 − 2^48 < BIGINT max

# The DLT priority draw as a shared SQL fragment — spliced into this
# module's oracle AND the streaming sample drains' (bottomk_queries),
# so the batch/stream twins cannot drift formula-wise.
PRIORITY_Q_CTE = f"""
u AS (
  SELECT doc_id, source, least(n_chars, {_W_CAP}) AS w,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
           AS u48
  FROM documents
),
q AS (
  SELECT doc_id, source, w,
         (w * {_SCALE}) // (u48 + 1) AS priority
  FROM u
)
"""

_PRIORITY_ORACLE = f"""
WITH {PRIORITY_Q_CTE}
SELECT doc_id, source, CAST(w AS BIGINT) AS weight,
       CAST(priority AS BIGINT) AS priority
FROM q
ORDER BY priority DESC, doc_id
LIMIT {_M}
"""


def dlt_priority_projection(docs: DataFrame) -> DataFrame:
    """(source, doc_id, weight, priority) — the engine-side twin of
    PRIORITY_Q_CTE, shared by the batch sample and the streaming sampler
    (streaming/priority_sample.py). Map-side only: clamp, md5 uniform,
    integer priority; document text never leaves the projection."""
    return docs.select(
        "source",
        "doc_id",
        F.least(F.col("n_chars").cast("long"), F.lit(_W_CAP).cast("long"))
        .alias("weight"),
        u48_expr(F.col("doc_id")).alias("u48"),
    ).selectExpr(
        "source",
        "doc_id",
        "weight",
        f"(weight * CAST({_SCALE} AS BIGINT)) div (u48 + 1) AS priority",
    )


@register(
    "weighted_priority_sample",
    tags=("sampling", "mixture"),
    oracle=_PRIORITY_ORACLE,
)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-m priority sample of documents weighted by length (n_chars) —
    the weight-proportional doc picker for mixture construction, exactly
    replayable across engines.

    100 TB posture: priorities are one map-side expression (md5 + integer
    arithmetic, whole-stage codegen); the top-m is a bounded heap
    (TakeOrderedAndProject) — per-partition heaps of size m merge at the
    driver, nothing shuffles, no global sort. m=50 here; at any m that fits
    one node this stays a single pass."""
    d = load_table(spark, sf_dir, "documents")
    q = dlt_priority_projection(d).select(
        "doc_id", "source", "weight", "priority"
    )
    return topn(q, [F.desc("priority"), F.asc("doc_id")], _M)
