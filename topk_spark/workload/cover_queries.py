"""Greedy maximum-coverage source selection — round-2d: "which 3 sources
buy the most distinct 3-gram vocabulary?" — the submodular-coverage question
behind data-mixing and crawl-budget decisions (greedy is the classic
(1−1/e)-approximation; NeurIPS-style coreset selection runs exactly this
loop at corpus scale).

Each greedy round is distributed work over the (source, token) distinct
table: count each candidate's tokens NOT yet covered (anti-join against
the covered set), elect the max (ties to the lexicographically smallest
source), fold its vocabulary into the covered set. Three rounds unroll to
three aggregate+anti-join stages; only the 1-row winner per round touches
the driver. The oracle unrolls the same three rounds as CTEs, so the
driver hash-checks the full greedy trajectory, not just the final set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

# Hard bound on the greedy driver loop: each round costs one anti-join +
# aggregate + 1-row collect, and the oracle unrolls exactly this many CTE
# rounds — generalizing to large round counts needs a different shape
# (e.g. the lazy-greedy/priority-queue formulation), not a bigger constant.
_ROUNDS = 3
_MAX_ROUNDS = 16


def _check_rounds(n: int) -> int:
    if n > _MAX_ROUNDS:
        raise ValueError(
            f"greedy cover is a per-round driver loop; {n} rounds exceeds "
            f"the supported bound {_MAX_ROUNDS} — use a submodular-maximization "
            "formulation that batches rounds instead"
        )
    return n

_COVER_ORACLE = """
WITH toks AS (
  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS l
  FROM documents
),
st AS (
  SELECT DISTINCT source, concat_ws(' ', l[i], l[i+1], l[i+2]) AS t
  FROM toks, unnest(range(1, len(l) - 1)) AS r(i)
),
r1 AS (
  SELECT source, count(*) AS gain FROM st GROUP BY source
  ORDER BY gain DESC, source LIMIT 1
),
cov1 AS (SELECT DISTINCT t FROM st WHERE source = (SELECT source FROM r1)),
r2 AS (
  SELECT st.source, count(*) AS gain
  FROM st ANTI JOIN cov1 ON cov1.t = st.t
  WHERE st.source <> (SELECT source FROM r1)
  GROUP BY st.source
  ORDER BY gain DESC, source LIMIT 1
),
cov2 AS (
  SELECT t FROM cov1
  UNION
  SELECT DISTINCT t FROM st WHERE source = (SELECT source FROM r2)
),
r3 AS (
  SELECT st.source, count(*) AS gain
  FROM st ANTI JOIN cov2 ON cov2.t = st.t
  WHERE st.source NOT IN ((SELECT source FROM r1), (SELECT source FROM r2))
  GROUP BY st.source
  ORDER BY gain DESC, source LIMIT 1
)
SELECT 1 AS round, source, CAST(gain AS BIGINT) AS newly_covered FROM r1
UNION ALL
SELECT 2, source, CAST(gain AS BIGINT) FROM r2
UNION ALL
SELECT 3, source, CAST(gain AS BIGINT) FROM r3
ORDER BY round
"""


@register("greedy_source_cover", tags=("mixture", "coverage"), oracle=_COVER_ORACLE)
def greedy_source_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three greedy rounds of max-coverage source selection over the
    distinct (source, token) table (module docstring). Emits (round,
    source, newly_covered).

    100 TB posture: tokens reduce to the distinct (source, token) table
    once; every round is one anti-join + count aggregate on it plus a
    1-row argmax to the driver — the covered set grows as a reused
    DataFrame, never a collected token list."""
    d = load_table(spark, sf_dir, "documents")
    from topk_spark.ops.fuzzy_dedup import tokenize, word_shingles

    st = d.select(
        "source", F.explode(word_shingles(tokenize(F.col("text")), 3)).alias("t")
    ).distinct()
    picked: list[tuple[int, str, int]] = []
    covered = None
    remaining = st
    for rnd in range(1, _check_rounds(_ROUNDS) + 1):
        gains = remaining.groupBy("source").agg(F.count("*").alias("gain"))
        top = gains.orderBy(F.desc("gain"), F.asc("source")).limit(1).collect()
        if not top:
            break
        src, gain = top[0]["source"], int(top[0]["gain"])
        picked.append((rnd, src, gain))
        newly = st.filter(F.col("source") == src).select("t").distinct()
        covered = newly if covered is None else covered.unionByName(newly).distinct()
        remaining = (
            st.filter(~F.col("source").isin([p[1] for p in picked]))
            .join(covered, "t", "left_anti")
        )
    return spark.createDataFrame(
        picked, "round int, source string, newly_covered long"
    ).orderBy("round")
