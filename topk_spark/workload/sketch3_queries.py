"""Count-min sketch as pure relational algebra — a fully HASH-CHECKED
approximate operator (rare: most sketches get rows-only checks; this one
is deterministic end-to-end because the hash family is plain affine
arithmetic both engines can evaluate).

The reference's whole theme is top-k; CMS is the sketch that answers it
when exact per-key state no longer fits: counters are a fixed D×W grid no
matter how many distinct keys exist, and the grid IS a groupBy — no custom
state, no UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_W = 1024  # counters per row
_D = 4  # hash rows
_P = (1000003, 999983, 1000033, 1000037)  # affine multipliers (primes)
_C = (17, 31, 61, 89)
_TOPN = 20


def _pos(col, d: int):
    return F.pmod(col * _P[d] + _C[d], F.lit(_W))


def _pos_sql(expr: str, d: int) -> str:
    return f"(({expr} * {_P[d]} + {_C[d]}) % {_W})"


_CMS_ORACLE = f"""
WITH sk AS (
  {" UNION ALL ".join(
      f"SELECT {d} AS d, {_pos_sql('l_partkey', d)} AS pos, "
      "count(*) AS cnt FROM lineitem GROUP BY 2"
      for d in range(_D)
  )}
),
top_parts AS (
  SELECT l_partkey, count(*) AS exact_cnt
  FROM lineitem GROUP BY l_partkey
  ORDER BY exact_cnt DESC, l_partkey LIMIT {_TOPN}
),
probes AS (
  {" UNION ALL ".join(
      f"SELECT l_partkey, exact_cnt, {d} AS d, "
      f"{_pos_sql('l_partkey', d)} AS pos FROM top_parts"
      for d in range(_D)
  )}
)
SELECT p.l_partkey, p.exact_cnt, min(s.cnt) AS cms_est,
       min(s.cnt) >= p.exact_cnt AS never_undercounts
FROM probes p JOIN sk s ON s.d = p.d AND s.pos = p.pos
GROUP BY p.l_partkey, p.exact_cnt
"""


@register("cms_frequent_items", tags=("sketch", "topk"), oracle=_CMS_ORACLE)
def cms_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built ENTIRELY from groupBy: each of the D hash
    rows maps l_partkey to one of W counters (affine hash — SQL-portable,
    so the DuckDB oracle recomputes the sketch bit-for-bit and the driver
    hash-checks an approximate operator end-to-end). Sketch size is D×W
    counters regardless of key cardinality — the fixed-memory answer to
    per-key top-k state at 100 TB. Probing the top-N exact items shows
    the defining CMS property in the output: `cms_est >=
    exact_cnt` for every item (collisions only ever inflate).
    Shape: one shuffle of (d, pos) pairs for the sketch (4096 groups),
    one for exact counts; the probe joins against the 4096-row sketch —
    broadcast-sized forever."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    sk = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _pos(F.col("l_partkey"), d).alias("pos"),
                        )
                        for d in range(_D)
                    ]
                )
            ).alias("s")
        )
        .select("s.d", "s.pos")
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cnt"))
    )
    top_parts = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("l_partkey"))
        .limit(_TOPN)
    )
    probes = top_parts.select(
        "l_partkey",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _pos(F.col("l_partkey"), d).alias("pos"),
                    )
                    for d in range(_D)
                ]
            )
        ).alias("s"),
    ).select("l_partkey", "exact_cnt", "s.d", "s.pos")
    return (
        probes.join(F.broadcast(sk), ["d", "pos"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "l_partkey",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias(
                "never_undercounts"
            ),
        )
    )
