"""Second graph-analytics batch over the co-purchase graph: triangle
counting and degree distribution, plus a FORWARD as-of join (next-event
within tolerance — the direction pandas merge_asof calls 'forward', the
complement of asof_view_attribution's backward lookup).

Graph edges reuse pagerank_copurchase's definition (parts co-purchased in
≥2 orders, undirected) so the module family shares one graph semantics.
All scores/counts are BIGINT — hash-oracle-safe at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_EDGES_SQL = """
pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical co-purchase edge list with src < dst (one row per edge)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("src", "dst")
    )


_TRIANGLE_ORACLE = f"""
WITH {_EDGES_SQL},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.src = e1.dst
  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
per_node AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT node AS l_partkey, triangles
FROM per_node
ORDER BY triangles DESC, node ASC
LIMIT 20
"""


@register("triangle_count_copurchase", tags=("graph", "motif"), oracle=_TRIANGLE_ORACLE)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation, top 20. The canonical a<b<c
    ordering enumerates each triangle exactly once: wedge join
    (edges ⋈ edges on shared middle vertex) then a hash semi-check that
    the closing edge exists. The edge list materializes once
    (localCheckpoint) and feeds all three join legs; at 100 TB edges
    shuffle by vertex so wedges build node-locally, and the closing-edge
    probe is a hash join on (a, c) — never an all-pairs product."""
    edges = _pairs(spark, sf_dir).localCheckpoint()
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        per_node.orderBy(F.desc("triangles"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("l_partkey"), "triangles")
    )


_DEGREE_ORACLE = f"""
WITH {_EDGES_SQL},
und AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src AS node, count(*) AS degree FROM und GROUP BY src)
SELECT degree, count(*) AS node_count
FROM deg GROUP BY degree ORDER BY degree
"""


@register("degree_distribution", tags=("graph", "profiling"), oracle=_DEGREE_ORACLE)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph: degree per vertex (one
    shuffle on vertex), then node-count per degree (second, tiny shuffle).
    The classic two-level aggregation whose output is bounded by
    max-degree — safe to collect/plot at any corpus size."""
    edges = _pairs(spark, sf_dir)
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree").agg(F.count("*").alias("node_count")).orderBy("degree")
    )


_ASOF_FWD_ORACLE = """
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events
)
SELECT event_id, user_id, ts, next_purchase_ts,
       (next_purchase_ts IS NOT NULL
        AND date_diff('second', ts, next_purchase_ts) <= 900) AS converted_15m
FROM seq
WHERE event_type = 'view'
ORDER BY user_id, ts, event_id
"""


@register("asof_forward_next_purchase", tags=("J-asof", "forward"), oracle=_ASOF_FWD_ORACLE)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join expressed without any join at all: interleave
    each user's event sequence once, and carry the next purchase timestamp
    backward with first_value(... IGNORE NULLS) over a FOLLOWING frame.
    One shuffle on user_id, per-user sorted windows — the merge_asof
    'forward' direction at 100 TB is a single pass per key, versus the
    naive view×purchase join + min-agg which shuffles both sides and
    explodes on active users. Tolerance check (≤15 min) is a map-side
    predicate on the carried timestamp."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    seq = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.first(
            F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("next_purchase_ts"),
    )
    return (
        seq.filter(F.col("event_type") == "view")
        .select(
            "event_id",
            "user_id",
            "ts",
            "next_purchase_ts",
            (
                F.col("next_purchase_ts").isNotNull()
                & (
                    F.unix_timestamp("next_purchase_ts") - F.unix_timestamp("ts")
                    <= 900
                )
            ).alias("converted_15m"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    steps = []
    prev = "e0"
    for r in range(1, rounds + 1):
        steps.append(f"""
k{r} AS (
  SELECT src AS node FROM {prev} GROUP BY src HAVING count(*) >= {k}
),
e{r} AS (
  SELECT e.src, e.dst FROM {prev} e
  JOIN k{r} a ON a.node = e.src
  JOIN k{r} b ON b.node = e.dst
)""")
        prev = f"e{r}"
    return f"""
WITH {_EDGES_SQL},
e0 AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),{",".join(steps)}
SELECT src AS l_partkey, count(*) AS core_degree
FROM {prev}
GROUP BY src
ORDER BY core_degree DESC, l_partkey ASC
LIMIT 50
"""


@register(
    "kcore_membership", tags=("graph", "iterative"), oracle=_kcore_oracle(3, 4)
)
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=3, 4 rounds): repeatedly delete vertices of
    degree < 3 and the edges they carry — the iterative-DELETION graph
    shape (vs pagerank's value iteration): each round is one degree
    count + two semi-joins that shrink the edge set monotonically, so
    round cost decreases as the core tightens. Fixed round count unrolls
    into chained oracle CTEs; all counts BIGINT — hash-exact. Output:
    surviving vertices with their in-core degrees."""
    edges0 = _pairs(spark, sf_dir)
    edges = edges0.unionAll(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    for _ in range(4):
        keep = (
            edges.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= 3)
            .select(F.col("src").alias("node"))
        )
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src", "semi")
            .join(
                keep.withColumnRenamed("node", "dst"), "dst", "semi"
            )
            .select("src", "dst")
        )
    return (
        edges.groupBy("src")
        .agg(F.count("*").alias("core_degree"))
        .orderBy(F.desc("core_degree"), F.asc("src"))
        .limit(50)
        .select(F.col("src").alias("l_partkey"), "core_degree")
    )
