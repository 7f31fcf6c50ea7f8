"""Join-heavy engine-generic queries: multi-table star joins (TPC-H Q3/Q5
shapes), an as-of (temporal) join, and session windows.

The reference contains no joins (SURVEY.md §2 "Joins / set operations") —
these queries exist because a complete engine must still execute them well,
and because they are where 100 TB plans go wrong. Scale notes inline; the
design rules: shrink the fact table before it moves, broadcast every
dimension, and express temporal matching without an exploding
inequality join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_P = "decimal(12,2)"
_D = "decimal(4,2)"

# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-10 over a 3-way join
# ---------------------------------------------------------------------------

_Q3_DATE = "1999-01-01"


@register(
    "q3_shipping_priority",
    tags=("J-star", "A4", "K6"),
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '{_Q3_DATE}'
  AND l.l_shipdate > DATE '{_Q3_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. Scale plan: filter BOTH fact sides before any join
    (predicate pushdown to the parquet scan), broadcast the filtered
    customer dimension into orders, and let the only real shuffle be
    orders⋈lineitem on orderkey. Top-10 is TakeOrderedAndProject — no global
    sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice").cast(_P) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: regional supplier volume over a 6-way join
# ---------------------------------------------------------------------------


@register(
    "q5_region_volume",
    tags=("J-star", "A4"),
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
""",
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six tables, one year, one region. Scale plan: region ⋈
    nation ⋈ supplier collapses to a small broadcast (suppliers of one
    region); customer is also broadcast after the nation restriction; the
    fact-side work is lineitem ⋈ (date-filtered orders) on orderkey — the
    single big shuffle — with both broadcast probes map-side."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast(_P) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c),
              (o.o_custkey == c.c_custkey)
              & (c.c_nationkey == s.s_nationkey))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# As-of (temporal) join: purchase → latest preceding view by the same user
# ---------------------------------------------------------------------------


@register(
    "asof_view_attribution",
    tags=("J-asof",),
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       v.event_id AS view_event_id, v.ts AS view_ts,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events p
LEFT JOIN LATERAL (
  SELECT e2.event_id, e2.ts
  FROM events e2
  WHERE e2.user_id = p.user_id AND e2.event_type = 'view' AND e2.ts <= p.ts
  ORDER BY e2.ts DESC, e2.event_id DESC
  LIMIT 1
) v ON true
WHERE p.event_type = 'purchase'
""",
)
def asof_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (attribution): each purchase matched to the same user's
    most recent view at-or-before it. Spark lacks a native as-of join;
    the naive theta-join (`v.ts <= p.ts` + max) explodes quadratically per
    user. Instead: union both sides tagged, one shuffle on user_id, one
    ordered pass with `last(..., ignorenulls)` over an unbounded-preceding
    window — O(n log n) per user, no row amplification, same shape at any
    scale. Ties (view at the purchase's exact ts, duplicate view ts) break
    toward the highest event_id, matching the oracle's ORDER BY."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("v_eid"),
        F.col("ts").alias("v_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("v_eid"),
        F.lit(None).cast("timestamp").alias("v_ts"),
        "event_id",
    )
    # Views sort before purchases at equal ts (tag 0 < 1) → `<=` semantics;
    # among equal-ts views the highest event_id is seen last → wins.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tag").asc(), F.col("v_eid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("view_event_id", F.last("v_eid", ignorenulls=True).over(w))
        .withColumn("view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "view_event_id",
            "view_ts",
            (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# Session windows: gap-based sessionization of the event stream
# ---------------------------------------------------------------------------

_GAP_US = 6 * 3600 * 1_000_000  # 6 hours


@register(
    "sessionize_events",
    tags=("T-session",),
    oracle=f"""
WITH marks AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
       count(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS session_value
FROM sess
GROUP BY user_id, sid
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via `session_window` (6h inactivity gap) —
    the batch form of the Structured Streaming session operator (events
    merge while each starts before the previous session's end = last_ts +
    gap). One shuffle on (user_id, merged window); state at stream scale is
    one open session per active user. Sums use decimal for a deterministic
    oracle match."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "6 hours"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("session_value"),
        )
        .select("user_id", "session_start", "session_last", "n_events", "session_value")
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime pre-filtering: fixed-size join pruning
# ---------------------------------------------------------------------------


@register(
    "bloom_prefilter_join",
    tags=("join", "runtime-filter"),
    headline=True,  # bench: runtime-filter probe pruning ahead of the join shuffle
    oracle="""
SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       count(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of URGENT orders, with the lineitem probe side
    pre-filtered through a DataFrame-built Bloom bitset of the urgent
    order keys (ops/bloom.py) BEFORE the join: non-matching lineitems are
    dropped map-side by an 8 KiB broadcast + codegen bit test, so they
    never enter the join's exchange. False positives only re-add shuffle
    rows; the real equi-join afterwards makes the result exact — the
    oracle is the plain join. At 100 TB this is the hand-rolled form of
    Spark's runtime bloom-filter rewrite, with the bitset size FIXED no
    matter how many build keys (a broadcast semi-join's key set is not)."""
    from topk_spark.ops.bloom import bloom_build, bloom_prefilter
    from topk_spark.ops.money import sum_units_exact

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey")
    li_pruned = bloom_prefilter(li, "l_orderkey", bloom)
    # Round-14 (guide §5 / ops.money): the revenue sum promoted past
    # decimal precision 18 (BigDecimal per surviving row); same exact
    # quantization, product and accumulation in int64 split sums instead —
    # bit-identical output (pinned in tests/test_r14_optimizations.py).
    rev_u = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
        "long"
    ) * (F.lit(100) - (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long"))
    return (
        li_pruned.join(o, li_pruned["l_orderkey"] == o["o_orderkey"])
        .select(
            F.trunc("o_orderdate", "month").alias("order_month"),
            rev_u.alias("rev_u"),
        )
        .groupBy("order_month")
        .agg(
            F.count("*").alias("n_items"),
            sum_units_exact(F.col("rev_u"), 4).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Salted skew join: explicit hot-key mitigation as an operator
# ---------------------------------------------------------------------------

_SALT = 8


@register(
    "salted_skew_join",
    tags=("join", "skew"),
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit form of skew-join mitigation (AQE's skewJoin does this
    adaptively; salting is the deterministic version you reach for when a
    known-hot key — the one celebrity user, the null bucket — melts a
    task): fact rows get a salt in 0..S-1 derived from non-key columns,
    the dim side is replicated S× with every salt value, and the join key
    becomes (key, salt) — the hot key's rows now spread over S tasks
    instead of one. Replication cost is S× the SMALL side only. Oracle is
    the plain unsalted join: identical result, by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted_fact = li.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT)).cast(
            "int"
        ),
    )
    salted_dim = o.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    return (
        salted_fact.join(
            salted_dim,
            (salted_fact["l_orderkey"] == salted_dim["o_orderkey"])
            & (salted_fact["salt"] == salted_dim["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "interval_join_views_before_purchase",
    tags=("join", "interval"),
    oracle="""
SELECT p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.user_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
""",
)
def interval_join_views_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval join: EVERY view within the hour before each purchase by
    the same user (the batch twin of Structured Streaming's stream-stream
    interval join, where the same two predicates — equi-key + bounded
    time range — are exactly what lets the engine expire state). Executes
    as an equi-join on user_id with the range condition as a join
    residual: candidate pairs are bounded per user per hour, never
    user_events², and at stream scale the 1 h bound IS the state
    retention. Differs from `asof_view_attribution` (latest view only):
    attribution windows want the full fan-out."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    return (
        p.join(
            v,
            (p["user_id"] == v["user_id"])
            & (v["v_ts"] <= p["p_ts"])
            & (v["v_ts"] >= p["p_ts"] - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_id",
            "view_id",
            p["user_id"],
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
        )
    )
