"""TPC-H-adapted relational suite, part 3 — the five shapes parts 1+2 left
out because their original columns don't exist in the driver's reduced schema
(no partsupp, no l_commitdate/l_receiptdate/l_shipmode). Each is re-expressed
on the columns that DO exist while keeping the original's *operator shape*:

- Q2  min-cost supplier: correlated-min subquery + 4-dim join + ordered limit
  (lineitem (partkey,suppkey,extendedprice) stands in for partsupp supplycost)
- Q11 important stock: group-by with HAVING > scalar-fraction-of-global-sum
- Q12 shipmode lateness: join + two-way conditional aggregation on a date-diff
  lateness predicate (o_orderpriority classes stand in for shipmode)
- Q20 promo suppliers: nested aggregated-subquery semi-join chain
- Q21 waiting suppliers: self-join EXISTS + NOT EXISTS over the same fact
  (shipdate > orderdate + horizon stands in for receiptdate > commitdate)

Determinism contract (shared with tpch_queries): money math accumulates in
DECIMAL and is surfaced as DOUBLE; every top-k sort carries a unique-key
tiebreaker; HAVING thresholds compare doubles derived from exact decimal sums.

Scale notes inline per query. Reference parity context: the reference has no
joins at all (SURVEY.md §2 "Joins / set operations") — this suite is the
engine-generic SQL surface that replaces Pinot's query engine
(`QueryService.kt:43-129` delegates everything relational to Pinot SQL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_P = "decimal(12,2)"  # prices / quantities
_D = "decimal(4,2)"   # discount / tax fractions


@register(
    "q2_min_cost_supplier",
    tags=("J-corr", "J-star", "K6"),
    oracle="""
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS cost
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
), best AS (
  SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost FROM offers
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(b.cost AS DOUBLE) AS supply_cost
FROM best b
JOIN part p ON b.l_partkey = p.p_partkey
JOIN supplier s ON b.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE b.cost = b.min_cost AND p.p_size = 15 AND p.p_type = 'STANDARD'
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering the
    minimum cost within a region — correlated-min via a window over the
    per-(part,supplier) aggregate, then equality against the window min.

    Scale shape: the region/nation/supplier dims broadcast into the lineitem
    scan, so the fact shuffles once on (partkey, suppkey) for the aggregate;
    the window min reuses that same partitioning (partition-local, no second
    shuffle of the big side). Final dim joins run on the tiny survivor set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    region_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(region_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast(_P)).alias("cost"))
    )
    best = offers.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(region_supp), best.l_suppkey == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    tags=("A4", "J-scalar"),
    oracle="""
WITH nation_lines AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
)
SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
FROM nation_lines
GROUP BY l_partkey
HAVING CAST(SUM(v) AS DOUBLE)
       > (SELECT CAST(SUM(v) AS DOUBLE) FROM nation_lines) * 0.001
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation's suppliers,
    keeping parts worth more than a fixed fraction of the nation's total —
    group-by + HAVING against a scalar subquery over the same input.

    Scale shape: the nation's supplier keys broadcast into the fact scan; one
    shuffle on l_partkey; the global total is a second partial-agg pass over
    the same filtered scan, broadcast as a 1-row threshold (no driver
    collect). Both sums accumulate in DECIMAL so the HAVING comparison is
    deterministic at any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp_keys = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    v = F.col("l_extendedprice").cast(_P) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    nation_lines = li.join(
        F.broadcast(supp_keys), li.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", v.alias("v"))
    per_part = nation_lines.groupBy("l_partkey").agg(
        F.sum("v").cast("double").alias("part_value")
    )
    total = nation_lines.agg(
        (F.sum("v").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q12_priority_lateness",
    tags=("A4", "F2", "P8"),
    oracle="""
SELECT l.l_linestatus,
       count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 365 DAY
  AND l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l.l_linestatus
""",
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late lines (shipped >1y after order) in a year,
    counted by line status split into high/low order priority — a join with a
    non-equi date-diff predicate plus two-way conditional aggregation
    (priority classes stand in for the missing l_shipmode).

    Scale shape: the year filter pushes to the lineitem parquet scan; the
    join shuffles both sides on orderkey (both large); the lateness predicate
    evaluates as a post-join filter; the final 2-value group-by is all
    map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q20_promo_suppliers",
    tags=("J-semi", "A4"),
    oracle="""
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 50
  )
ORDER BY s.s_name
""",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who moved a large quantity of
    'red' parts in a year — a nested chain of (filtered-dim semi-join) →
    (grouped HAVING) → (semi-join into the supplier dim).

    Scale shape: red part keys broadcast into the year-pruned lineitem scan;
    one shuffle on (suppkey, partkey) for the quantity rollup; the surviving
    supplier keys are tiny and broadcast as a semi-join build into supplier.
    Quantity accumulates in DECIMAL for a deterministic HAVING cut."""
    p_red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    big_movers = (
        li.join(F.broadcast(p_red), li.l_partkey == p_red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_P)).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(big_movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    headline=True,  # bench: the join-heaviest TPC-H shape (self-joins + semi/anti)
    tags=("J-semi", "J-anti", "K2"),
    oracle="""
WITH cand AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate >= o.o_orderdate + INTERVAL 365 DAY
)
SELECT s.s_name, count(*) AS numwait
FROM cand l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM cand l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone were late on a finished
    multi-supplier order — EXISTS (another supplier participated) plus
    NOT EXISTS (another supplier was also late) over the same fact
    (shipdate > orderdate + 1y stands in for the missing
    receiptdate > commitdate lateness).

    Round-13 rewrite (guide §2.3 "aggregate before you shuffle", §2.4):
    both quantified predicates are per-ORDER set properties, so they
    collapse to min/max aggregates instead of self-joins —
    EXISTS(other supplier on the order) ⟺ min(l_suppkey) ≠ max(l_suppkey)
    over the order's lineitems, and NOT EXISTS(other LATE supplier) ⟺
    min = max over the order's late lines (l1 itself is in that set).
    The old form paid a distinct over all (orderkey,suppkey) pairs that
    was BROADCAST (lineitem-scale — a driver/executor OOM at real scale),
    a second distinct + sort-merge ANTI join whose non-equi suppkey≠
    residual does per-key quadratic probe work on hot orders, and a third
    scan of lineitem. This form scans lineitem twice (candidate build +
    the min/max rollup, each all map-side partial agg), runs ONE window
    over the candidate set keyed the same way the following semi-join is
    (exchange reused), and broadcasts only bounded aggregates. Verified
    hash-identical against the unchanged EXISTS/NOT-EXISTS oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    cand = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select("l_orderkey", "l_suppkey", "l_linenumber")
    )
    # Orders with ≥2 distinct suppliers among ALL their lines (the EXISTS
    # side): min≠max is the cheapest exact multi-supplier test — partial
    # min/max map-side, one shuffled row per orderkey, never a distinct.
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("mn_all"), F.max("l_suppkey").alias("mx_all"))
        .filter(F.col("mn_all") != F.col("mx_all"))
        .select("l_orderkey")
    )
    # Late lines whose order has exactly ONE late supplier (the NOT EXISTS
    # side): a min/max window over the candidate set — same l_orderkey
    # partitioning the semi-join below needs, so the exchange is shared.
    w = Window.partitionBy("l_orderkey")
    sole = (
        cand.withColumn("mn_late", F.min("l_suppkey").over(w))
        .withColumn("mx_late", F.max("l_suppkey").over(w))
        .filter(F.col("mn_late") == F.col("mx_late"))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
