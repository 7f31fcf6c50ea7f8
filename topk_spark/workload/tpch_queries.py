"""Engine-generic relational queries over the TPC-H-ish driver tables.

The reference contains no joins (SURVEY.md §2 "Joins / set operations") — but
an engine replacing Pinot's SQL surface must ship them, and the driver's
star-schema testdata exercises them. All float aggregation goes through exact
decimal accumulation, surfaced as double (deterministic at any partitioning —
plain double sums drift run-to-run under 1000-way partial aggregation).

Scale notes per query are inline: broadcast the dimension sides, shuffle only
on high-cardinality keys, aggregate before joining where the join would
inflate rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.ops.topk import topn
from topk_spark.workload import register

# Exact decimal casts used on both sides.
_P = "decimal(12,2)"  # prices
_D = "decimal(4,2)"   # discount / tax fractions


@register(
    "pricing_summary",
    headline=True,
    tags=("A4",),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= (SELECT max(l_shipdate) FROM lineitem) - INTERVAL 90 DAY
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy group-by with 4 exact sums
    and derived averages. One shuffle over a 6-value grouping key; partial
    aggregation does ~all the work map-side.

    Round-14 (guide §5 / ops.money): the decimal sums promoted past
    precision 18 — a non-compact BigDecimal add per row (measured 1.55 s
    noop vs 1.13 s now). Values are quantized with the SAME exact decimal
    casts, then multiplied and summed in int64 (overflow-safe split
    accumulation) and recombined once per group via decimal(38,6) division
    — output bit-identical, pinned in tests/test_r14_optimizations.py."""
    from topk_spark.ops.money import sum_units_exact

    li = load_table(spark, sf_dir, "lineitem")
    cutoff = li.agg(
        (F.max("l_shipdate") - F.expr("INTERVAL 90 DAYS")).alias("cutoff")
    )
    # Exact integer units from the same decimal quantization as before:
    # cents for qty/price; 10^-4 (price x discount) and 10^-6 dollar units
    # for the products. Projected as real columns so each expression is
    # evaluated once per row (not once per split sub-sum).
    qty_c = (F.col("l_quantity").cast(_P) * 100).cast("long")
    price_c = (F.col("l_extendedprice").cast(_P) * 100).cast("long")
    disc_h = (F.col("l_discount").cast(_D) * 100).cast("long")
    tax_h = (F.col("l_tax").cast(_D) * 100).cast("long")
    dp_u = price_c * (F.lit(100) - disc_h)
    ch_u = dp_u * (F.lit(100) + tax_h)
    units = (
        li.crossJoin(F.broadcast(cutoff))
        .filter(F.col("l_shipdate") <= F.col("cutoff"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qty_c"),
            price_c.alias("price_c"),
            dp_u.alias("dp_u"),
            ch_u.alias("ch_u"),
        )
    )
    # qty_c <= 5e3/row: a single long sum is exact to ~1.8e15 rows; the
    # money units get the split accumulator (see ops.money bounds).
    sum_qty = (F.sum("qty_c").cast("decimal(38,6)") / 100).cast("double")
    sum_price = sum_units_exact(F.col("price_c"), 2).cast("double")
    return units.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        sum_units_exact(F.col("dp_u"), 4).cast("double").alias("sum_disc_price"),
        sum_units_exact(F.col("ch_u"), 6).cast("double").alias("sum_charge"),
        (sum_qty / F.count("*").cast("double")).alias("avg_qty"),
        (sum_price / F.count("*").cast("double")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "top_customers",
    headline=True,
    tags=("K2", "K6"),
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
       count(*) AS n_orders,
       CAST(row_number() OVER (
         ORDER BY CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) DESC,
                  c.c_custkey ASC) AS INT) AS rank
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY rank
LIMIT 20
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by lifetime spend across a 3-table star join.

    Scale shape: aggregate orders by custkey FIRST (shrinks the fact ~10×),
    then join customer/nation as broadcasts — the join carries one row per
    customer, never one per order."""
    from topk_spark.ops.money import sum_units_exact

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # Round-14 (guide §5 / ops.money): cents in int64 split sums instead of
    # a decimal(22,2) BigDecimal accumulator — bit-identical (pinned).
    per_cust = o.select(
        "o_custkey", (F.col("o_totalprice").cast(_P) * 100).cast("long").alias("tp_c")
    ).groupBy("o_custkey").agg(
        sum_units_exact(F.col("tp_c"), 2).cast("double").alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    joined = per_cust.join(
        F.broadcast(c), per_cust.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    ranked = topn(
        joined.select("c_custkey", "c_name", "n_name", "total_spend", "n_orders"),
        [F.desc("total_spend"), F.asc("c_custkey")],
        20,
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int")).orderBy("rank")


@register(
    "brand_revenue",
    tags=("A4",),
    oracle="""
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim revenue by brand — the canonical broadcast-join shape: `part`
    is small relative to `lineitem`, so the fact table never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_P) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "customers_without_orders",
    tags=("J-anti",),
    oracle="""
SELECT n.n_name, count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered, counted per nation. The anti
    side only needs distinct o_custkey — Catalyst builds that automatically;
    at scale prefer broadcasting the distinct keys if they fit."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    no_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.join(F.broadcast(n), no_orders.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "nations_with_big_suppliers",
    tags=("J-semi",),
    oracle="""
SELECT n.n_name
FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s
              WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 1000)
""",
)
def nations_with_big_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: nations having at least one supplier above an account
    balance threshold (EXISTS → left_semi)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 1000)
    return n.join(s, n.n_nationkey == s.s_nationkey, "left_semi").select("n_name")


@register(
    "running_revenue",
    tags=("W-cume",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
WHERE o_custkey % 25 = 0
""",
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windowed aggregation (running total per customer over order
    date) — the analytic-window surface beyond ranking."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_P)).over(w).cast("double").alias("running_spend"),
    )
