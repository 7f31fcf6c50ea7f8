"""Data-profiling and data-quality assertion queries — the monitoring
surface a table-serving engine exposes (Pinot users run exactly these as
ad-hoc SQL; training pipelines run them as gates before every ingest).

`table_profile` is one pass over the table: a single multi-metric aggregate
followed by a map-only unpivot into (column, metric) rows — never one scan
per column. `dq_assertions` unions independent rule counts; each rule is a
scan-local aggregate or a broadcast anti-join, so rules add scans, not
shuffles, and all rules over the same table share the cached scan at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register


@register(
    "table_profile",
    tags=("PROFILE",),
    oracle="""
WITH a AS (
  SELECT count(*) AS n_rows,
         count(o_orderkey) AS nn_orderkey, count(DISTINCT o_orderkey) AS nd_orderkey,
         CAST(min(o_orderkey) AS VARCHAR) AS mn_orderkey, CAST(max(o_orderkey) AS VARCHAR) AS mx_orderkey,
         count(o_custkey) AS nn_custkey, count(DISTINCT o_custkey) AS nd_custkey,
         CAST(min(o_custkey) AS VARCHAR) AS mn_custkey, CAST(max(o_custkey) AS VARCHAR) AS mx_custkey,
         count(o_orderstatus) AS nn_status, count(DISTINCT o_orderstatus) AS nd_status,
         CAST(min(o_orderstatus) AS VARCHAR) AS mn_status, CAST(max(o_orderstatus) AS VARCHAR) AS mx_status,
         count(o_totalprice) AS nn_price, count(DISTINCT o_totalprice) AS nd_price,
         CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
         CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
         count(o_orderdate) AS nn_date, count(DISTINCT o_orderdate) AS nd_date,
         CAST(min(o_orderdate) AS VARCHAR) AS mn_date, CAST(max(o_orderdate) AS VARCHAR) AS mx_date
  FROM orders
)
SELECT col_name, n_rows, n_nonnull, n_distinct, min_value, max_value
FROM (
  SELECT 'o_orderkey' AS col_name, n_rows, nn_orderkey AS n_nonnull, nd_orderkey AS n_distinct, mn_orderkey AS min_value, mx_orderkey AS max_value FROM a
  UNION ALL
  SELECT 'o_custkey', n_rows, nn_custkey, nd_custkey, mn_custkey, mx_custkey FROM a
  UNION ALL
  SELECT 'o_orderstatus', n_rows, nn_status, nd_status, mn_status, mx_status FROM a
  UNION ALL
  SELECT 'o_totalprice', n_rows, nn_price, nd_price, mn_price, mx_price FROM a
  UNION ALL
  SELECT 'o_orderdate', n_rows, nn_date, nd_date, mn_date, mx_date FROM a
)
""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the orders table — row count, non-null count, exact
    distinct count, min/max (stringified) per column — computed in ONE
    multi-aggregate pass over the scan and reshaped to a row per column
    map-side. The per-column output frame is what schema-drift monitors and
    ingest gates diff run-over-run."""
    o = load_table(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(18,2)").cast("string")  # noqa: E731
    a = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_orderkey"),
        F.count_distinct("o_orderkey").alias("nd_orderkey"),
        F.min("o_orderkey").cast("string").alias("mn_orderkey"),
        F.max("o_orderkey").cast("string").alias("mx_orderkey"),
        F.count("o_custkey").alias("nn_custkey"),
        F.count_distinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("mn_custkey"),
        F.max("o_custkey").cast("string").alias("mx_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").cast("string").alias("mn_status"),
        F.max("o_orderstatus").cast("string").alias("mx_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.count_distinct("o_totalprice").alias("nd_price"),
        F.min(F.col("o_totalprice")).cast("decimal(18,2)").cast("string").alias("mn_price"),
        F.max(F.col("o_totalprice")).cast("decimal(18,2)").cast("string").alias("mx_price"),
        F.count("o_orderdate").alias("nn_date"),
        F.count_distinct("o_orderdate").alias("nd_date"),
        F.min("o_orderdate").cast("string").alias("mn_date"),
        F.max("o_orderdate").cast("string").alias("mx_date"),
    )
    rows = [
        ("o_orderkey", "nn_orderkey", "nd_orderkey", "mn_orderkey", "mx_orderkey"),
        ("o_custkey", "nn_custkey", "nd_custkey", "mn_custkey", "mx_custkey"),
        ("o_orderstatus", "nn_status", "nd_status", "mn_status", "mx_status"),
        ("o_totalprice", "nn_price", "nd_price", "mn_price", "mx_price"),
        ("o_orderdate", "nn_date", "nd_date", "mn_date", "mx_date"),
    ]
    parts = [
        a.select(
            F.lit(col).alias("col_name"),
            F.col("n_rows"),
            F.col(nn).alias("n_nonnull"),
            F.col(nd).alias("n_distinct"),
            F.col(mn).alias("min_value"),
            F.col(mx).alias("max_value"),
        )
        for col, nn, nd, mn, mx in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "dq_assertions",
    tags=("PROFILE", "DQ"),
    oracle="""
SELECT 'orders_nonpositive_price' AS rule,
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_duplicate_pk',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(count(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_discount_out_of_band',
       CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.08) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_bulk_quantity',
       CAST(count(*) FILTER (WHERE l_quantity > 45) AS BIGINT)
FROM lineitem
""",
)
def dq_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: one row per assertion with its violation count —
    uniqueness of the orders PK, referential integrity of lineitem→orders
    (left-anti join; the orders key set broadcasts), and range/band rules as
    conditional aggregates. Hard rules legitimately count 0 on this data;
    the band rules are thresholded to be non-trivially violated so the gate
    exercises both outcomes."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    r1 = o.agg(
        F.lit("orders_nonpositive_price").alias("rule"),
        F.count_if(F.col("o_totalprice") <= 0).cast("long").alias("n_violations"),
    ).select("rule", "n_violations")
    r2 = o.agg(
        F.lit("orders_duplicate_pk").alias("rule"),
        (F.count("*") - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
    ).select("rule", "n_violations")
    r3 = (
        li.join(
            F.broadcast(o.select("o_orderkey")),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(F.lit("lineitem_orphan_orderkey").alias("rule"), "n_violations")
    )
    r4 = li.agg(
        F.lit("lineitem_discount_out_of_band").alias("rule"),
        F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 0.08))
        .cast("long")
        .alias("n_violations"),
    ).select("rule", "n_violations")
    r5 = li.agg(
        F.lit("lineitem_bulk_quantity").alias("rule"),
        F.count_if(F.col("l_quantity") > 45).cast("long").alias("n_violations"),
    ).select("rule", "n_violations")
    return r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5)


# ---------------------------------------------------------------------------
# Grouped least-squares trend via exact integer moments
# ---------------------------------------------------------------------------
