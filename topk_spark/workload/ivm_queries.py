"""Incremental view maintenance (IVM) — round-2d: maintain the Q1-style
pricing cube under a batch of inserts and deletes WITHOUT recomputing from
the full fact table, and prove the maintained result equals the full
recompute (the oracle applies the delta to the data and aggregates from
scratch; the Spark side touches only the base aggregate and the delta).

This is the batch form of what `retraction_rollup` does for streams —
here with DELETES, the case
that forces signed arithmetic on every distributive measure:

    maintained = agg(base) ⊕ agg(inserts) ⊖ agg(deletes)

Delta construction (deterministic, from the data itself): orders with
orderkey ≡ 3 (mod 100) are deleted; lineitems of orders ≡ 7 (mod 100) are
re-inserted with quantity+1 (a multiset insert). All measures distributive
(SUM/COUNT in BIGINT/DECIMAL), so ⊕/⊖ are exact; derived averages are
single divisions of agreed sums, computed AFTER the merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_P = "decimal(12,2)"
_D = "decimal(4,2)"

_IVM_ORACLE = """
WITH modified AS (
  SELECT l_returnflag, l_linestatus, l_quantity,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
         CAST(l_discount AS DECIMAL(4,2)) AS disc
  FROM lineitem WHERE l_orderkey % 100 <> 3
  UNION ALL
  SELECT l_returnflag, l_linestatus, l_quantity + 1,
         CAST(l_extendedprice AS DECIMAL(12,2)),
         CAST(l_discount AS DECIMAL(4,2))
  FROM lineitem WHERE l_orderkey % 100 = 7
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(SUM(price) AS DOUBLE) AS sum_base,
       CAST(SUM(price * (1 - disc)) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM modified
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _measures(df: DataFrame) -> DataFrame:
    price = F.col("l_extendedprice").cast(_P)
    disc = F.col("l_discount").cast(_D)
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(price).alias("sum_base"),
        F.sum(price * (1 - disc)).alias("sum_disc_price"),
        F.count("*").alias("count_order"),
    )


@register("incremental_q1_maintenance", tags=("ivm", "A5"), oracle=_IVM_ORACLE)
def incremental_q1_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the pricing cube under deletes (orderkey ≡ 3 mod 100) and
    inserts (orderkey ≡ 7 mod 100, quantity+1) by signed merge of three
    aggregates — base ⊕ inserts ⊖ deletes — never rescanning the modified
    fact. The oracle recomputes from scratch on the modified multiset, so
    the hash check IS the IVM-correctness proof.

    100 TB posture: the base aggregate is the existing materialized cube
    (here recomputed once for self-containment); maintenance cost scales
    with |delta|, not |fact| — the deletes/inserts aggregate over ~2% of
    rows, and the merge is a 6-row outer join."""
    li = load_table(spark, sf_dir, "lineitem")
    base = _measures(li)
    deletes = _measures(li.filter(F.col("l_orderkey") % 100 == 3))
    inserts = _measures(
        li.filter(F.col("l_orderkey") % 100 == 7).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        )
    )
    keys = ["l_returnflag", "l_linestatus"]

    def tag(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *keys,
            (F.lit(sign) * F.col("sum_qty")).alias("sum_qty"),
            (F.lit(sign) * F.col("sum_base")).alias("sum_base"),
            (F.lit(sign) * F.col("sum_disc_price")).alias("sum_disc_price"),
            (F.lit(sign) * F.col("count_order")).alias("count_order"),
        )

    merged = (
        tag(base, 1)
        .unionByName(tag(deletes, -1))
        .unionByName(tag(inserts, 1))
        .groupBy(*keys)
        .agg(
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("sum_base").alias("sum_base"),
            F.sum("sum_disc_price").alias("sum_disc_price"),
            F.sum("count_order").alias("count_order"),
        )
        .filter(F.col("count_order") > 0)
    )
    return merged.select(
        *keys,
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("sum_base").cast("double").alias("sum_base"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("count_order").cast("long").alias("count_order"),
    ).orderBy(*keys)
