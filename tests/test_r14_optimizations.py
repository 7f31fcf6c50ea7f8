"""Round-14 optimization pins: every query whose internals changed this
round must stay RESULT-identical to its pre-round-14 formulation, and the
plans must keep the properties the rewrite bought. The DuckDB oracle gate
(driver_compare) covers value-hash equality with the unchanged oracles;
these tests pin equivalence against the OLD Spark formulations directly so
a future edit cannot drift both sides together.

Touched paths:
- topk_revenue_raw_24h: broadcast-joined max(ts) anchor → bounded scalar
  collect + literal cutoff (filter now sits below the JSON projection).
- pricing_summary / q9_profit_by_nation_year: per-row BigDecimal sums →
  exact integer-unit products + overflow-safe split long sums recombined
  via decimal(38,6) division (ops.money).
- fuzzy_dedup.jaccard: |A∪B| derived as |A|+|B|−|A∩B| (exact for the
  distinct-element arrays every caller passes).
- sig_kernels.minhash_band_rows_from_hsh: mapInPandas per-doc loop →
  mapInArrow zero-copy offsets kernel (minima/digests bit-identical).
- minhash verify joins: build side pinned to the bounded candidate-pair
  side (the unhinted plan broadcast the whole signature table).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from topk_spark.io.sources import load_table
from topk_spark.ops.money import sum_units_exact
from topk_spark.ops.topk import global_topk
from topk_spark.workload.events_queries import order_stream, topk_revenue_raw_24h
from topk_spark.workload.tpch2_queries import q9_profit_by_nation_year
from topk_spark.workload.tpch_queries import pricing_summary

_P, _D = "decimal(12,2)", "decimal(4,2)"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _bits_eq(a, b):
    """Row-tuple equality treating NaN == NaN (bit-level double identity)."""
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float):
                if math.isnan(x) != (isinstance(y, float) and math.isnan(y)):
                    return False
                if not math.isnan(x) and x != y:
                    return False
            elif x != y:
                return False
    return True


# ---------------------------------------------------------------------------
# topk_revenue_raw_24h: literal anchor == broadcast-joined anchor
# ---------------------------------------------------------------------------


def _topk_revenue_join_form(spark, sf_dir):
    """The pre-round-14 crossJoin(broadcast(max_ts)) formulation, verbatim."""
    es = order_stream(spark, sf_dir)
    mx = es.agg(F.max("ts").alias("mts"))
    f = es.crossJoin(F.broadcast(mx)).filter(
        F.col("ts") >= F.col("mts") - F.expr("INTERVAL 24 HOURS")
    )
    g = f.groupBy("event_type", "user_id").agg(
        F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        F.sum("quantity").cast("long").alias("total_quantity"),
        F.count("*").alias("order_count"),
    )
    order = [F.desc("revenue_cents"), F.asc("event_type"), F.asc("user_id")]
    return global_topk(g, order, 10, sentinel_col=None).orderBy("rank")


def test_topk_revenue_literal_anchor_matches_join_form(spark, sf_dir):
    new = _rows(topk_revenue_raw_24h(spark, sf_dir))
    old = _rows(_topk_revenue_join_form(spark, sf_dir))
    assert new == old and len(new) > 0


def test_topk_revenue_single_scan_plan(spark, sf_dir):
    """The final plan must contain exactly ONE events scan (the anchor is a
    separate bounded collect, not a second scan inside this plan) and no
    nested-loop join."""
    plan = topk_revenue_raw_24h(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 1
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# pricing_summary / q9: split-unit sums == decimal sums, bit for bit
# ---------------------------------------------------------------------------


def _pricing_decimal_form(spark, sf_dir):
    """The pre-round-14 decimal-sum formulation, verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = li.agg(
        (F.max("l_shipdate") - F.expr("INTERVAL 90 DAYS")).alias("cutoff")
    )
    qty = F.col("l_quantity").cast(_P)
    price = F.col("l_extendedprice").cast(_P)
    disc_price = price * (F.lit(1) - F.col("l_discount").cast(_D))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast(_D))
    return (
        li.crossJoin(F.broadcast(cutoff))
        .filter(F.col("l_shipdate") <= F.col("cutoff"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*").cast("double")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*").cast("double")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def test_pricing_summary_split_units_bit_identical(spark, sf_dir):
    new = _rows(pricing_summary(spark, sf_dir))
    old = _rows(_pricing_decimal_form(spark, sf_dir))
    assert _bits_eq(new, old) and len(new) > 0


def _q9_decimal_form(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice").cast(_P) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
            disc_price.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit").cast("double").alias("sum_profit"))
    )


def test_q9_split_units_bit_identical(spark, sf_dir):
    new = _rows(q9_profit_by_nation_year(spark, sf_dir))
    old = _rows(_q9_decimal_form(spark, sf_dir))
    assert _bits_eq(new, old) and len(new) > 0


def _bloom_decimal_form(spark, sf_dir):
    from topk_spark.ops.bloom import bloom_build, bloom_prefilter

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey")
    li_pruned = bloom_prefilter(li, "l_orderkey", bloom)
    return (
        li_pruned.join(o, li_pruned["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.trunc("o_orderdate", "month").alias("order_month"))
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


def test_bloom_prefilter_join_split_units_bit_identical(spark, sf_dir):
    from topk_spark.workload.joins_queries import bloom_prefilter_join

    new = _rows(bloom_prefilter_join(spark, sf_dir))
    old = _rows(_bloom_decimal_form(spark, sf_dir))
    assert _bits_eq(new, old) and len(new) > 0


def _top_customers_decimal_form(spark, sf_dir):
    from pyspark.sql import Window

    from topk_spark.ops.topk import topn

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_P)).cast("double").alias("total_spend"),
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
    w = Window.orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return ranked.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).orderBy("rank")


def test_top_customers_split_units_bit_identical(spark, sf_dir):
    from topk_spark.workload.tpch_queries import top_customers

    new = _rows(top_customers(spark, sf_dir))
    old = _rows(_top_customers_decimal_form(spark, sf_dir))
    assert _bits_eq(new, old) and len(new) > 0


def test_sum_units_exact_negative_and_bounds(spark):
    """Split accumulation is exact for negative units (arithmetic shift =
    floor division; AND = non-negative remainder) and for values far past
    the naive-double range."""
    rows = [(-1,), (-(10**17),), (10**17,), (3,), ((1 << 20) - 1,), (1 << 20,)]
    df = spark.createDataFrame(rows, "u long")
    got = df.agg(sum_units_exact(F.col("u"), 2).alias("v")).collect()[0][0]
    import decimal

    want = decimal.Decimal(sum(r[0] for r in rows)) / 100
    assert got == want
    try:
        sum_units_exact(F.col("u"), 7)
        raise AssertionError("unit_scale 7 must be rejected")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# jaccard one-intersect identity
# ---------------------------------------------------------------------------


def test_jaccard_one_intersect_matches_union_form(spark):
    from topk_spark.ops.fuzzy_dedup import jaccard

    df = spark.createDataFrame(
        [
            ([1, 2, 3], [2, 3, 4]),
            ([1], [1]),
            ([1, 2], [3, 4]),
            ([5, 6, 7, 8], [5, 6, 7, 8]),
        ],
        "a array<long>, b array<long>",
    )
    both = df.select(
        jaccard(F.col("a"), F.col("b")).alias("j"),
        (
            F.size(F.array_intersect("a", "b")).cast("double")
            / F.size(F.array_union("a", "b")).cast("double")
        ).alias("j_union"),
    ).collect()
    assert all(r.j == r.j_union for r in both)


# ---------------------------------------------------------------------------
# mapInArrow banding == shared batch kernel, and verify-join build sides
# ---------------------------------------------------------------------------


def test_band_rows_arrow_matches_batch_kernel(spark):
    import numpy as np

    from topk_spark.ops.sig_kernels import (
        _perm_constants,
        _u64_to_i64,
        minhash_band_rows_from_hsh,
        sig_band_hashes_batch,
    )

    rows = [
        (1, [5, 9, 12]),
        (2, [7]),
        (3, []),  # empty: must emit nothing
        (4, list(range(100, 160))),
    ]
    hsh = spark.createDataFrame(rows, "id long, hsh array<long>")
    got = sorted(
        tuple(r) for r in minhash_band_rows_from_hsh(hsh, 64, 16).collect()
    )
    A, C = _perm_constants(64)
    arrs = [np.array(h, dtype=np.int64).view(np.uint64) for i, h in rows if h]
    ids = [i for i, h in rows if h]
    _, bh = sig_band_hashes_batch(arrs, A, C, 16, 4)
    want = sorted(
        (i, b, int(_u64_to_i64(bh[k].reshape(-1))[b]))
        for k, i in enumerate(ids)
        for b in range(16)
    )
    assert got == want


def test_minhash_verify_builds_on_pair_side(spark, sf_dir):
    """Both verify joins must build (broadcast) the bounded candidate-pair
    side; the corpus signature table must never be a broadcast build side
    (100 TB OOM hazard)."""
    from topk_spark.workload import load_all

    df = load_all()["minhash_lsh_neardup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    # the two hash joins must both be BuildLeft (pairs side is the left)
    import re

    sides = re.findall(r"BroadcastHashJoin [^\n]*(BuildLeft|BuildRight)", plan)
    assert sides == ["BuildLeft", "BuildLeft"], sides
