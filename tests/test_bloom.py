"""Bloom-filter join pre-filtering (ops/bloom.py): no false negatives,
real selectivity, map-side application."""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.io.sources import load_table
from topk_spark.ops.bloom import bloom_build, bloom_prefilter


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every lineitem whose key IS in the build set must survive the
    prefilter — bloom filters may over-keep, never drop a match."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey")
    kept = bloom_prefilter(li, "l_orderkey", bloom)
    true_matches = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "semi"
    )
    assert kept.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "semi"
    ).count() == true_matches.count()


def test_bloom_prunes_most_nonmatching_rows(spark, sf_dir):
    """With 2^16 bits over ~3k urgent keys the false-positive rate is tiny:
    the prefiltered row count must be far below the full table and close
    to the true match count."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey")
    total = li.count()
    kept = bloom_prefilter(li, "l_orderkey", bloom).count()
    true_matches = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "semi"
    ).count()
    assert true_matches <= kept, "bloom dropped true matches"
    assert kept < 0.5 * total, f"bloom barely pruned: {kept}/{total}"
    assert kept <= true_matches * 1.5 + 1000, (
        f"false-positive rate too high: kept={kept} true={true_matches}"
    )


def test_bloom_prefilter_is_map_side(spark, sf_dir):
    """The probe-side membership test must not shuffle the probe table:
    its plan subtree is scan → 1-row broadcast join → filter (the bloom
    BUILD aggregates, but that is over keys, not the probe)."""
    o = load_table(spark, sf_dir, "orders").limit(100)
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey")
    kept = bloom_prefilter(li, "l_orderkey", bloom)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
