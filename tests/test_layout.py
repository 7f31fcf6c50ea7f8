"""Layout operators (ops/layout.py): partition pruning, sorted-compaction
row-group skipping, and shuffle-free bucketed joins — plan shapes AND
results checked.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from topk_spark.io.sources import load_table
from topk_spark.ops.layout import write_bucketed
from topk_spark.workload import load_all
from topk_spark.workload.layout_queries import (
    _WEEK_HI,
    _WEEK_LO,
    partitioned_events,
    sorted_events,
)

REGISTRY = load_all()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_in_plan(spark, sf_dir):
    """The week predicate must appear as PartitionFilters on the scan —
    pruning happens at file-listing time, not per row."""
    df = REGISTRY["partition_pruned_week"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf, f"date predicate not in PartitionFilters: [{pf}]"


def test_partition_pruning_reads_only_week(spark, sf_dir):
    """Row-level proof of pruning: the partitioned scan filtered to the week
    returns exactly the unpartitioned source rows in that range."""
    p = partitioned_events(spark, sf_dir)
    pruned = p.filter(F.col("event_date").between(_WEEK_LO, _WEEK_HI)).count()
    src = (
        load_table(spark, sf_dir, "events")
        .filter(F.to_date("ts").between(_WEEK_LO, _WEEK_HI))
        .count()
    )
    assert pruned == src > 0


def test_partitioned_layout_lossless(spark, sf_dir):
    """Partitioning must not drop or duplicate rows."""
    p = partitioned_events(spark, sf_dir)
    src = load_table(spark, sf_dir, "events")
    assert p.count() == src.count()


def test_sorted_scan_pushes_user_filter(spark, sf_dir):
    df = REGISTRY["sorted_scan_user_range"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "user_id" in pushed, f"user_id range not pushed: [{pushed}]"


def test_sorted_compaction_file_count_and_order(spark, sf_dir, tmp_path):
    """Compaction controls the output file count and files are disjoint in
    the sort key (tight min/max stats → row-group skipping)."""
    s = sorted_events(spark, sf_dir)
    files = (
        s.select(F.input_file_name().alias("f"), "user_id")
        .groupBy("f")
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    assert 1 <= len(files) <= 8
    spans = sorted((r["lo"], r["hi"]) for r in files)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"file ranges overlap: {spans}"


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key: the join plan must contain NO
    Exchange — co-location is proven from catalog metadata. This is the
    100 TB fact⋈dim nightly join with zero shuffle on either side."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    users = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("cohort", (F.col("user_id") % 10).cast("int"))
    )
    write_bucketed(events, "ev_b", ["user_id"], 8, str(tmp_path / "ev_b"))
    write_bucketed(users, "us_b", ["user_id"], 8, str(tmp_path / "us_b"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("ev_b").join(spark.table("us_b"), "user_id")
            plan = _executed_plan(j)
            assert "Exchange" not in plan, (
                f"bucketed join still shuffles:\n{plan}"
            )
            # sanity: result matches the plain (shuffling) join
            agg = j.groupBy("cohort").agg(F.count("*").alias("n_events"))
            expected = (
                events.join(users, "user_id")
                .groupBy("cohort")
                .agg(F.count("*").alias("n_events"))
            )
            got = {(r["cohort"], r["n_events"]) for r in agg.collect()}
            want = {(r["cohort"], r["n_events"]) for r in expected.collect()}
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS us_b")


def test_zorder_scan_pushes_both_filters(spark, sf_dir):
    """The rectangle query's predicates on BOTH clustered columns must reach
    the parquet scan as PushedFilters — that's what the z-order layout makes
    selective."""
    df = REGISTRY["zorder_pruned_scan"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "user_id" in pushed and "value_cents" in pushed, (
        f"both range predicates should push: [{pushed}]"
    )


def test_zorder_files_are_2d_boxes(spark, sf_dir):
    """Each z-ordered file must cover a rectangle strictly smaller than the
    full domain in BOTH dimensions (the multi-column clustering property a
    single-column sort cannot give): the average per-file span in each
    dimension is well under the whole domain."""
    from topk_spark.workload.layout_queries import zordered_events

    z = zordered_events(spark, sf_dir)
    files = (
        z.select(F.input_file_name().alias("f"), "user_id", "value_cents")
        .groupBy("f")
        .agg(
            F.min("user_id").alias("ulo"),
            F.max("user_id").alias("uhi"),
            F.min("value_cents").alias("vlo"),
            F.max("value_cents").alias("vhi"),
        )
        .collect()
    )
    assert len(files) > 4
    u_dom = max(r["uhi"] for r in files) - min(r["ulo"] for r in files)
    v_dom = max(r["vhi"] for r in files) - min(r["vlo"] for r in files)
    u_span = sum(r["uhi"] - r["ulo"] for r in files) / len(files)
    v_span = sum(r["vhi"] - r["vlo"] for r in files) / len(files)
    assert u_span < 0.7 * u_dom, f"user_id not clustered: {u_span} vs {u_dom}"
    assert v_span < 0.7 * v_dom, f"value_cents not clustered: {v_span} vs {v_dom}"


def test_zorder_lossless(spark, sf_dir):
    from topk_spark.workload.layout_queries import zordered_events

    assert (
        zordered_events(spark, sf_dir).count()
        == load_table(spark, sf_dir, "events").count()
    )
