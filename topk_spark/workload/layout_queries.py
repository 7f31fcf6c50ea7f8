"""Layout-win queries: prove the read-time effect of the storage layouts in
ops/layout.py with hash-checked results (and plan shapes pinned in
tests/test_layout.py).

Both queries materialize their laid-out copy ONCE per (tmp, sf) into
/tmp/topk_spark_layout/<sf>/ — the write is the setup cost of the layout,
the registered query measures the pruned READ path, same as a production
table that is written once per day and read thousands of times.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from topk_spark.io.sources import load_table
from topk_spark.ops.layout import (
    compact_range_sorted,
    materialize_once,
    write_partitioned_daily,
)
from topk_spark.workload import register

# One pruned week, inside every SF's 2024-01-01..2024-01-30 span.
_WEEK_LO, _WEEK_HI = "2024-01-08", "2024-01-14"
# Probe range for the sorted-compaction scan (user_id domain is 0..~2k).
_UID_LO, _UID_HI = 100, 199


def _layout_root(sf_dir: str, leaf: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), "topk_spark_layout", sf, leaf)


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events, hive-partitioned by event_date (materialized once)."""
    path = materialize_once(
        _layout_root(sf_dir, "events_daily"),
        lambda p: write_partitioned_daily(load_table(spark, sf_dir, "events"), p),
    )
    return spark.read.parquet(path)


def sorted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events, compacted into 8 files range-sorted by user_id."""
    path = materialize_once(
        _layout_root(sf_dir, "events_by_user"),
        lambda p: compact_range_sorted(
            load_table(spark, sf_dir, "events"), ["user_id", "ts"], 8
        ).write.mode("overwrite").parquet(p),
    )
    return spark.read.parquet(path)


@register(
    "partition_pruned_week",
    oracle=f"""
SELECT CAST(ts AS DATE) AS event_date,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_value_cents
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_WEEK_LO}' AND DATE '{_WEEK_HI}'
GROUP BY 1
""",
    tags=("layout", "pruning"),
)
def partition_pruned_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity for one week, read from the date-partitioned layout.
    The week predicate lands in the scan's PartitionFilters (pinned in
    tests/test_layout.py): Spark lists only the 7 matching day directories —
    at 100 TB / 30 days, a 23/30 reduction in bytes touched before a single
    row is read. Oracle recomputes from the unpartitioned source, proving
    the layout round-trip is lossless."""
    p = partitioned_events(spark, sf_dir)
    return (
        p.filter(F.col("event_date").between(F.lit(_WEEK_LO), F.lit(_WEEK_HI)))
        .groupBy("event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("sum_value_cents"),
        )
    )


@register(
    "sorted_scan_user_range",
    oracle=f"""
SELECT user_id,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_value_cents
FROM events
WHERE user_id BETWEEN {_UID_LO} AND {_UID_HI}
GROUP BY user_id
""",
    tags=("layout", "pruning"),
)
def sorted_scan_user_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals for a user_id range, read from the range-sorted
    compacted layout. The predicate reaches parquet as PushedFilters over a
    file set whose row groups are disjoint in user_id → min/max stats skip
    all but ~1/8th of the data (sorted-index analog; pinned in
    tests/test_layout.py). Oracle recomputes from the unsorted source."""
    s = sorted_events(spark, sf_dir)
    return (
        s.filter(F.col("user_id").between(_UID_LO, _UID_HI))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("sum_value_cents"),
        )
    )
