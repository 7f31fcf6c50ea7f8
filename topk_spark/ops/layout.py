"""Data-layout operators: the storage-side half of the 100 TB story
(SURVEY.md §2 S7/S10 extensions; Pinot analogs: time-partitioned segments
`orders_raw_upsert_table.json:11-12`, sorted + range index columns
`orders_raw_upsert_table.json:19-38`, bucketed routing).

Three layouts, each making a class of 100 TB queries cheap at READ time:

- **Daily hive partitioning** (`write_partitioned_daily`): one directory per
  event_date → time-range predicates become PARTITION PRUNING (the scan
  never lists, let alone reads, out-of-range files). The Pinot analog is
  time-column segment pruning. At 100 TB with 30 days retention, a 1-day
  query reads 1/30th of the files by construction.
- **Range-sorted compaction** (`compact_range_sorted`): repartitionByRange +
  sortWithinPartitions on the probe column → parquet row-group min/max
  stats become effective, so point/range predicates skip whole row groups
  (sorted-index analog). Also the small-file compactor: N output files is a
  parameter, not a side effect of upstream parallelism.
- **Bucketed tables** (`write_bucketed`): bucketBy(k) on the join key →
  co-located, shuffle-FREE joins between tables bucketed the same way
  (partition-routing analog). At 100 TB the nightly fact⋈dim join pays
  zero Exchange on either side.

Everything here is plain `DataFrameWriter` surface — no custom file
management — so it composes with any downstream reader including DuckDB.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned_daily(
    df: DataFrame, path: str, ts_col: str = "ts", partition_col: str = "event_date"
) -> None:
    """Hive-partition `df` by the calendar day of `ts_col`.

    `repartition(partition_col)` first: one shuffle so each day is written
    by one task → one file per day instead of (tasks × days) small files
    (the small-files problem is the classic partitionBy failure mode)."""
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .repartition(F.col(partition_col))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def compact_range_sorted(
    df: DataFrame, sort_cols: list[str], n_files: int
) -> DataFrame:
    """Range-partition into exactly `n_files` outputs, each internally sorted
    by `sort_cols` → parquet min/max stats per row group are tight and
    disjoint, so a range predicate on sort_cols[0] skips files AND row
    groups. Returns the re-laid-out frame ready for `.write`."""
    cols = [F.col(c) for c in sort_cols]
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ bucket-sorted) table: joins/aggregations on
    `bucket_cols` between same-bucketed tables need NO Exchange — Spark
    proves co-partitioning from the catalog metadata."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols).sortBy(
        *bucket_cols
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def materialize_once(path: str, build) -> str:
    """Write-once cache guard for layout side-outputs: `build(path)` runs
    only if `path` lacks a parquet _SUCCESS marker. Queries that demonstrate
    read-time layout wins call this so repeated runs (driver, bench, tests)
    reuse the laid-out copy instead of rewriting it."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build(path)
    return path
