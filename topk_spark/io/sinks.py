"""Sinks + physical layout (SURVEY.md §4.1): Parquet write layout replaces
Pinot's index configuration, retention replaces segment TTL.

Pinot physical design → Spark write-time equivalents:
- sorted columns (restaurant_id, timestamp)    → repartition(key) +
  sortWithinPartitions → parquet row-group min/max stats prune scans;
- inverted/range indexes                       → Catalyst pushdown + partition
  pruning (partition by date);
- bloom filters on event_id/order_id           → parquet bloom filter write
  options (orders_raw_upsert_table.json:35-38);
- retention 7d raw / 30d rollup (S10)          → partition drop job.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from datetime import date, timedelta
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_olap_table(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("event_date",),
    sort_cols: Sequence[str] = (),
    bucket_col: str | None = None,
    bloom_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write a query-optimized columnar table.

    `bucket_col` controls file-level clustering (repartition before write) so
    point lookups touch few files; `sort_cols` order rows inside files so
    row-group stats give Pinot-sorted-column-style pruning; `bloom_cols` get
    parquet bloom filters for existence checks (event_id/order_id lookups).
    """
    out = df
    if bucket_col:
        out = out.repartition(F.col(bucket_col))
    if sort_cols:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_cols])
    writer = out.write.mode(mode)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Register `df` as a hash-bucketed (and optionally bucket-sorted)
    catalog table — the Spark analog of Pinot's partition-aware serving
    layout (orders_raw_upsert_table.json:64-66).

    Two tables bucketed the same way on the join key co-locate: Catalyst
    plans the join with ZERO Exchange on either side (proof:
    tests/test_plans.py::test_bucketed_join_needs_no_shuffle). At 100 TB this
    is the difference between an all-to-all shuffle of the fact table per
    join and none — bucket once at ingest, join shuffle-free forever after.
    """
    writer = df.write.mode(mode).option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def drop_expired_partitions(
    table_path: str,
    retention_days: int,
    today: date | None = None,
    partition_col: str = "event_date",
) -> list[str]:
    """Retention job (S10): drop date partitions older than the horizon —
    the Spark analog of Pinot's 7d/30d segment retention. Partition drop is
    a metadata/filesystem operation; no data rewrite."""
    today = today or date.today()
    cutoff = today - timedelta(days=retention_days)
    dropped: list[str] = []
    root = Path(table_path)
    if not root.exists():
        return dropped
    for child in sorted(root.glob(f"{partition_col}=*")):
        val = child.name.split("=", 1)[1]
        try:
            part_date = date.fromisoformat(val)
        except ValueError:
            continue
        if part_date < cutoff:
            shutil.rmtree(child)
            dropped.append(child.name)
    return dropped


def merge_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    keys: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> None:
    """Idempotent upsert sink for foreachBatch (D4 — Pinot dedupConfig
    analog): new rows win over existing rows with the same key, making an
    at-least-once stream effectively exactly-once in storage.

    Parquet has no MERGE; we emulate with read-union-dedup-overwrite, which
    is correct but rewrites the table — fine for rollup-sized tables. For
    raw-scale tables use the append sink + first-seen dedup at read, or a
    table format with real MERGE (Delta/Iceberg) in production.
    """
    target = Path(target_path)
    try:
        existing = spark.read.parquet(target_path)
    except Exception:
        existing = None
    if existing is None:
        out = batch_df
    else:
        # deterministic upsert: batch rows (src=0) win over existing (src=1)
        from topk_spark.ops.dedup import dedup_first_seen

        merged = batch_df.withColumn("__src", F.lit(0)).unionByName(
            existing.withColumn("__src", F.lit(1))
        )
        out = dedup_first_seen(merged, keys, [F.col("__src").asc()]).drop("__src")
    # Write to a scratch path, then atomically swap — never overwrite a path
    # while reading it. (Local-FS rename; production would use Delta MERGE.)
    tmp = target.with_name(target.name + "__staging")
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(tmp))
    if target.exists():
        shutil.rmtree(target)
    tmp.rename(target)


def kafka_sink_frame(
    df: DataFrame, key_col: str, topic: str | None = None
) -> DataFrame:
    """Build the (key, value[, topic]) frame a Kafka sink consumes (S3-S5):
    key = the routing column as UTF-8 bytes (event_id for raw, menu_item_id
    for top-k results — TopKStreamingJob.kt:277-293, KafkaConsumerTopKJob.kt:
    293-303), value = the full row as JSON. Attach
    `.writeStream.format("kafka")` (or batch `.write`) to publish; the frame
    itself is broker-independent and unit-testable.

    ignoreNullFields=false: the reference serializes with Jackson, which
    writes null fields explicitly ({"customer_id":null,...}) — Spark's
    to_json default OMITS them, which would change the wire bytes for any
    record with a null optional field (customer_id/category_id are nullable
    in Models.kt:12,15)."""
    cols = [
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(*df.columns), {"ignoreNullFields": "false"}
        ).alias("value"),
    ]
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    return df.select(*cols)
