"""API-surface coverage: dropDuplicatesWithinWatermark (the built-in
streaming twin of ops/dedup + streaming/stateful_dedup — D1/D2 family)
and df.observe() inline metrics (T10 adjacency: per-action data-quality
counters without a second pass).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("value_cents", LongType()),
        StructField("event_ms", LongType()),
    ]
)

T0 = 1_704_067_200_000


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """The built-in bounded-state dedup: duplicates arriving within the
    watermark horizon collapse to one row; state for expired keys is
    evictable (semantics mirror streaming/stateful_dedup, which adds
    explicit TTL timers on top)."""
    src = str(tmp_path / "ddww_src")
    os.makedirs(src)
    _write_jsonl(
        os.path.join(src, "b0.jsonl"),
        [
            {"event_id": "E1", "value_cents": 100, "event_ms": T0},
            {"event_id": "E1", "value_cents": 100, "event_ms": T0 + 2_000},  # dup
            {"event_id": "E2", "value_cents": 200, "event_ms": T0 + 1_000},
            {"event_id": "E1", "value_cents": 100, "event_ms": T0 + 3_000},  # dup
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(src)
        .withColumn("ts", F.timestamp_millis("event_ms"))
        .withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ddww_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("ddww_out").groupBy("event_id").count().collect()
    assert {r["event_id"]: r["count"] for r in out} == {"E1": 1, "E2": 1}


def test_observe_inline_metrics(spark):
    """df.observe(): null-rate and row-count counters computed inside the
    SAME action as the query (no second scan) and retrieved from the
    observation — the batch analog of the streaming metrics listener."""
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 3), (None, 4)],
        "k string, v int",
    )
    obs = Observation("dq")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("null_v"),
        F.sum(F.col("k").isNull().cast("long")).alias("null_k"),
    )
    result = observed.filter(F.col("v").isNotNull()).count()
    assert result == 3
    metrics = obs.get
    assert metrics["rows"] == 4
    assert metrics["null_v"] == 1
    assert metrics["null_k"] == 1
