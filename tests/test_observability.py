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


def test_sliding_state_carries_overlap_factor(spark, tmp_path):
    """Measured engine fact behind the sliding-window drains: window
    overlap is a STATE multiplier, not just a shuffle-row multiplier. The
    5-minute/1-minute hopping aggregation holds duration/slide ≈ 5× the
    state rows of the tumbling 5-minute aggregation over the same input
    (124 open hop windows vs 24 tumbling over a 2 h span — ratio ~5.2).
    At 100 TB, duration/slide is the knob trading read granularity
    against state-store size; this pins the actual cost so the trade is
    made on a number, not a hunch.

    The expected window counts are DERIVED from the fixture below (not
    hard-coded) and the tolerance is wide (±~30% around the derived
    ratio): `numRowsTotal` is an engine-internal accounting of
    StreamingQueryProgress.stateOperators, and whether already-closed
    windows are still counted in the final progress event may shift
    across Spark versions. A failure here most likely means
    metric-accounting drift, not a state-semantics regression — check
    the derived vs measured counts in the assertion message before
    treating it as one."""
    rows = [{"ms": T0 + i * 30_000, "v": 1} for i in range(240)]
    # fixture-derived window counts: distinct tumbling buckets, and
    # distinct hop-window starts (each row covers 5 slide-aligned starts)
    exp_tumbling = len({r["ms"] // 300_000 for r in rows})
    exp_sliding = len(
        {r["ms"] // 60_000 - k for r in rows for k in range(5)}
    )
    exp_ratio = exp_sliding / exp_tumbling

    def state_rows(slide: str | None) -> int:
        tag = (slide or "none").replace(" ", "")
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src)
        p = os.path.join(src, "f0.json")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        stream = (
            spark.readStream.schema("ms long, v long")
            .json(src)
            .withColumn("ts", F.timestamp_millis("ms"))
        )
        win = (
            F.window("ts", "5 minutes", slide)
            if slide
            else F.window("ts", "5 minutes")
        )
        q = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy(win.alias("w"))
            .agg(F.sum("v").alias("s"))
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return max(
            sum(
                s.get("numRowsTotal", 0)
                for s in json.loads(pr.json).get("stateOperators") or []
            )
            for pr in q.recentProgress
        )

    tumbling = state_rows(None)
    sliding = state_rows("1 minute")
    assert tumbling > 0
    ratio = sliding / tumbling
    assert 0.7 * exp_ratio <= ratio <= 1.3 * exp_ratio, (
        f"overlap state factor drifted: tumbling {tumbling} rows "
        f"(fixture-derived {exp_tumbling} windows), sliding {sliding} rows "
        f"(derived {exp_sliding}), ratio {ratio:.2f} vs derived "
        f"{exp_ratio:.2f} — if the window counts still match the fixture, "
        f"this is progress-metric accounting drift, not a state regression"
    )
