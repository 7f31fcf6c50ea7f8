"""applyInPandasWithState first-seen dedup (streaming/stateful_dedup):
cross-batch duplicate suppression with per-key boolean state and
processing-time TTL re-admission, mirroring the reference's keyed dedup
with StateTtlConfig (TopKStreamingJob.kt:87-119)."""

from __future__ import annotations

import json
import os
import time

from topk_spark.schemas import ORDER_EVENT
from topk_spark.streaming.stateful_dedup import dedup_stateful

BASE = 1_704_067_200_000


def _evt(i: int, event_id: str, qty: int = 1) -> dict:
    return {
        "event_id": event_id,
        "order_id": f"ORD{i:08x}",
        "customer_id": f"CUST{i}",
        "restaurant_id": "R1",
        "menu_item_id": "A",
        "category_id": "CAT001",
        "menu_item_name": "Dish A",
        "quantity": qty,
        "price_in_cents": 100,
        "timestamp": BASE + i * 1000,
    }


def _write_batch(src: str, i: int, rows: list[dict]) -> None:
    p = os.path.join(src, f"batch_{i:03d}.json")
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (1000 + i, 1000 + i))


def _drain(spark, tmp_path, src: str, ttl_ms=None):
    stream = (
        spark.readStream.schema(ORDER_EVENT)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = os.path.join(str(tmp_path), "out")
    q = (
        dedup_stateful(stream, ttl_ms=ttl_ms)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(ORDER_EVENT).parquet(out)


def test_first_seen_survives_across_batches(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    # E1 duplicated within batch 1 AND again in batch 2; E2 only in batch 2.
    _write_batch(src, 0, [_evt(0, "E1", qty=7), _evt(1, "E1", qty=2)])
    _write_batch(src, 1, [_evt(2, "E1", qty=9), _evt(3, "E2", qty=4)])
    got = _drain(spark, tmp_path, src).collect()

    by_key = {r.event_id: r for r in got}
    assert sorted(by_key) == ["E1", "E2"]
    assert len(got) == 2
    # The FIRST occurrence won (qty 7, the earliest timestamp), not a later one.
    assert by_key["E1"].quantity == 7
    assert by_key["E1"].timestamp == BASE
    assert by_key["E2"].quantity == 4


def test_within_batch_winner_is_earliest_timestamp(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    # Same key, out-of-order within one batch: earliest ts must win.
    _write_batch(src, 0, [_evt(5, "E9", qty=3), _evt(1, "E9", qty=8)])
    got = _drain(spark, tmp_path, src).collect()
    assert len(got) == 1
    assert got[0].quantity == 8 and got[0].timestamp == BASE + 1000


def test_ttl_expiry_readmits_duplicates(spark, tmp_path):
    """The reference's bounded-state trade-off: a duplicate arriving after
    the state TTL is treated as new (TopKStreamingJob.kt:96-103,
    NeverReturnExpired). Two availableNow drains over one checkpoint: the
    first sees E1 and then cleans up its expired state; after the TTL, the
    second re-admits the duplicate."""
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    _write_batch(src, 0, [_evt(0, "E1", qty=3)])
    first = _drain(spark, tmp_path, src, ttl_ms=1500).collect()
    assert [(r.event_id, r.quantity) for r in first] == [("E1", 3)]

    time.sleep(2.0)  # let the processing-time TTL pass
    _write_batch(src, 1, [_evt(1, "E1", qty=9)])
    got = _drain(spark, tmp_path, src, ttl_ms=1500).collect()
    assert sorted((r.event_id, r.quantity) for r in got) == [("E1", 3), ("E1", 9)]


def test_timer_eviction_under_continuous_trigger(spark, tmp_path):
    """The opt-in eviction path: with register_eviction_timers=True and a
    processing-time trigger, the timer fires in a scheduled micro-batch
    (ProcessingTimeTimeout keeps batches running even with no new data),
    physically removes the key, and a later duplicate is re-admitted."""
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    out = os.path.join(str(tmp_path), "out")
    _write_batch(src, 0, [_evt(0, "E1", qty=3)])

    stream = (
        spark.readStream.schema(ORDER_EVENT)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        dedup_stateful(stream, ttl_ms=1000, register_eviction_timers=True)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        time.sleep(3.0)  # TTL passes; timer batch evicts the key
        _write_batch(src, 1, [_evt(1, "E1", qty=9)])
        deadline = time.time() + 30
        got = []
        while time.time() < deadline:
            try:
                got = spark.read.parquet(out).collect()
                if len(got) >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()
    assert sorted((r.event_id, r.quantity) for r in got) == [
        ("E1", 3),
        ("E1", 9),
    ]


def test_timer_survives_midttl_duplicate(spark, tmp_path):
    """ADVICE round-1 (stateful_dedup timer re-arm): Spark clears a key's
    timeout on every function invocation, so a duplicate arriving mid-TTL
    used to cancel the eviction timer permanently. The duplicate path now
    re-arms with the REMAINING lifetime: after the duplicate, eviction must
    still fire (on the original first-seen clock) and a post-TTL duplicate
    must be re-admitted."""
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    out = os.path.join(str(tmp_path), "out")
    _write_batch(src, 0, [_evt(0, "E1", qty=3)])

    stream = (
        spark.readStream.schema(ORDER_EVENT)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        # TTL must exceed streaming-query startup latency (~12 s) so the
        # duplicate genuinely lands mid-TTL.
        dedup_stateful(stream, ttl_ms=20000, register_eviction_timers=True)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        # Mid-TTL duplicate: suppressed, but must NOT cancel the timer.
        _write_batch(src, 1, [_evt(1, "E1", qty=5)])
        time.sleep(26.0)  # TTL (anchored at first-seen) passes; timer evicts
        _write_batch(src, 2, [_evt(2, "E1", qty=9)])
        deadline = time.time() + 30
        got = []
        while time.time() < deadline:
            try:
                got = spark.read.parquet(out).collect()
                if len(got) >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()
    # qty=5 (mid-TTL dup) suppressed; qty=9 re-admitted after eviction.
    assert sorted((r.event_id, r.quantity) for r in got) == [
        ("E1", 3),
        ("E1", 9),
    ]


def test_cdc_lastvalue_stale_tile_counterfactual(spark, sf_dir):
    """Every stale replay in the 4th arrival tile is strictly older than
    its user's true latest row (bar a user whose global last event happens
    to be the replayed one) — so a stateless per-batch fold would emit the
    stale row as that user's final materialization and diverge from the
    oracle for many users. Pins the population non-vacuous."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from topk_spark.workload.cdc2_queries import _tiled_with_stale_replays

    src = _tiled_with_stale_replays(spark, sf_dir)
    stale = src.where(F.col("_tile") == 3).select(
        "user_id",
        F.col("ts_us").alias("s_us"),
        F.col("event_id").alias("s_eid"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    true_last = (
        src.where(F.col("_tile") < 3)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "ts_us", "event_id")
    )
    j = stale.join(true_last, "user_id")
    n_stale = j.count()
    n_users = j.select("user_id").distinct().count()
    n_diverging = j.where(
        (F.col("s_us") < F.col("ts_us"))
        | ((F.col("s_us") == F.col("ts_us")) & (F.col("s_eid") < F.col("event_id")))
    ).select("user_id").distinct().count()
    assert n_stale >= 30, n_stale
    # nearly every replayed user must be regress-able (true last row
    # strictly newer than the replay); allow the rare user whose global
    # last event IS the replayed tile-0 row, per the docstring
    assert n_diverging >= max(10, n_users - 2), (n_diverging, n_users)
