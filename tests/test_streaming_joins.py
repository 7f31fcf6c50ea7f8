"""Streaming join coverage — beyond the reference's fan-out-only topology,
an engine replacing Flink must ship stream enrichment:

- stream-static join (dimension enrichment): the denormalized item name /
  category the reference carries on every event (Models.kt:14-16) is what a
  normalized pipeline would attach from a dim table — the static side
  broadcasts into every micro-batch, no state.
- stream-stream interval join: order events matched to the user's preceding
  view event within a bounded horizon (the attribution topology). Both sides
  watermarked; state is bounded by the interval + watermark, the Spark
  equivalent of Flink's IntervalJoin.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VIEW_SCHEMA = StructType(
    [
        StructField("view_id", StringType()),
        StructField("user_id", StringType()),
        StructField("item_id", StringType()),
        StructField("view_ms", LongType()),
    ]
)

BUY_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("user_id", StringType()),
        StructField("item_id", StringType()),
        StructField("buy_ms", LongType()),
    ]
)

T0 = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(query):
    query.awaitTermination()


def test_stream_static_enrichment(spark, tmp_path):
    """Static dim join: every streamed order picks up its margin from a
    static menu table; the static side needs no watermark and no state."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_jsonl(
        os.path.join(src, "b0.jsonl"),
        [
            {"order_id": f"O{i}", "user_id": f"U{i % 3}",
             "item_id": f"I{i % 4}", "buy_ms": T0 + i * 1000}
            for i in range(40)
        ],
    )
    menu = spark.createDataFrame(
        [(f"I{i}", i * 100) for i in range(4)], ["item_id", "margin_cents"]
    )
    stream = spark.readStream.schema(BUY_SCHEMA).json(src)
    enriched = stream.join(F.broadcast(menu), "item_id")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_orders")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.table("enriched_orders")
    assert out.count() == 40  # every order matched its dim row
    got = {r["item_id"]: r["margin_cents"] for r in out.collect()}
    assert got == {"I0": 0, "I1": 100, "I2": 200, "I3": 300}


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchase attributed to a view by the same user within 10 minutes
    before the purchase. One in-window pair matches; a view outside the
    interval and a user with no view must not produce rows."""
    views_dir = str(tmp_path / "views")
    buys_dir = str(tmp_path / "buys")
    os.makedirs(views_dir)
    os.makedirs(buys_dir)
    m = 60_000
    _write_jsonl(
        os.path.join(views_dir, "v0.jsonl"),
        [
            # in-window: U1 views 5 min before buying
            {"view_id": "V1", "user_id": "U1", "item_id": "I1", "view_ms": T0},
            # out-of-window: U2's view is 30 min before the buy
            {"view_id": "V2", "user_id": "U2", "item_id": "I2", "view_ms": T0},
            # never buys
            {"view_id": "V3", "user_id": "U9", "item_id": "I3", "view_ms": T0},
        ],
    )
    _write_jsonl(
        os.path.join(buys_dir, "b0.jsonl"),
        [
            {"order_id": "O1", "user_id": "U1", "item_id": "I1", "buy_ms": T0 + 5 * m},
            {"order_id": "O2", "user_id": "U2", "item_id": "I2", "buy_ms": T0 + 30 * m},
            # no prior view at all
            {"order_id": "O3", "user_id": "U3", "item_id": "I9", "buy_ms": T0 + 5 * m},
        ],
    )
    views = (
        spark.readStream.schema(VIEW_SCHEMA).json(views_dir)
        .withColumn("view_ts", F.timestamp_millis("view_ms"))
        .withWatermark("view_ts", "20 minutes")
    )
    buys = (
        spark.readStream.schema(BUY_SCHEMA).json(buys_dir)
        .withColumn("buy_ts", F.timestamp_millis("buy_ms"))
        .withWatermark("buy_ts", "20 minutes")
    )
    joined = buys.join(
        views,
        (buys.user_id == views.user_id)
        & (views.view_ts <= buys.buy_ts)
        & (views.view_ts >= buys.buy_ts - F.expr("INTERVAL 10 MINUTES")),
    ).select("order_id", "view_id", "buy_ts", "view_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.table("attributed").collect()
    assert [(r["order_id"], r["view_id"]) for r in rows] == [("O1", "V1")]


def test_interval_join_salted_matches_unsalted(spark, tmp_path):
    """salt_buckets must change WHERE the join's work lands (hot key spread
    over N state partitions), never WHAT it returns: on a fixture with one
    hot user carrying most rows plus a never-matched view, the salted join's
    full result set — pairs AND left-outer null rows — must equal the
    unsalted join's, for both join types."""
    from topk_spark.streaming.interval_join import interval_join

    m = 60_000
    views_rows = [
        {"view_id": f"V{i}", "user_id": "U_HOT", "item_id": "I1",
         "view_ms": T0 + i * 1000}
        for i in range(12)
    ] + [
        # matched tail key + a never-matched view (left_outer null row)
        {"view_id": "VT", "user_id": "U_TAIL", "item_id": "I2", "view_ms": T0},
        {"view_id": "VN", "user_id": "U_NONE", "item_id": "I3", "view_ms": T0},
        # views-side watermark advancer (policy 'min' takes the LOWER of the
        # two sides' maxima — without this VN's eviction never comes due);
        # itself still in-window at end-of-stream, so it must NOT appear.
        {"view_id": "VADV", "user_id": "U_ADV2", "item_id": "I9",
         "view_ms": T0 + 100 * 60_000},
    ]
    buys_rows = [
        {"order_id": f"O{i}", "user_id": "U_HOT", "item_id": "I1",
         "buy_ms": T0 + i * 1000 + 500}
        for i in range(12)
    ] + [
        {"order_id": "OT", "user_id": "U_TAIL", "item_id": "I2",
         "buy_ms": T0 + 5 * m},
        # watermark advancer: pushes wm past VN's window in the flush batch
        {"order_id": "OADV", "user_id": "U_ADV", "item_id": "I9",
         "buy_ms": T0 + 100 * m},
    ]

    def run(how: str, salt, name: str):
        vdir = str(tmp_path / f"views_{name}")
        bdir = str(tmp_path / f"buys_{name}")
        os.makedirs(vdir)
        os.makedirs(bdir)
        _write_jsonl(os.path.join(vdir, "v0.jsonl"), views_rows)
        _write_jsonl(os.path.join(bdir, "b0.jsonl"), buys_rows)
        views = (
            spark.readStream.schema(VIEW_SCHEMA).json(vdir)
            .withColumn("view_ts", F.timestamp_millis("view_ms"))
            .drop("view_ms", "item_id")
        )
        buys = (
            spark.readStream.schema(BUY_SCHEMA).json(bdir)
            .withColumn("buy_ts", F.timestamp_millis("buy_ms"))
            .drop("buy_ms", "item_id")
            .withColumnRenamed("user_id", "b_user_id")
        )
        joined = interval_join(
            views,
            buys,
            left_key="user_id",
            right_key="b_user_id",
            left_time="view_ts",
            right_time="buy_ts",
            window="10 minutes",
            watermark_delay="20 minutes",
            how=how,
            salt_buckets=salt,
        ).select("view_id", "order_id")
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return sorted(
            (r["view_id"], r["order_id"]) for r in spark.table(name).collect()
        )

    for how in ("inner", "left_outer"):
        plain = run(how, None, f"sj_{how}_plain")
        salted = run(how, 4, f"sj_{how}_salted")
        assert salted == plain, f"{how}: salted result diverged"
    # sanity on the fixture itself: the hot key really dominates, and the
    # left_outer run really exercised a null row
    inner = run("inner", None, "sj_sanity")
    assert sum(1 for v, _ in inner if v.startswith("V") and v[1:].isdigit()) >= 60
    outer = run("left_outer", 4, "sj_sanity_outer")
    assert ("VN", None) in outer


def test_salted_join_rejects_unsupported_how(spark):
    """salt_buckets' result-invariance argument only covers inner and
    left_outer (right-side replication makes every unmatched right row emit
    salt_buckets-1 spurious null-joined duplicates under right/full outer)
    — the operator must refuse, not silently corrupt."""
    import pytest

    from topk_spark.streaming.interval_join import interval_join

    v = spark.createDataFrame([("V1", "U1", 0)], "view_id string, user_id string, view_ms long").withColumn("view_ts", F.timestamp_millis("view_ms"))
    b = spark.createDataFrame([("O1", "U1", 0)], "order_id string, b_user_id string, buy_ms long").withColumn("buy_ts", F.timestamp_millis("buy_ms"))
    kwargs = dict(
        left_key="user_id",
        right_key="b_user_id",
        left_time="view_ts",
        right_time="buy_ts",
        window="10 minutes",
        watermark_delay="20 minutes",
    )
    for how in ("right_outer", "full_outer", "left_semi", "rightouter"):
        with pytest.raises(ValueError, match="salt_buckets"):
            interval_join(v, b, how=how, salt_buckets=4, **kwargs)
    # Spark's alias spellings of the safe types pass the guard
    for how in ("inner", "left_outer", "leftouter", "left"):
        interval_join(v, b, how=how, salt_buckets=4, **kwargs)
    # unsalted joins of ANY type stay the caller's business — no guard
    interval_join(v, b, how="right_outer", **kwargs)


def test_salted_join_rejects_salt_column_collision(spark):
    """A caller-owned `_salt` column on either input would be silently
    overwritten by the salting lever and then dropped from the output —
    refuse instead."""
    import pytest

    from topk_spark.streaming.interval_join import interval_join

    v = spark.createDataFrame([("V1", "U1", 0, 9)], "view_id string, user_id string, view_ms long, _salt int").withColumn("view_ts", F.timestamp_millis("view_ms"))
    b = spark.createDataFrame([("O1", "U1", 0)], "order_id string, b_user_id string, buy_ms long").withColumn("buy_ts", F.timestamp_millis("buy_ms"))
    kwargs = dict(
        left_key="user_id",
        right_key="b_user_id",
        left_time="view_ts",
        right_time="buy_ts",
        window="10 minutes",
        watermark_delay="20 minutes",
    )
    with pytest.raises(ValueError, match="_salt"):
        interval_join(v, b, salt_buckets=4, **kwargs)
    with pytest.raises(ValueError, match="_salt"):
        interval_join(b.withColumnRenamed("order_id", "oid"), v.withColumnRenamed("view_id", "vid").withColumnRenamed("user_id", "u2").withColumnRenamed("view_ts", "vts2"), left_key="b_user_id", right_key="u2", left_time="buy_ts", right_time="vts2", window="10 minutes", watermark_delay="20 minutes", salt_buckets=4)
    # without salting the caller's _salt column is untouched and legal
    out = interval_join(v, b, **kwargs)
    assert "_salt" in out.columns
