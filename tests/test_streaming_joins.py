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
        # never-matched EARLY buy: its right_outer/full_outer null row comes
        # due in the flush batch (wm passes T0), unlike OADV below
        {"order_id": "ON", "user_id": "U_NOBODY", "item_id": "I4",
         "buy_ms": T0},
        # watermark advancer: pushes wm past VN's window in the flush batch
        {"order_id": "OADV", "user_id": "U_ADV", "item_id": "I9",
         "buy_ms": T0 + 100 * m},
    ]

    def run(how: str, salt, name: str, salt_side: str = "left"):
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
            salt_side=salt_side,
        )
        cols = ["view_id"] if how == "left_semi" else ["view_id", "order_id"]
        joined = joined.select(*cols)
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return sorted(
            (tuple(r[c] for c in cols) for r in spark.table(name).collect()),
            key=lambda t: tuple((x is None, x or "") for x in t),
        )

    for how, side in (
        ("inner", "left"),
        ("inner", "right"),
        ("left_outer", "left"),
        ("right_outer", "right"),
        ("left_semi", "left"),
    ):
        plain = run(how, None, f"sj_{how}_{side}_plain")
        salted = run(how, 4, f"sj_{how}_{side}_salted", salt_side=side)
        assert salted == plain, f"{how}/{side}: salted result diverged"
    # sanity on the fixture itself: the hot key really dominates, and each
    # outer/semi run really exercised its distinguishing rows
    inner = run("inner", None, "sj_sanity")
    assert sum(1 for v, _ in inner if v.startswith("V") and v[1:].isdigit()) >= 60
    outer = run("left_outer", 4, "sj_sanity_outer")
    assert ("VN", None) in outer
    router = run("right_outer", 4, "sj_sanity_router", salt_side="right")
    assert (None, "ON") in router
    sem = run("left_semi", 4, "sj_sanity_semi")
    assert ("VT",) in sem and ("VN",) not in sem
    assert len(sem) == len(set(sem)), "semi emitted a view more than once"


def test_outer_eviction_boundary(spark, tmp_path):
    """Pins the outer null-emission deadlines at MICROSECOND precision —
    the exact predicates the drains' oracles encode. The two sides are NOT
    symmetric, and each boundary's strictness is forced by the strictness
    of the condition bound that produces it (condition:
    left_ts <= right_ts < left_ts + window):

    - left_outer deadline, NON-strict at µs: a left row is dead once no
      future right row (arriving at event time >= wm) can satisfy the
      STRICT upper bound right_ts < left_ts + window — i.e. exactly when
      left_us + window_us <= wm_us. Deadline == wm emits; deadline 500 µs
      past wm does not.
    - right_outer deadline, strict by a FULL millisecond: a right row could
      still match a future left row at event time == wm via the non-strict
      lower bound left_ts <= right_ts, so right_ts == wm stays alive; the
      engine evicts at right_us + 1000 <= wm_us (1 ms, the watermark's
      granularity — measured: wm−999 µs alive, wm−1000 µs due).

    One data batch (watermark still initial → nothing due), then the
    availableNow trailing flush batch evicts with wm = min-of-sides maxima
    minus the 20-minute delay."""
    from topk_spark.streaming.interval_join import interval_join

    mu = 60_000_000  # one minute in µs
    t0_us = T0 * 1000
    wm_us = t0_us + 40 * mu  # both advancers at T0+60m, delay 20m
    w_us = 10 * mu  # join window

    views_rows = [
        # matched-pair sanity leg
        {"view_id": "VM", "user_id": "U_M", "view_us": t0_us},
        # deadline == wm exactly → non-strict: MUST emit
        {"view_id": "V_d0", "user_id": "U_V0", "view_us": wm_us - w_us},
        # deadline 500 µs past wm → alive
        {"view_id": "V_dp500", "user_id": "U_V5", "view_us": wm_us - w_us + 500},
        # deadline 500 µs before wm → due
        {"view_id": "V_dm500", "user_id": "U_V6", "view_us": wm_us - w_us - 500},
        {"view_id": "VADV", "user_id": "U_V9", "view_us": t0_us + 60 * mu},
    ]
    buys_rows = [
        {"order_id": "OM", "user_id": "U_M", "buy_us": t0_us + 5 * mu},
        # == wm → alive (future left at == wm could still match)
        {"order_id": "B_0", "user_id": "U_B0", "buy_us": wm_us},
        # 999 µs below wm → still alive (sub-ms of the watermark tick)
        {"order_id": "B_m999", "user_id": "U_B1", "buy_us": wm_us - 999},
        # exactly 1 ms below wm → due
        {"order_id": "B_m1000", "user_id": "U_B2", "buy_us": wm_us - 1000},
        {"order_id": "B_ADV", "user_id": "U_B9", "buy_us": t0_us + 60 * mu},
    ]

    def run(how: str, name: str):
        vdir = str(tmp_path / f"views_{name}")
        bdir = str(tmp_path / f"buys_{name}")
        os.makedirs(vdir)
        os.makedirs(bdir)
        _write_jsonl(os.path.join(vdir, "v0.jsonl"), views_rows)
        _write_jsonl(os.path.join(bdir, "b0.jsonl"), buys_rows)
        views = (
            spark.readStream
            .schema("view_id string, user_id string, view_us long")
            .json(vdir)
            .withColumn("view_ts", F.timestamp_micros("view_us"))
            .drop("view_us")
        )
        buys = (
            spark.readStream
            .schema("order_id string, user_id string, buy_us long")
            .json(bdir)
            .withColumn("buy_ts", F.timestamp_micros("buy_us"))
            .drop("buy_us")
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
            ((r["view_id"], r["order_id"]) for r in spark.table(name).collect()),
            key=lambda t: tuple((x is None, x or "") for x in t),
        )

    router = run("right_outer", "boundary_ro")
    assert ("VM", "OM") in router
    assert (None, "B_m1000") in router, "1 ms-below-wm right null row missing"
    assert (None, "B_m999") not in router, "sub-ms right row evicted early"
    assert (None, "B_0") not in router, "right row at wm evicted early"
    louter = run("left_outer", "boundary_lo")
    assert ("V_dm500", None) in louter, "due left null row missing"
    assert ("V_d0", None) in louter, "deadline==wm left row must emit (<=)"
    assert ("V_dp500", None) not in louter, "past-deadline left row emitted"
    fouter = run("full_outer", "boundary_fo")
    assert {("VM", "OM"), (None, "B_m1000"), ("V_d0", None),
            ("V_dm500", None)} <= set(fouter)
    assert (None, "B_m999") not in fouter and ("V_dp500", None) not in fouter

    # The derived ANTI join inherits exactly the left deadline schedule:
    # absence-decided views only, left columns only, matched rows gone.
    from topk_spark.streaming.interval_join import interval_anti_join

    vdir = str(tmp_path / "views_anti")
    bdir = str(tmp_path / "buys_anti")
    os.makedirs(vdir)
    os.makedirs(bdir)
    _write_jsonl(os.path.join(vdir, "v0.jsonl"), views_rows)
    _write_jsonl(os.path.join(bdir, "b0.jsonl"), buys_rows)
    av = (
        spark.readStream.schema("view_id string, user_id string, view_us long")
        .json(vdir)
        .withColumn("view_ts", F.timestamp_micros("view_us"))
        .drop("view_us")
    )
    ab = (
        spark.readStream.schema("order_id string, user_id string, buy_us long")
        .json(bdir)
        .withColumn("buy_ts", F.timestamp_micros("buy_us"))
        .drop("buy_us")
        .withColumnRenamed("user_id", "b_user_id")
    )
    anti = interval_anti_join(
        av, ab,
        left_key="user_id", right_key="b_user_id",
        left_time="view_ts", right_time="buy_ts",
        window="10 minutes", watermark_delay="20 minutes",
    )
    assert set(anti.columns) == {"view_id", "user_id", "view_ts"}
    q = (
        anti.select("view_id").writeStream.format("memory")
        .queryName("boundary_anti").outputMode("append")
        .trigger(availableNow=True).start()
    )
    _drain(q)
    got = sorted(r["view_id"] for r in spark.table("boundary_anti").collect())
    assert got == ["V_d0", "V_dm500"]  # matched VM and live views absent

    import pytest

    with pytest.raises(ValueError, match="disjoint"):
        interval_anti_join(
            av, ab.withColumnRenamed("order_id", "view_id"),
            left_key="user_id", right_key="b_user_id",
            left_time="view_ts", right_time="buy_ts",
            window="10 minutes", watermark_delay="20 minutes",
        )


def test_salted_join_rejects_unsupported_how(spark):
    """salt_buckets' result-invariance argument requires the REPLICATED side
    to anchor no output rows of its own: replicating an outer (or semi) side
    would emit salt_buckets-1 spurious duplicates per row it anchors. The
    operator must refuse every unsafe (how, salt_side) pair — and accept
    exactly the proven ones — rather than silently corrupt."""
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
    # salt_side='left' (replicate right): right/full outer unsafe
    for how in ("right_outer", "full_outer", "rightouter", "outer"):
        with pytest.raises(ValueError, match="salt_buckets"):
            interval_join(v, b, how=how, salt_buckets=4, **kwargs)
    # salt_side='right' (replicate left): left outer / semi / full unsafe
    for how in ("left_outer", "left", "left_semi", "semi", "full_outer"):
        with pytest.raises(ValueError, match="salt_buckets"):
            interval_join(v, b, how=how, salt_buckets=4, salt_side="right", **kwargs)
    # the proven-safe table, alias spellings included
    for how in ("inner", "left_outer", "leftouter", "left", "left_semi", "semi"):
        interval_join(v, b, how=how, salt_buckets=4, **kwargs)
    for how in ("inner", "right_outer", "rightouter", "right"):
        interval_join(v, b, how=how, salt_buckets=4, salt_side="right", **kwargs)
    # bogus spellings refused outright
    with pytest.raises(ValueError, match="join type"):
        interval_join(v, b, how="sideways", salt_buckets=4, **kwargs)
    with pytest.raises(ValueError, match="salt_side"):
        interval_join(v, b, salt_buckets=4, salt_side="middle", **kwargs)
    # unsalted joins of ANY type stay the caller's business — no guard
    interval_join(v, b, how="right_outer", **kwargs)
    interval_join(v, b, how="full_outer", **kwargs)


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


def test_asof_join_tiebreak_and_horizon(spark, tmp_path):
    """Pins the streaming as-of join's edge semantics the gate fixtures
    cannot reach (their (user, ts) pairs are tie-free and dense):
    - two candidate views at the SAME ts → the higher view_id wins
      (max(struct(view_ts, view_id)) — the batch asof_view_attribution's
      ORDER BY, and the oracle's struct_pack order);
    - a view exactly AT the purchase ts is a candidate (at-or-before is
      inclusive, gap 0);
    - a view 7 days + 1 h old is OUTSIDE the horizon: the purchase emits
      nothing (inner as-of), unlike the unbounded-lookback batch twin."""
    from topk_spark.workload.streaming_join_queries import _build_asof_join

    d = 86_400_000
    h = 3_600_000
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    os.makedirs(vdir)
    os.makedirs(pdir)
    _write_jsonl(os.path.join(vdir, "v0.jsonl"), [
        {"view_id": 10, "user_id": 1, "view_ms": T0},
        {"view_id": 11, "user_id": 1, "view_ms": T0},          # tie with 10
        {"view_id": 20, "user_id": 2, "view_ms": T0},          # too old
        {"view_id": 30, "user_id": 3, "view_ms": T0 + 5000},   # exact-ts
        {"view_id": 990, "user_id": 99, "view_ms": T0 + 30 * d},  # advancer
    ])
    _write_jsonl(os.path.join(pdir, "p0.jsonl"), [
        {"purchase_id": 100, "p_user_id": 1, "purchase_ms": T0 + h},
        {"purchase_id": 200, "p_user_id": 2, "purchase_ms": T0 + 7 * d + h},
        {"purchase_id": 300, "p_user_id": 3, "purchase_ms": T0 + 5000},
        {"purchase_id": 991, "p_user_id": 99, "purchase_ms": T0 + 30 * d},
    ])
    views = (
        spark.readStream.schema("view_id long, user_id long, view_ms long")
        .json(vdir)
        .withColumn("view_ts", F.timestamp_millis("view_ms"))
        .drop("view_ms")
    )
    purchases = (
        spark.readStream.schema(
            "purchase_id long, p_user_id long, purchase_ms long"
        )
        .json(pdir)
        .withColumn("purchase_ts", F.timestamp_millis("purchase_ms"))
        .drop("purchase_ms")
    )
    q = (
        _build_asof_join(views, purchases)
        .writeStream.format("memory")
        .queryName("asof_edge")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = sorted(
        (
            r["purchase_id"], r["user_id"], r["asof_view_id"],
            r["asof_gap_ms"], r["n_candidate_views"],
        )
        for r in spark.table("asof_edge").collect()
    )
    # purchase 200: no in-horizon view; purchase 991: day window still open.
    assert rows == [
        (100, 1, 11, h, 2),
        (300, 3, 30, 0, 1),
    ], f"as-of edge semantics drifted: {rows}"


def test_asof_leftouter_organic_edge(spark, tmp_path):
    """The OUTER as-of on the same edge fixture as the inner test: the
    purchase whose only view is outside the 7-day horizon (user 2) must
    emit exactly once as an ORGANIC conversion — null attribution, null
    gap, zero candidates — and the attributed rows must be identical to
    the inner form's. Pins the null-row arithmetic (max over a struct of
    null fields, count('view_id') skipping nulls) at unit level; the
    drain pins it at corpus scale."""
    from topk_spark.workload.streaming_join_queries import _build_asof_leftouter

    d = 86_400_000
    h = 3_600_000
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    os.makedirs(vdir)
    os.makedirs(pdir)
    _write_jsonl(os.path.join(vdir, "v0.jsonl"), [
        {"view_id": 10, "user_id": 1, "view_ms": T0},
        {"view_id": 11, "user_id": 1, "view_ms": T0},
        {"view_id": 20, "user_id": 2, "view_ms": T0},          # too old
        {"view_id": 990, "user_id": 99, "view_ms": T0 + 30 * d},
    ])
    _write_jsonl(os.path.join(pdir, "p0.jsonl"), [
        {"purchase_id": 100, "p_user_id": 1, "purchase_ms": T0 + h},
        {"purchase_id": 200, "p_user_id": 2, "purchase_ms": T0 + 7 * d + h},
        {"purchase_id": 300, "p_user_id": 3, "purchase_ms": T0 + h},  # no views at all
        {"purchase_id": 991, "p_user_id": 99, "purchase_ms": T0 + 30 * d},
    ])
    views = (
        spark.readStream.schema("view_id long, user_id long, view_ms long")
        .json(vdir)
        .withColumn("view_ts", F.timestamp_millis("view_ms"))
        .drop("view_ms")
    )
    purchases = (
        spark.readStream.schema(
            "purchase_id long, p_user_id long, purchase_ms long"
        )
        .json(pdir)
        .withColumn("purchase_ts", F.timestamp_millis("purchase_ms"))
        .drop("purchase_ms")
    )
    q = (
        _build_asof_leftouter(views, purchases)
        .writeStream.format("memory")
        .queryName("asof_outer_edge")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = sorted(
        (
            r["purchase_id"], r["user_id"], r["asof_view_id"],
            r["asof_gap_ms"], r["n_candidate_views"],
        )
        for r in spark.table("asof_outer_edge").collect()
    )
    assert rows == [
        (100, 1, 11, h, 2),          # attributed, tie broken to view 11
        (200, 2, None, None, 0),     # view outside horizon → organic
        (300, 3, None, None, 0),     # no views at all → organic
    ], f"outer as-of organic edge drifted: {rows}"
