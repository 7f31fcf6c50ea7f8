#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-collect (no driver-side row transfer
beyond the count) after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from topk_spark.session import get_spark
from topk_spark.workload import load_all


def _synth_order_events(
    spark, out_dir: str, n: int, partitions: int = 32, skew: bool = False
) -> None:
    """Deterministic OrderEvent JSONL (no RNG — every column derives from
    xxhash64(id)), ~1% exact duplicates, ≤5s out-of-order jitter. Generated
    distributed and written as `partitions` text files so the file source
    has parallelism to consume.

    `skew=True` draws restaurant_id from a power-law instead of uniform:
    u^4 over 100 restaurants puts ~32% of ALL traffic on one key (and ~56%
    on the top three) — the zipf-like hotspot shape of the reference's
    single-restaurant workloads and the stress case for the rollup's keyed
    state (a per-key funnel would halve throughput here; partial map-side
    aggregation before the keyed shuffle is what keeps it flat)."""
    item = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500))
    if skew:
        u = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)) / 1_000_000.0
        rest = F.floor(F.lit(100.0) * F.pow(u, F.lit(4.0))).cast("long")
    else:
        rest = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100))
    df = (
        spark.range(n).repartition(partitions)
        .select(
            # ~1% of ids emit the previous id's event again → real duplicates.
            # id=0 is excluded: 0 % 97 == 0 would point at the nonexistent
            # "EVT-1" and make that row unique, not a duplicate.
            F.concat(
                F.lit("EVT"),
                (
                    F.col("id")
                    - (
                        (F.col("id") > 0)
                        & (F.pmod(F.col("id"), F.lit(97)) == 0)
                    ).cast("long")
                ),
            ).alias("event_id"),
            F.concat(F.lit("ORD"), F.col("id")).alias("order_id"),
            F.concat(F.lit("CUST"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000)))
            .alias("customer_id"),
            F.concat(F.lit("REST"), rest).alias("restaurant_id"),
            F.concat(F.lit("ITEM"), item).alias("menu_item_id"),
            F.concat(F.lit("CAT"), F.pmod(item, F.lit(20))).alias("category_id"),
            F.concat(F.lit("Item "), item).alias("menu_item_name"),
            (F.lit(1) + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(4)))
            .cast("int").alias("quantity"),
            (F.lit(199) + F.lit(100) * F.pmod(F.xxhash64("id", F.lit(5)), F.lit(30)))
            .cast("int").alias("price_in_cents"),
            (
                F.lit(1_704_067_200_000)
                + F.col("id") * 10
                + F.pmod(F.xxhash64("id", F.lit(6)), F.lit(5000))
            ).alias("timestamp"),
        )
    )
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(out_dir)


def bench_streaming_ingest(spark, sf: float, skew: bool = False) -> dict:
    """End-to-end Structured Streaming ingest throughput: JSON parse →
    watermarked first-seen dedup → raw parquet, then raw → 1-min rollup
    parquet (the full SURVEY §3.2 pipeline, availableNow trigger).

    The reference's headline is 579 orders/s max tested through the
    equivalent Flink topology (BASELINE.md) — this prints the same unit.

    Round-13 (round-12 VERDICT #5): the timed pipeline runs TWICE over the
    same generated input (fresh sink/checkpoint dirs per trial) and the
    record keeps the best — the same two-trial noise policy the headline
    queries get from the regression-retry path. This section is pure
    wall-clock over ~seconds of streaming work, so a co-tenant window was
    able to print a 35k → 19k ev/s dip as the round's driver-visible number
    while every individually-timed query improved (BENCH_r12 `ingest_eps`
    vs the builder record); both trial walls are recorded so a real
    regression (both trials slow) stays visible."""
    from topk_spark.io.sources import read_json_file_stream
    from topk_spark.schemas import ORDER_EVENT
    from topk_spark.streaming.job import (
        build_dedup_stream,
        start_raw_sink,
        start_rollup_from_raw,
    )

    n = max(20_000, int(2_000_000 * sf))
    work = tempfile.mkdtemp(prefix="topk_bench_stream_")
    try:
        # Warm-up topology at small n: first-ever streaming query in a
        # session pays one-time codegen/state-store/sink initialization that
        # is not sustained-throughput (measured 2-4× swing on the timed run
        # without this).
        warm = os.path.join(work, "warm")
        _synth_order_events(spark, os.path.join(warm, "input"), 20_000)
        build_warm = build_dedup_stream(
            read_json_file_stream(spark, os.path.join(warm, "input"), ORDER_EVENT)
        )
        start_raw_sink(
            build_warm,
            os.path.join(warm, "raw"),
            os.path.join(warm, "ckpt_raw"),
            available_now=True,
        ).awaitTermination()

        src = os.path.join(work, "input")
        _synth_order_events(spark, src, n, skew=skew)

        walls: list[float] = []
        for trial in range(2):
            tdir = os.path.join(work, f"t{trial}")
            t0 = time.perf_counter()
            deduped = build_dedup_stream(
                read_json_file_stream(spark, src, ORDER_EVENT)
            )
            q1 = start_raw_sink(
                deduped,
                os.path.join(tdir, "raw"),
                os.path.join(tdir, "ckpt_raw"),
                available_now=True,
            )
            q1.awaitTermination()
            q2 = start_rollup_from_raw(
                spark,
                os.path.join(tdir, "raw"),
                os.path.join(tdir, "rollup"),
                os.path.join(tdir, "ckpt_rollup"),
                available_now=True,
            )
            q2.awaitTermination()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        return {
            "events": n,
            "restaurant_dist": "powerlaw_top1_32pct" if skew else "uniform",
            "wall_s": round(wall, 4),
            "trial_walls_s": [round(w, 4) for w in walls],
            "events_per_sec": round(n / wall, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


_E2E_BASE_MS = 1_704_067_200_000


def _order_json(i: int, ts_ms: int, restaurant: str) -> str:
    return json.dumps({
        "event_id": f"{restaurant}-E{i}", "order_id": f"{restaurant}-O{i}",
        "customer_id": f"C{i % 50}", "restaurant_id": restaurant,
        "menu_item_id": f"ITEM{i % 20}", "category_id": "CAT0",
        "menu_item_name": f"Item {i % 20}", "quantity": 1 + i % 4,
        "price_in_cents": 500, "timestamp": ts_ms,
    })


def _drop_events(src: str, name: str, rows: list[str]) -> None:
    tmp = os.path.join(os.path.dirname(src), f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(rows))
    os.replace(tmp, os.path.join(src, name))  # atomic: source never sees partial


def _poll(fn, timeout_s: float = 60.0, interval_s: float = 0.05):
    deadline = time.perf_counter() + timeout_s
    while time.perf_counter() < deadline:
        try:
            if fn():
                return time.perf_counter()
        except Exception:
            pass
        time.sleep(interval_s)
    return None


def bench_e2e_latency(spark) -> dict:
    """Order → queryable latency, measured the way the reference's "<2 s"
    claim is defined (BASELINE.md): both stages (dedup→raw, raw→1-min
    rollup) are ALREADY RUNNING on 250 ms triggers; we then drop order
    events into the source and poll readers.

    Two numbers, matching the reference's two tables:
    - raw_visible_s: file-drop → row readable in the raw (deduped, upsert-
      analog) table — the hop Pinot's realtime raw ingest answers with.
    - rollup_visible_s: watermark-advancing event → closed 1-min window
      readable in the rollup table (append-mode windowed aggs emit when the
      watermark passes window end; the window-close wait is event-time
      policy, not engine latency, so the clock starts at the advancer)."""
    from topk_spark.io.sources import read_json_file_stream
    from topk_spark.schemas import ORDER_EVENT
    from topk_spark.streaming.job import (
        build_dedup_stream,
        start_raw_sink,
        start_rollup_from_raw,
    )

    work = tempfile.mkdtemp(prefix="topk_bench_e2e_")
    src = os.path.join(work, "input")
    raw = os.path.join(work, "raw")
    rollup = os.path.join(work, "rollup")
    os.makedirs(src)
    q1 = q2 = None
    base = _E2E_BASE_MS
    # Latency-sized state: a 1000-event micro-batch wants a handful of
    # state-store partitions, not the throughput setting — 32 store commits
    # per 1-second trigger would dominate the measurement. (Applies at plan
    # time, so only to the two probe queries started below.)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # Prime: seed events + a watermark advancer so both parquet dirs
        # exist and the seed window closes — steady state before measuring.
        _drop_events(src, "seed.json",
                     [_order_json(i, base + i * 10, "REST_SEED") for i in range(200)]
                     + [_order_json(999, base + 300_000, "REST_SEED")])
        deduped = build_dedup_stream(read_json_file_stream(spark, src, ORDER_EVENT))
        q1 = start_raw_sink(
            deduped, raw, os.path.join(work, "ckpt_raw"),
            trigger_seconds=0.25,
        )
        # Stage 2 must start after stage 1's first commit: the file-stream
        # source decides at start whether the dir is a streaming-sink output
        # (_spark_metadata) — starting it against a not-yet-written dir
        # leaves it reading a plain (empty) glob forever.
        if _poll(lambda: spark.read.parquet(raw).count() > 0, 90) is None:
            return {"raw_visible_s": None, "rollup_visible_s": None}
        q2 = start_rollup_from_raw(
            spark, raw, rollup, os.path.join(work, "ckpt_rollup"),
            trigger_seconds=0.25,
        )
        if _poll(lambda: spark.read.parquet(rollup).count() > 0, 90) is None:
            return {"raw_visible_s": None, "rollup_visible_s": None}

        # Three probe/advance rounds, report the min of each hop: a single
        # shot races the 250 ms trigger phase of TWO cascaded stages plus
        # the poll grain, so one unlucky alignment can add ~0.5-1 s that is
        # measurement noise, not dataflow latency (the same min-of-N
        # discipline the batch timings use). Timestamps advance per round
        # so each round's advancer closes only that round's window.
        raw_best, rollup_best = None, None
        for r in range(3):
            rest = f"REST_E2E{r}"
            probe_base = base + 600_000 * (r + 1)
            t0 = time.perf_counter()
            _drop_events(src, f"probe{r}.json",
                         [_order_json(i, probe_base + i * 10, rest)
                          for i in range(1000)])
            t_raw = _poll(
                lambda: spark.read.parquet(raw)
                .filter(F.col("restaurant_id") == rest).count() >= 1000
            )
            if t_raw is not None:
                s = t_raw - t0
                raw_best = s if raw_best is None else min(raw_best, s)

            t1 = time.perf_counter()
            _drop_events(src, f"advance{r}.json",
                         [_order_json(r, probe_base + 300_000, "REST_ADV")])
            t_roll = _poll(
                lambda: spark.read.parquet(rollup)
                .filter(F.col("restaurant_id") == rest).count() > 0
            )
            if t_roll is not None:
                s = t_roll - t1
                rollup_best = s if rollup_best is None else min(rollup_best, s)
        return {
            "raw_visible_s": round(raw_best, 3) if raw_best else None,
            "rollup_visible_s": round(rollup_best, 3) if rollup_best else None,
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        for q in (q1, q2):
            if q is not None:
                try:
                    q.stop()
                except Exception:
                    pass
        shutil.rmtree(work, ignore_errors=True)


def _pct(sorted_s: list[float], q: float) -> float:
    # Nearest-rank percentile: ceil(q*n)-th order statistic (1-indexed).
    # int(q*n) overshoots — for n=200 it made p99 the 199th value (~p99.5)
    # and p50 the 101st.
    idx = max(0, min(len(sorted_s) - 1, math.ceil(q * len(sorted_s)) - 1))
    return round(sorted_s[idx] * 1000, 1)


def bench_serving_point_read(spark) -> dict:
    """The serving-latency story measured, not argued: the engine's answer
    to Pinot's 10-100 ms indexed point reads is a PRE-RANKED materialized
    topk table (serve/router.py tier discipline) — reads are a
    partition-pruned scan of ~k rows per restaurant, independent of raw
    volume.

    Three regimes, reported separately (round-4 ADVICE: priming the exact
    literals you then time measures cache-hot repeats only, so the cold
    cost must be shown too):

    - warm: 200 reads cycling 80 distinct literals, each literal primed
      once untimed — the resident-server regime the reference's P99 claim
      measures (a dashboard re-queries the same keys). P99 at 200 samples
      is a real 99th percentile, not a max-of-20. TWO trials are run with
      an explicit JVM GC before each; the headline is the trial with the
      lower P99 and BOTH trials are recorded: a single driver-GC or
      co-tenant stall inside one 200-read window (observed: one 726 ms
      read in an otherwise 38 ms-median run) says nothing about the
      operator, and a real serving deployment sizes its heap/GC so that
      pause would not land in the query path. Nothing is hidden — a true
      latency problem shows up in both trials.
    - cold_literal: first-ever reads of 10 NEVER-primed literals through
      the same filter form — each pays its own whole-stage-codegen compile
      + partition listing. Round 3's 199 ms was this cost in a COLD
      session; in a resident session the compiler and file-index caches
      are warm, so fresh keys measure ~p50 here (which is the real
      deployment answer: the first reads after process start are slow, the
      first read of a new key later is not).
    - cold_param: first-ever reads of 5 OTHER never-primed keys through
      NATIVE PARAMETERIZED SQL (spark.sql with named args) — the
      prepared-statement emulation done right: the parameter binds as a
      literal at parse time, so each read plans the same partition-pruned
      scan as the literal path with no per-read local relation or
      broadcast. Round 9 measured the broadcast-join emulation at ~10×
      the literal cost (p50 403 ms vs 37 ms) — the one serving number
      that would surprise a dashboard user — so round 10 switched the
      parameterized path to native binding; the rejected join form is
      still measured as cold_param_join (5 keys) so the gap stays on
      record as the justification.
    """
    work = tempfile.mkdtemp(prefix="topk_bench_serve_")
    try:
        item = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500))
        topk = (
            spark.range(200_000)
            .select(
                F.concat(F.lit("REST"), F.pmod(F.xxhash64("id"), F.lit(100)))
                .alias("restaurant_id"),
                F.concat(F.lit("ITEM"), item).alias("menu_item_id"),
                (F.lit(1) + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(4)))
                .alias("quantity"),
            )
            .groupBy("restaurant_id", "menu_item_id")
            .agg(F.sum("quantity").alias("order_count"))
        )
        from topk_spark.ops.topk import rank_topk

        ranked = rank_topk(
            topk,
            ["restaurant_id"],
            [F.desc("order_count"), F.asc("menu_item_id")],
            10,
        )
        path = os.path.join(work, "topk_serving")
        ranked.repartition(F.col("restaurant_id")).write.partitionBy(
            "restaurant_id"
        ).parquet(path)
        serving = spark.read.parquet(path)

        def literal_read(key: str):
            return serving.filter(F.col("restaurant_id") == key).collect()

        def param_read(key: str):
            # native parameterized SQL: :key binds as a literal at parse
            # time → same partition-pruned plan as the literal path
            return spark.sql(
                "SELECT * FROM {sv} WHERE restaurant_id = :key",
                args={"key": key},
                sv=serving,
            ).collect()

        def param_join_read(key: str):
            # the rejected prepared-statement emulation (key as a 1-row
            # broadcast-joined table): pays per-read local-relation
            # analysis + broadcast exchange — kept measured for the record
            keyrow = spark.createDataFrame(
                [(key,)], "restaurant_id string"
            )
            return serving.join(F.broadcast(keyrow), "restaurant_id").collect()

        # warm: literals REST0-79, primed once each, then two GC-prefixed
        # trials of 200 timed reads; headline = lower-P99 trial, both kept
        for i in range(80):
            literal_read(f"REST{i}")
        trials = []
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t = []
            for i in range(200):
                key = f"REST{i % 80}"
                t0 = time.perf_counter()
                rows = literal_read(key)
                t.append(time.perf_counter() - t0)
                if not rows:  # not assert: must survive python -O
                    raise RuntimeError("warm point read returned nothing")
            t.sort()
            trials.append(t)
        trial_stats = [
            {
                "p50_ms": _pct(t, 0.50),
                "p99_ms": _pct(t, 0.99),
                "max_ms": round(t[-1] * 1000, 1),
            }
            for t in trials
        ]
        warm = min(trials, key=lambda t: _pct(t, 0.99))

        # cold literal-filter: REST80-89, never touched before this loop
        cold_lit = []
        for i in range(80, 90):
            t0 = time.perf_counter()
            rows = literal_read(f"REST{i}")
            cold_lit.append(time.perf_counter() - t0)
            if not rows:
                raise RuntimeError("cold literal point read returned nothing")
        cold_lit.sort()

        # cold parameterized: prime each FORM on one sacrificial (already
        # warm) key, then first-ever reads of REST90-94 (native binding)
        # and REST95-99 (rejected broadcast-join emulation)
        param_read("REST0")
        cold_par = []
        for i in range(90, 95):
            t0 = time.perf_counter()
            rows = param_read(f"REST{i}")
            cold_par.append(time.perf_counter() - t0)
            if not rows:
                raise RuntimeError("cold param point read returned nothing")
        cold_par.sort()

        param_join_read("REST0")
        cold_par_join = []
        for i in range(95, 100):
            t0 = time.perf_counter()
            rows = param_join_read(f"REST{i}")
            cold_par_join.append(time.perf_counter() - t0)
            if not rows:
                raise RuntimeError("cold param-join point read returned nothing")
        cold_par_join.sort()

        return {
            "warm": {
                "reads": len(warm),
                "distinct_keys": 80,
                "p50_ms": _pct(warm, 0.50),
                "p99_ms": _pct(warm, 0.99),
                "max_ms": round(warm[-1] * 1000, 1),
                "trials": trial_stats,
            },
            "cold_literal": {
                "reads": len(cold_lit),
                "p50_ms": _pct(cold_lit, 0.50),
                "max_ms": round(cold_lit[-1] * 1000, 1),
            },
            "cold_param": {
                "reads": len(cold_par),
                "p50_ms": _pct(cold_par, 0.50),
                "max_ms": round(cold_par[-1] * 1000, 1),
            },
            "cold_param_join": {
                "reads": len(cold_par_join),
                "p50_ms": _pct(cold_par_join, 0.50),
                "max_ms": round(cold_par_join[-1] * 1000, 1),
            },
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_sliding_ratio(spark, sf_dir: str) -> dict:
    """Amplify-vs-slices crossover for sliding rollups, measured at hop
    ratios 5 (5m/1m) and 60 (1h/1m, the dashboard-standard case): the
    direct form (ops/rollup.py windowed_rollup(slide=...)) amplifies every
    EVENT into window/slide window copies before partial aggregation, so
    its shuffle-input row count scales with ratio × events; the two-level
    form (sliding_rollup_from_slices) aggregates each 1-minute slice once
    and amplifies only per-slice PARTIALS — shuffle input 1× events plus
    ratio × |slices| tiny rows. Both are result-identical (pinned by the
    shared driver oracle at ratio 5; equality of row count + total revenue
    asserted here at ratio 60), so this is purely a cost curve: the rule
    it measures — amplify at small ratios, slices past the crossover — is
    recorded in PLANS.md."""
    from topk_spark.ops.rollup import sliding_rollup_from_slices, windowed_rollup
    from topk_spark.workload.events_queries import order_stream

    out: dict = {}
    es = order_stream(spark, sf_dir).select("ts", "event_type", "revenue_cents")
    n_events = es.count()
    for label, window_ms, slide_ms in (("5m_1m", 300_000, 60_000),
                                       ("1h_1m", 3_600_000, 60_000)):
        ratio = window_ms // slide_ms

        def amplify():
            return windowed_rollup(
                es,
                "ts",
                ["event_type"],
                [F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                 F.count("*").alias("order_count")],
                f"{window_ms} milliseconds",
                slide=f"{slide_ms} milliseconds",
            ).select("event_type", "window_start", "revenue_cents", "order_count")

        def slices():
            return sliding_rollup_from_slices(
                es,
                "ts",
                ["event_type"],
                [F.sum("revenue_cents").cast("long").alias("revenue_cents"),
                 F.count("*").alias("order_count")],
                ["revenue_cents", "order_count"],
                window_ms=window_ms,
                slide_ms=slide_ms,
            ).select("event_type", "window_start", "revenue_cents", "order_count")

        # result identity at this ratio, ROW-LEVEL: count + an order-
        # independent xor of per-row hashes over every column (bit_xor
        # cannot overflow and compensating per-window errors cannot cancel
        # under xor unless two full row-hashes collide) — the ratio-5 twin
        # is value-hash-gated by the driver, this keeps the ratio-60 point
        # equally honest (round-10 ADVICE: the old 3-aggregate check could
        # mask compensating per-window errors)
        def row_fingerprint(df):
            return df.agg(
                F.count("*").alias("n"),
                F.expr(
                    "bit_xor(xxhash64(event_type, window_start, "
                    "revenue_cents, order_count))"
                ).alias("h"),
            ).collect()[0]

        chk_a = row_fingerprint(amplify())
        chk_s = row_fingerprint(slices())
        if tuple(chk_a) != tuple(chk_s):
            raise RuntimeError(
                f"sliding forms diverged at {label}: amplify {tuple(chk_a)} "
                f"vs slices {tuple(chk_s)}"
            )

        point = {"ratio": ratio, "result_rows": int(chk_a[0]),
                 "amplified_shuffle_rows": n_events * ratio}
        for name, build in (("amplify", amplify), ("slices", slices)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                build().count()
                best = min(best, time.perf_counter() - t0)
            point[f"{name}_s"] = round(best, 4)
        point["amplify_over_slices"] = round(
            point["amplify_s"] / max(point["slices_s"], 1e-9), 3
        )
        out[label] = point
    return out


def bench_serving_trending(spark, sf_dir: str) -> dict:
    """Warm-read latency of the trending tile (serve/api.trending over a
    MATERIALIZED sliding rollup tier). 10 distinct 1-hour ranges cycled
    over 50 timed reads after one untimed prime each, in BOTH deployment
    shapes:

    - rank_on_read: serve/api.trending over the rollup tier — range-pruned
      scan + per-window rank. The rank's exchange puts a shuffle in the
      read path, so this measures the flexible form (any k, any metric,
      ad hoc).
    - preranked: the reference's actual design (KafkaConsumerTopKJob.kt:
      243-272 stores one RANKED row list per window): trending's output is
      materialized once by the pipeline — exactly what
      stream_sliding_topk_drain emits per closed hop — and the tile read
      is a pure range-filtered scan + collect, point-read-shaped, no
      shuffle. The delta between the two is the measured argument for
      serving the tile from the drain's ranked output."""
    from topk_spark.ops.rollup import windowed_rollup
    from topk_spark.serve.api import trending
    from topk_spark.workload.events_queries import order_stream

    work = tempfile.mkdtemp(prefix="topk_bench_trending_")
    try:
        es = order_stream(spark, sf_dir)
        path = os.path.join(work, "sliding_rollup")
        windowed_rollup(
            es,
            "ts",
            ["event_type"],
            [F.sum("revenue_cents").cast("long").alias("revenue_cents")],
            "5 minutes",
            slide="1 minute",
        ).select(
            "window_start", "window_end", "event_type", "revenue_cents"
        ).write.parquet(path)
        tier = spark.read.parquet(path)
        t_min = tier.agg(F.min("window_start")).collect()[0][0]

        # the pre-ranked tier: trending's full-history output materialized
        # once (what the sliding-topk drain emits incrementally), written
        # partitioned by hour bucket so a range read prunes to the 1-2
        # directories it touches — the same pruning discipline as the
        # point-read topk table
        rpath = os.path.join(work, "trending_ranked")
        hour = 3_600_000
        trending(
            tier, "event_type", "revenue_cents", t_min, t_min + 10**15, k=3
        ).withColumn(
            "hb", (F.col("window_start") / F.lit(hour)).cast("long")
        ).repartition("hb").write.partitionBy("hb").parquet(rpath)
        ranked_tier = spark.read.parquet(rpath)

        ranges = [(t_min + i * hour, t_min + (i + 1) * hour) for i in range(10)]

        def rank_on_read(rg):
            return trending(
                tier, "event_type", "revenue_cents", rg[0], rg[1], k=3
            ).collect()

        def preranked(rg):
            # hb prune (windows STARTING in [start, end) live in these
            # buckets) + the exact containment predicates
            return ranked_tier.filter(
                (F.col("hb") >= F.lit(rg[0] // hour))
                & (F.col("hb") <= F.lit((rg[1] - 1) // hour))
                & (F.col("window_start") >= F.lit(rg[0]))
                & (F.col("window_end") <= F.lit(rg[1]))
            ).collect()

        # the ROUTED path (serve/router.TrendingRouter): the tile read a
        # deployment actually issues — freshness decided per request from
        # the pre-ranked tier's high-water mark (pure Python once probed),
        # pre-ranked scan when fresh, rank-on-read fallback otherwise. All
        # ten ranges here are materialized, so this measures the fresh path
        # plus routing overhead.
        from topk_spark.serve.router import TierSpec, TrendingRouter

        router = TrendingRouter(
            TierSpec(df=ranked_tier, window_ms=300_000, partition_col="hb",
                     partition_ms=hour),
            tier, slide_ms=60_000, preranked_k=3,
        )
        if router.route(ranges[0][0], ranges[0][1], 3) != "preranked":
            raise RuntimeError(
                "trending router did not choose the pre-ranked tier for a "
                "materialized range — freshness probe broken"
            )

        def routed(rg):
            return router.read(rg[0], rg[1], k=3).collect()

        out = {"distinct_ranges": len(ranges)}
        for name, read in (("rank_on_read", rank_on_read),
                           ("preranked", preranked),
                           ("routed", routed)):
            got = 0
            for rg in ranges:  # prime once each, untimed
                got += len(read(rg))
            if got == 0:
                raise RuntimeError(
                    f"trending bench ({name}) read zero rows over all ranges"
                )
            t = []
            for i in range(50):
                rg = ranges[i % len(ranges)]
                t0 = time.perf_counter()
                read(rg)
                t.append(time.perf_counter() - t0)
            t.sort()
            out[name] = {
                "reads": len(t),
                "p50_ms": _pct(t, 0.50),
                "p99_ms": _pct(t, 0.99),
                "max_ms": round(t[-1] * 1000, 1),
            }
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_sliding_state_rows(spark, sf_dir: str) -> dict:
    """LIVE streaming-state comparison at the dashboard-standard hop ratio
    60 (1h/1m): the direct sliding aggregation holds one state row per OPEN
    hop window per key (~ratio per key at steady state), the slice-sharing
    form one row per open 1-minute slice per key (~1). Both run as real
    availableNow streaming queries over event-time-ordered tiles (so the
    watermark advances batch by batch and eviction actually happens);
    `final_state_rows` is the engine's own numRowsTotal after the last
    batch — open windows only, the steady-state footprint a continuous
    deployment carries. This is the measured form of the PLANS.md
    amplification rule's state claim (the batch sliding_ratio section
    measures the compute side)."""
    import json as _json

    from topk_spark.workload.events_queries import order_stream
    from topk_spark.workload.streaming_drain_queries import (
        _range_tile,
        _write_ordered_tiles,
    )

    work = tempfile.mkdtemp(prefix="topk_bench_slstate_")
    try:
        es = order_stream(spark, sf_dir).select("ts", "event_type", "revenue_cents")
        tiled = _range_tile(es, "ts", 4)
        src, _ = _write_ordered_tiles(tiled, work, "src", 4, None)

        def run(form: str) -> dict:
            stream = (
                spark.readStream.schema(es.schema)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(src)
                .withWatermark("ts", "10 seconds")
            )
            win = (
                F.window("ts", "1 hour", "1 minute")
                if form == "direct"
                else F.window("ts", "1 minute")
            )
            agg = stream.groupBy(win.alias("w"), "event_type").agg(
                F.sum("revenue_cents").alias("s")
            )
            out_sink = os.path.join(work, f"out_{form}")
            q = (
                agg.writeStream.foreachBatch(
                    lambda d, b: d.write.mode("append").parquet(out_sink)
                )
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, f"ckpt_{form}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            rows = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in (
                    pr if isinstance(pr, dict) else _json.loads(pr.json)
                    for pr in q.recentProgress
                )
                if p.get("stateOperators")
            ]
            return {"final_state_rows": rows[-1], "peak_state_rows": max(rows)}

        direct = run("direct")
        slices = run("slices")
        return {
            "ratio": 60,
            "direct": direct,
            "slices": slices,
            "direct_over_slices_final": round(
                direct["final_state_rows"] / max(slices["final_state_rows"], 1),
                2,
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_serving_percentiles(spark, sf_dir: str) -> dict:
    """Warm/cold latency of the exact-percentile endpoint
    (serve/api.percentiles over a MATERIALIZED per-(key, 1m window, value)
    histogram tier — the serving read for streaming/exact_quantile.py's
    state, and the analog of the reference's own published P50/P99 numbers).
    10 distinct 1-hour ranges; `cold_first_ms` is each range's first-ever
    read (file listing + codegen on the percentile plan), `warm` cycles 50
    timed reads after that prime."""
    from topk_spark.ops.rollup import windowed_rollup
    from topk_spark.serve.api import percentiles
    from topk_spark.workload.events_queries import order_stream

    work = tempfile.mkdtemp(prefix="topk_bench_pctile_")
    try:
        es = order_stream(spark, sf_dir)
        path = os.path.join(work, "hist_tier")
        hour = 3_600_000
        windowed_rollup(
            es,
            "ts",
            ["event_type", "revenue_cents"],
            [F.count("*").alias("n")],
            "1 minute",
        ).select(
            "event_type", "revenue_cents", "window_start", "window_end", "n"
        ).withColumn(
            "hb", (F.col("window_start") / F.lit(hour)).cast("long")
        ).repartition("hb").write.partitionBy("hb").parquet(path)
        tier = spark.read.parquet(path)
        t_min = tier.agg(F.min("window_start")).collect()[0][0]
        ranges = [(t_min + i * hour, t_min + (i + 1) * hour) for i in range(10)]

        def read(rg):
            # hb partition prune first (window_start predicates alone cannot
            # prune a directory layout), then the endpoint's containment
            pruned = tier.filter(
                (F.col("hb") >= F.lit(rg[0] // hour))
                & (F.col("hb") <= F.lit((rg[1] - 1) // hour))
            ).drop("hb")
            return percentiles(
                pruned,
                key_col="event_type",
                value_col="revenue_cents",
                count_col="n",
                pcts=(50, 90, 99),
                start_ms=rg[0],
                end_ms=rg[1],
            ).collect()

        cold, got = [], 0
        for rg in ranges:
            t0 = time.perf_counter()
            got += len(read(rg))
            cold.append(time.perf_counter() - t0)
        if got == 0:
            raise RuntimeError("percentile bench read zero rows over all ranges")
        cold.sort()
        warm = []
        for i in range(50):
            rg = ranges[i % len(ranges)]
            t0 = time.perf_counter()
            read(rg)
            warm.append(time.perf_counter() - t0)
        warm.sort()
        return {
            "distinct_ranges": len(ranges),
            "cold_first_ms": {"p50_ms": _pct(cold, 0.50),
                              "max_ms": round(cold[-1] * 1000, 1)},
            "warm": {"reads": len(warm), "p50_ms": _pct(warm, 0.50),
                     "p99_ms": _pct(warm, 0.99),
                     "max_ms": round(warm[-1] * 1000, 1)},
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_percentile_ladder(spark, sf_dir: str) -> dict:
    """LONG-RANGE routed percentile read over the mixed 1m/1h histogram
    ladder (round-11 VERDICT #3's measurement ask) — fine-tier-only vs
    TierRouter, with rows-scanned recorded per path, for TWO value domains
    (revenue_cents: ~unbounded; quantity: 0..99).

    Measured result (r12, sf0.1): NEITHER compresses here — revenue_cents
    1.00x (values ~unique per row), quantity only 1.14x — because the
    fixture is DENSITY-limited: ~28 events per (hour, type) is below even
    the 100-value domain, so a coarse window rarely sees the same value
    twice. Histogram-ladder compression is value-domain SATURATION of the
    coarse window: hourly rows/key ~ min(events_per_hour_key, |domain|),
    so the ratio is ~events_per_window_key/|domain| capped at the window
    ratio — at production densities (millions of events/hour) a bounded
    domain saturates and hourly rows collapse to |domain| x |keys| x hours
    regardless of volume, which is exactly when the ladder pays. The
    "~60x" intuition belongs to METRIC rollups (sums), where coarsening is
    window-ratio by construction. Recorded rule (PLANS.md round-12):
    coarsen percentile tiers only where the coarse window saturates the
    domain (bounded/bucketed values at real densities); otherwise serve
    long ranges from the fine tier and rely on partition pruning — an
    unsaturated ladder adds union overhead for nothing (quantity's routed
    read measured 0.84x HERE).

    Round-13 (round-12 VERDICT #6): the rule needs BOTH endpoints measured,
    so `quantity_dense` synthesizes the saturated regime the fixture never
    reaches — the same 0..99 quantity domain with the 30-day event spine
    time-compressed into 12 hours (ts' = tmin + (ts − tmin)/60; pure spine
    transform, values untouched), lifting density to ~1.7k events per
    (hour, type) at sf0.1, ~17x the domain. Predicted hourly compression
    events_per_window_key/|domain| ≈ min(..., 60); the recorded
    rows_ratio/routed_speedup row is the WIN endpoint on record next to
    the sparse rows' measured losses."""
    from topk_spark.ops.rollup import merge_rollup, windowed_rollup
    from topk_spark.serve.api import percentiles
    from topk_spark.serve.router import TierRouter, TierSpec
    from topk_spark.workload.events_queries import order_stream

    hour, day = 3_600_000, 86_400_000
    work = tempfile.mkdtemp(prefix="topk_bench_ladder_")
    out: dict[str, dict] = {}
    try:
        es = order_stream(spark, sf_dir)
        tmin_ms = es.agg(
            F.unix_millis(F.min("ts")).alias("t")
        ).collect()[0].t
        dense = es.withColumn(
            "ts",
            F.timestamp_millis(
                (
                    F.lit(tmin_ms)
                    + ((F.unix_millis("ts") - F.lit(tmin_ms)) / F.lit(60))
                ).cast("long")
            ),
        )
        cases = [
            ("revenue_cents", es, "revenue_cents"),
            ("quantity", es, "quantity"),
            ("quantity_dense", dense, "quantity"),
        ]
        for vcol, src, valcol in cases:
            base = src.select(
                "ts", "event_type", F.col(valcol).cast("long").alias("v")
            )
            fpath = os.path.join(work, f"fine_{vcol}")
            windowed_rollup(
                base, "ts", ["event_type", "v"], [F.count("*").alias("n")],
                "1 minute",
            ).select("event_type", "v", "window_start", "window_end", "n")\
             .withColumn("hb", (F.col("window_start") / F.lit(hour)).cast("long"))\
             .repartition("hb").write.partitionBy("hb").parquet(fpath)
            fine = spark.read.parquet(fpath)
            cpath = os.path.join(work, f"coarse_{vcol}")
            merge_rollup(
                fine.drop("hb"), ["event_type", "v"], ["n"],
                target_window_ms=hour,
            ).select("event_type", "v", "window_start", "window_end", "n")\
             .withColumn("db", (F.col("window_start") / F.lit(day)).cast("long"))\
             .repartition("db").write.partitionBy("db").parquet(cpath)
            coarse = spark.read.parquet(cpath)
            bounds = fine.agg(
                F.min("window_start").alias("lo"), F.max("window_end").alias("hi")
            ).collect()[0]
            r0, r1 = bounds.lo + 1_800_000, bounds.hi - 1_800_000  # misaligned
            router = TierRouter({
                hour: TierSpec(df=coarse, window_ms=hour,
                               partition_col="db", partition_ms=day),
                60_000: TierSpec(df=fine, window_ms=60_000,
                                 partition_col="hb", partition_ms=hour),
            })
            fine_scan = TierSpec(
                df=fine, window_ms=60_000, partition_col="hb",
                partition_ms=hour,
            ).pruned(r0, r1)
            routed_scan = router.scan(r0, r1)
            entry: dict = {
                "range_hours": round((r1 - r0) / hour, 1),
                "fine_rows_scanned": fine_scan.count(),
                "routed_rows_scanned": routed_scan.count(),
            }
            entry["rows_ratio"] = round(
                entry["fine_rows_scanned"]
                / max(entry["routed_rows_scanned"], 1), 2,
            )
            for name, scan in (("fine_only", fine_scan), ("routed", routed_scan)):
                rd = percentiles(
                    scan, key_col="event_type", value_col="v", count_col="n",
                    pcts=(50, 90, 99), start_ms=r0, end_ms=r1,
                )
                rows = len(rd.collect())  # prime
                if rows == 0:
                    raise RuntimeError(
                        f"ladder bench ({vcol}/{name}) read zero rows"
                    )
                t = []
                for _ in range(6):
                    t0 = time.perf_counter()
                    rd.collect()
                    t.append(time.perf_counter() - t0)
                t.sort()
                entry[f"{name}_p50_ms"] = _pct(t, 0.50)
            entry["routed_speedup"] = round(
                entry["fine_only_p50_ms"] / max(entry["routed_p50_ms"], 1e-9), 2
            )
            out[vcol] = entry
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_serving_scaling(
    spark, sf_dir: str, main_points: dict[str, float]
) -> dict:
    """Latency-scaling exponents for the SERVING reads (round-11 VERDICT
    #5): the headline queries have a measured t ~ n^alpha over the testdata
    ladder (bench_scaling); the serving paths were measured at the main sf
    only. Re-runs the trending-tile and percentile serving benches at the
    largest ladder sf below the main run and records
    alpha = log(p50_main/p50_ref)/log(step) per path. Pruned tier reads
    should be strongly sublinear (alpha << 1): their scan is bounded by the
    touched partitions, not the corpus — a near-linear serving alpha means
    a read is scanning the tier, and would not survive 100x."""
    import math

    try:
        sf_main = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return {"step": None, "alphas": {}}
    root = os.path.dirname(sf_dir.rstrip("/"))
    ref_dir = os.path.join(root, "sf0.01")
    if not os.path.isdir(ref_dir) or sf_main <= 0.01:
        return {"step": None, "alphas": {}}
    step = sf_main / 0.01
    ref_trend = bench_serving_trending(spark, ref_dir)
    ref_pct = bench_serving_percentiles(spark, ref_dir)
    ref_points = {
        "trending_rank_on_read": ref_trend["rank_on_read"]["p50_ms"],
        "trending_preranked": ref_trend["preranked"]["p50_ms"],
        "trending_routed": ref_trend["routed"]["p50_ms"],
        "percentiles_warm": ref_pct["warm"]["p50_ms"],
    }
    alphas = {}
    for k, ref in ref_points.items():
        main = main_points.get(k)
        if main and ref:
            alphas[k] = {
                "ref_p50_ms": ref,
                "main_p50_ms": main,
                "alpha": round(
                    math.log(max(main, 1e-3) / max(ref, 1e-3))
                    / math.log(step), 3,
                ),
            }
    return {"step": step, "ref_sf": 0.01, "alphas": alphas}


def bench_quantile_state(spark) -> dict:
    """State-size measurement for the exact integer-histogram quantile
    (streaming/exact_quantile.py, binary two-array encoding new r11) vs GK
    (percentile_approx, accuracy 50) at the histogram's own declared
    domain scale (~10^5 distinct integer values per key) — the round-10
    VERDICT asked for the module's "smaller than raw by orders of
    magnitude" claim as a NUMBER. Both operators run as real availableNow
    streaming queries; `state_mem_bytes` comes from the engine's
    stateOperators progress metrics (same provider, same batch layout).
    The exact histogram runs at TWO row volumes over the same domain to
    pin the structural claim: its state is O(domain) — blob bytes hold
    constant while raw-row bytes grow with n."""
    import json as _json

    from topk_spark.streaming.exact_quantile import (
        encode_histogram,
        streaming_exact_quantile,
    )

    n_keys, domain = 4, 100_000
    work = tempfile.mkdtemp(prefix="topk_bench_qstate_")
    try:
        def write_src(rows_per_key: int, name: str) -> str:
            src = os.path.join(work, name)
            # (id·knuth) mod domain: deterministic, covers the domain with
            # repetition once rows_per_key > domain (real metric shape:
            # many measurements over a bounded cents/ms value domain)
            spark.range(rows_per_key * n_keys).select(
                (F.col("id") % n_keys).cast("string").alias("k"),
                ((F.col("id") * 2654435761) % domain).cast("long").alias("v"),
            ).coalesce(4).write.parquet(src)
            return src

        def run_stream(build, src: str, tag: str) -> dict:
            out_sink = os.path.join(work, f"out_{tag}")
            q = (
                build(spark.readStream.schema("k string, v long").parquet(src))
                .writeStream.foreachBatch(
                    lambda d, b: d.write.mode("append").parquet(out_sink)
                )
                .outputMode("update")
                .option("checkpointLocation", os.path.join(work, f"ckpt_{tag}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progs = [
                pr if isinstance(pr, dict) else _json.loads(pr.json)
                for pr in q.recentProgress
            ]
            ops = [
                p["stateOperators"][0]
                for p in progs
                if p.get("stateOperators")
            ]
            last = ops[-1]
            rows = int(last["numRowsTotal"])
            mem = int(last.get("memoryUsedBytes") or 0)
            return {
                "state_rows": rows,
                "state_mem_bytes": mem,
                "state_mem_per_key": round(mem / max(rows, 1)),
            }

        def exact_build(s):
            return streaming_exact_quantile(
                s, key="k", value_col="v", pcts=(50, 99)
            )

        def gk_build(s):
            return s.groupBy("k").agg(
                F.percentile_approx("v", F.lit(0.5), F.lit(50)).alias("med")
            )

        out = {"keys": n_keys, "domain": domain}
        for rows_per_key, tag in ((100_000, "small"), (500_000, "large")):
            src = write_src(rows_per_key, f"src_{tag}")
            ex = run_stream(exact_build, src, f"exact_{tag}")
            # exact blob bytes, computed from the data itself (not the
            # engine's map-overhead estimate): one key's full histogram
            hist = (
                spark.read.parquet(src)
                .where(F.col("k") == "0")
                .groupBy("v")
                .agg(F.count("*").alias("c"))
                .orderBy("v")
                .collect()
            )
            blob = encode_histogram([r["v"] for r in hist], [r["c"] for r in hist])
            ex["distinct_per_key"] = len(hist)
            ex["blob_bytes_binary"] = len(blob)
            ex["raw_rows_bytes_per_key"] = rows_per_key * 8
            ex["raw_over_blob"] = round(rows_per_key * 8 / len(blob), 2)
            out[f"exact_{tag}"] = ex
            if tag == "large":
                out["gk"] = run_stream(gk_build, src, "gk")
        out["blob_constant_across_5x_rows"] = (
            out["exact_large"]["blob_bytes_binary"]
            <= out["exact_small"]["blob_bytes_binary"] * 1.05
        )
        out["exact_over_gk_mem"] = round(
            out["exact_large"]["state_mem_bytes"]
            / max(out["gk"]["state_mem_bytes"], 1),
            2,
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _synth_docs(spark, n: int):
    """Deterministic synthetic document corpus for streaming-neardup
    throughput: 30 words per doc drawn from a 512-word hash vocabulary (no
    RNG), with ~2% planted duplicates (ids ≡ 0 mod 50 repeat the previous
    id's text) so the suppression path does real match work."""
    base = (
        F.col("id")
        - ((F.col("id") > 0) & (F.pmod(F.col("id"), F.lit(50)) == 0)).cast("long")
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base, i, F.lit(7)), F.lit(512))
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def _synth_raw_orders(spark, n: int):
    """Deterministic RAW-table-shaped order rows (the rollup stage's input:
    ORDER_EVENT columns + event_ts + revenue_cents) — same derivations as
    _synth_order_events, as a DataFrame for a parquet stream source."""
    item = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500))
    ts_ms = (
        F.lit(1_704_067_200_000)
        + F.col("id") * 10
        + F.pmod(F.xxhash64("id", F.lit(6)), F.lit(5000))
    )
    qty = (F.lit(1) + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(4))).cast("int")
    price = (
        F.lit(199) + F.lit(100) * F.pmod(F.xxhash64("id", F.lit(5)), F.lit(30))
    ).cast("int")
    return spark.range(n).select(
        F.concat(F.lit("EVT"), F.col("id")).alias("event_id"),
        F.concat(F.lit("ORD"), F.col("id")).alias("order_id"),
        F.concat(F.lit("CUST"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000)))
        .alias("customer_id"),
        F.concat(F.lit("REST"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)))
        .alias("restaurant_id"),
        F.concat(F.lit("ITEM"), item).alias("menu_item_id"),
        F.concat(F.lit("CAT"), F.pmod(item, F.lit(20))).alias("category_id"),
        F.concat(F.lit("Item "), item).alias("menu_item_name"),
        qty.alias("quantity"),
        price.alias("price_in_cents"),
        ts_ms.alias("timestamp"),
        F.timestamp_millis(ts_ms).alias("event_ts"),
        (qty.cast("long") * price.cast("long")).alias("revenue_cents"),
    )


# Streaming per-doc cost growth gate, same bar as the batch queries: wall
# time t ∝ n^α with α > 1.2 between the two largest sizes means state-store
# lookup/commit cost is growing super-linearly with corpus size — the
# binding constraint a 100 TB continuous deployment hits first.
_STREAM_ALPHA_MAX = 1.2


def bench_streaming_scaling(spark, sf: float) -> dict:
    """Throughput CURVES for the two signature stateful operators — the
    MinHash near-dup suppressor (streaming/neardup.py: keyed band-bucket
    state) and the pipeline's watermarked 1-minute rollup
    (streaming/job.py: windowed aggregate state) — at three corpus sizes
    under BOTH state-store backends. One size proves throughput; the curve
    proves the per-doc cost does not GROW with accumulated state, which is
    what actually breaks at 100 TB (round-4 VERDICT item 4). Near-dup match
    counts are compared across stores per size: the backend must change
    where state lives, never semantics."""
    from topk_spark.session import _STATE_STORE_CONF, set_state_store
    from topk_spark.streaming.job import build_rollup_stream
    from topk_spark.streaming.neardup import neardup_match_stream

    import math

    sizes = (
        [1_000, 10_000, 100_000] if sf >= 0.1 else [500, 2_000, 8_000]
    )
    work = tempfile.mkdtemp(prefix="topk_bench_sscale_")
    prev = spark.conf.get(_STATE_STORE_CONF, None)

    def drain(build, src_schema: str, src: str, sink: str, ckpt: str) -> float:
        stream = spark.readStream.schema(src_schema).parquet(src)
        t0 = time.perf_counter()
        q = (
            build(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    ops: dict[str, dict] = {"neardup": {}, "rollup": {}}
    flagged: list[dict] = []
    try:
        doc_srcs, ord_srcs = {}, {}
        for n in sizes:
            doc_srcs[n] = os.path.join(work, f"docs{n}")
            _synth_docs(spark, n).repartition(8).write.parquet(doc_srcs[n])
            ord_srcs[n] = os.path.join(work, f"orders{n}")
            _synth_raw_orders(spark, n).repartition(8).write.parquet(ord_srcs[n])
        raw_schema = (
            "event_id string, order_id string, customer_id string, "
            "restaurant_id string, menu_item_id string, category_id string, "
            "menu_item_name string, quantity int, price_in_cents int, "
            "timestamp long, event_ts timestamp, revenue_cents long"
        )
        for store in ("hdfs", "rocksdb"):
            if not set_state_store(spark, store):
                ops["neardup"][store] = {"available": False}
                ops["rollup"][store] = {"available": False}
                continue
            # one warm drain per op per store: first query on a provider
            # pays store/codegen init that is not sustained throughput
            drain(
                neardup_match_stream, "doc_id long, text string",
                doc_srcs[sizes[0]],
                os.path.join(work, f"warm_nd_{store}"),
                os.path.join(work, f"warm_nd_ck_{store}"),
            )
            drain(
                build_rollup_stream, raw_schema, ord_srcs[sizes[0]],
                os.path.join(work, f"warm_ru_{store}"),
                os.path.join(work, f"warm_ru_ck_{store}"),
            )
            for op, srcs, schema, build in (
                ("neardup", doc_srcs, "doc_id long, text string",
                 neardup_match_stream),
                ("rollup", ord_srcs, raw_schema, build_rollup_stream),
            ):
                curve = []
                for n in sizes:
                    sink = os.path.join(work, f"{op}_{store}_{n}")
                    wall = drain(
                        build, schema, srcs[n], sink,
                        os.path.join(work, f"{op}_{store}_{n}_ck"),
                    )
                    point = {
                        "n": n,
                        "wall_s": round(wall, 3),
                        "docs_per_sec": round(n / wall, 1),
                    }
                    if op == "neardup":
                        point["matches"] = (
                            spark.read.parquet(sink)
                            .dropDuplicates(["id", "dup_of"])
                            .count()
                        )
                    curve.append(point)
                alpha = round(
                    math.log(curve[-1]["wall_s"] / curve[-2]["wall_s"])
                    / math.log(sizes[-1] / sizes[-2]),
                    3,
                )
                ops[op][store] = {
                    "available": True,
                    "curve": curve,
                    "alpha": alpha,
                }
                if alpha > _STREAM_ALPHA_MAX:
                    flagged.append({"op": op, "store": store, "alpha": alpha})
        both = [s for s in ("hdfs", "rocksdb")
                if ops["neardup"].get(s, {}).get("available")]
        matches_equal = (
            len(both) < 2
            or all(
                ops["neardup"]["hdfs"]["curve"][i]["matches"]
                == ops["neardup"]["rocksdb"]["curve"][i]["matches"]
                for i in range(len(sizes))
            )
        )
        return {
            "sizes": sizes,
            "alpha_max_allowed": _STREAM_ALPHA_MAX,
            "neardup": ops["neardup"],
            "rollup": ops["rollup"],
            "neardup_matches_equal_across_stores": matches_equal,
            "flagged": flagged,
        }
    finally:
        if prev is None:
            try:
                spark.conf.unset(_STATE_STORE_CONF)
            except Exception:
                pass
        else:
            spark.conf.set(_STATE_STORE_CONF, prev)
        shutil.rmtree(work, ignore_errors=True)


def bench_streaming_join_scaling(spark, sf_dir: str) -> dict:
    """Throughput curve for the stream-stream interval join (round-5
    operator class: symmetric hash-join state). Sizes are USER-subsampled
    (user_id % m == 0) so per-user temporal density — and with it the
    pairs-per-event ratio — stays constant across points: wall time then
    measures the operator, not a quadratically growing output. α is fitted
    on events processed, same gate as the other streaming curves."""
    import math

    import pyspark.sql.functions as F

    from topk_spark.io.sources import load_table
    from topk_spark.workload.streaming_drain_queries import _range_tile
    from topk_spark.workload.streaming_join_queries import (
        _build_join,
        drain_join,
    )

    curve = []
    flagged: list[dict] = []
    build = _build_join("inner", "90 days")
    warmed = False
    for mod in (8, 4, 2, 1):  # mod=8 is an untimed warm drain (init costs)
        e = _range_tile(
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("view", "purchase"))
            .filter(F.col("user_id") % mod == 0)
            .select("event_id", "ts", "user_id", "event_type"),
            "ts",
            3,
        )
        views = e.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            "user_id",
            "_tile",
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("p_user_id"),
            "_tile",
        )
        n = e.count()
        t0 = time.perf_counter()
        pairs = drain_join(spark, views, purchases, build, n_batches=3).count()
        wall = time.perf_counter() - t0
        if not warmed:
            warmed = True
            continue
        curve.append(
            {
                "events": n,
                "pairs": pairs,
                "wall_s": round(wall, 3),
                "events_per_sec": round(n / wall, 1),
            }
        )
    alpha = round(
        math.log(curve[-1]["wall_s"] / curve[-2]["wall_s"])
        / math.log(curve[-1]["events"] / curve[-2]["events"]),
        3,
    )
    if alpha > _STREAM_ALPHA_MAX:
        flagged.append({"op": "interval_join", "alpha": alpha})
    return {
        "alpha_max_allowed": _STREAM_ALPHA_MAX,
        "curve": curve,
        "alpha": alpha,
        "flagged": flagged,
    }


def bench_streaming_join_skew(spark, sf_dir: str) -> dict:
    """Hot-key posture of the stream-stream interval join, measured (round-6
    verdict item 3 — the same hazard class as the reference's G4 single-key
    bottleneck, on the join operator's state). Three drains over the SAME
    events and the SAME 100-key space, so only the key DISTRIBUTION varies:

    - uniform: keys hashed uniformly over 100 values;
    - skewed: power-law keys, floor(100·u⁴) — the ingest-skew shape (top key
      ~32% of all traffic, top three ~56%);
    - skewed_salted: the same skewed streams through the pre-salted join
      (salt_buckets=8, streaming/interval_join.py) — the documented 100 TB
      lever, exercised rather than argued.

    The honest unit is per-PAIR cost: skew multiplies output pairs (the hot
    key's views × purchases), so events/s alone would damn the join for
    doing strictly more emission work. Gate: skewed per-pair cost within
    1.5× of uniform, else the salted form must close it (flagged if both
    breach).

    At the sf0.1 fixture the ~15 s fixed drain cost dominates and the gate
    passes trivially, so a second, `hot` block runs where skew actually
    BINDS: 60k synthetic events, 30-minute window — the hot key buffers
    ~9.5k views and Spark's symmetric hash join scans ALL buffered rows of
    a key per probe (the time predicate filters after retrieval), so the
    hot partition does ~4×10⁷ row comparisons serially. Measured: salting
    ~halves wall time at identical output (≈35 s → ≈18 s, the variable
    part ~7× — the remainder is the fixed drain cost), which is the
    experimental proof the salt lever earns its place. Flag if the salted
    run is not faster than the unsalted one (lever broken)."""
    from topk_spark.io.sources import load_table
    from topk_spark.streaming.interval_join import interval_join
    from topk_spark.workload.streaming_drain_queries import _range_tile
    from topk_spark.workload.streaming_join_queries import drain_join

    e0 = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .filter(F.col("user_id") % 4 == 0)
        .select("event_id", "ts", "event_type")
    )
    u = (
        F.pmod(F.xxhash64("event_id", F.lit(11)), F.lit(1_000_000))
        / 1_000_000.0
    )
    keyed = {
        "uniform": e0.withColumn(
            "uid", F.pmod(F.xxhash64("event_id", F.lit(12)), F.lit(100))
        ),
        "skewed": e0.withColumn(
            "uid", F.floor(F.lit(100.0) * F.pow(u, F.lit(4.0))).cast("long")
        ),
    }

    def make_build(salt):
        def build(v, p):
            j = interval_join(
                v,
                p,
                left_key="user_id",
                right_key="p_user_id",
                left_time="view_ts",
                right_time="purchase_ts",
                window="7 DAYS",
                watermark_delay="90 days",
                how="inner",
                salt_buckets=salt,
            )
            return j.select("user_id", "view_id", "purchase_id")

        return build

    def run(e, salt) -> tuple[int, int, float]:
        e = _range_tile(e, "ts", 3)
        views = e.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.col("uid").alias("user_id"),
            "_tile",
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("uid").alias("p_user_id"),
            "_tile",
        )
        n = e.count()
        t0 = time.perf_counter()
        pairs = drain_join(
            spark, views, purchases, make_build(salt), n_batches=3
        ).count()
        return n, pairs, time.perf_counter() - t0

    run(keyed["uniform"], None)  # untimed warm drain (init costs)
    out: dict = {}
    for name, e, salt in (
        ("uniform", keyed["uniform"], None),
        ("skewed", keyed["skewed"], None),
        ("skewed_salted", keyed["skewed"], 8),
    ):
        n, pairs, wall = run(e, salt)
        out[name] = {
            "events": n,
            "pairs": pairs,
            "wall_s": round(wall, 3),
            "us_per_pair": round(wall / max(pairs, 1) * 1e6, 2),
        }
        if salt:
            out[name]["salt_buckets"] = salt
    # RuntimeError, not assert: this is a correctness tripwire inside a
    # perf harness — it must survive `python -O` (round-7 ADVICE), or the
    # bench would silently record a salted speedup over different results.
    if out["skewed_salted"]["pairs"] != out["skewed"]["pairs"]:
        raise RuntimeError(
            f"salting changed join results: {out['skewed_salted']['pairs']} "
            f"salted vs {out['skewed']['pairs']} unsalted pairs"
        )
    ratio = round(
        out["skewed"]["us_per_pair"] / out["uniform"]["us_per_pair"], 3
    )
    ratio_salted = round(
        out["skewed_salted"]["us_per_pair"] / out["uniform"]["us_per_pair"], 3
    )
    out["skew_over_uniform_per_pair"] = ratio
    out["salted_over_uniform_per_pair"] = ratio_salted
    out["flagged"] = (
        [{"op": "interval_join_skew", "ratio": ratio, "salted": ratio_salted}]
        if ratio > 1.5 and ratio_salted > 1.5
        else []
    )

    # hot block: synthetic scale where the hot key's probe cost binds
    n_hot = 60_000
    uh = (
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1_000_000)) / 1_000_000.0
    )
    hot_base = spark.range(n_hot).select(
        F.concat(F.lit("E"), F.col("id")).alias("event_id"),
        F.timestamp_millis(
            F.lit(1_704_067_200_000) + F.col("id") * 43_000
        ).alias("ts"),
        F.when(F.pmod("id", F.lit(2)) == 0, "view")
        .otherwise("purchase")
        .alias("event_type"),
        F.floor(F.lit(100.0) * F.pow(uh, F.lit(4.0))).cast("long").alias("uid"),
    )

    def make_build_hot(salt, salt_side="left"):
        def build(v, p):
            j = interval_join(
                v,
                p,
                left_key="user_id",
                right_key="p_user_id",
                left_time="view_ts",
                right_time="purchase_ts",
                window="30 minutes",
                watermark_delay="90 days",
                how="inner",
                salt_buckets=salt,
                salt_side=salt_side,
            )
            return j.select("user_id", "view_id", "purchase_id")

        return build

    def run_hot(salt, trials: int = 2, salt_side: str = "left") -> tuple[int, float]:
        e = _range_tile(hot_base, "ts", 3)
        views = e.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.col("uid").alias("user_id"),
            "_tile",
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("uid").alias("p_user_id"),
            "_tile",
        )
        # Min-of-2 like the headline queries: a ~30 s streaming drain is a
        # big co-tenant-stall target, and single-shot curve points produced
        # one wild outlier per window (N=2 at 0.78×, N=32 at 0.93× in
        # otherwise-consistent runs) — a GC pause or contended stretch
        # lands on one trial, not both.
        pairs, best = 0, float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            pairs = drain_join(
                spark, views, purchases,
                make_build_hot(salt, salt_side), n_batches=3,
            ).count()
            best = min(best, time.perf_counter() - t0)
        return pairs, round(best, 3)

    # Untimed priming drain at the hot block's own scale/window: the first
    # drain of a new shape pays one-time codegen + state-store init, and
    # the unsalted baseline is the denominator of every curve speedup — an
    # unprimed hw would bias the whole curve upward.
    run_hot(None, trials=1)
    hp, hw = run_hot(None)
    # Bucket-sizing curve (round-7 verdict item 7): the lever costs ×N
    # right-side state, so "how many buckets" needs a measured answer, not
    # a guess — N=2 shows whether halving the hot partition already pays,
    # N=32 whether over-salting's replication cost eats the win. N=8 stays
    # the headline salted_speedup for cross-round trend continuity.
    curve: dict[str, dict] = {}
    for n_salt in (2, 8, 32):
        sp, sw = run_hot(n_salt)
        if sp != hp:  # correctness tripwire; must survive python -O
            raise RuntimeError(
                f"salting (buckets={n_salt}) changed hot-block join results: "
                f"{sp} vs {hp} pairs"
            )
        curve[str(n_salt)] = {
            "wall_s": sw,
            "speedup": round(hw / sw, 2),
        }
    sw = curve["8"]["wall_s"]
    # Mirror orientation (round-8: salting became side-aware): salt the
    # RIGHT side, replicate the left — the orientation right_outer needs.
    # The hot key is hot on BOTH sides here, so the mirror lever must show
    # the same physics; a result-count change is a correctness tripwire and
    # a missing speedup means the mirror path's partitioning is broken.
    rp, rw_wall = run_hot(8, salt_side="right")
    if rp != hp:
        raise RuntimeError(
            f"salt_side='right' changed hot-block join results: {rp} vs "
            f"{hp} pairs"
        )
    out["hot"] = {
        "events": n_hot,
        "window": "30 minutes",
        "pairs": hp,
        "unsalted_wall_s": hw,
        "salted_wall_s": sw,
        "salted_speedup": curve["8"]["speedup"],
        "bucket_curve": curve,
        "salt_side_right": {
            "wall_s": rw_wall,
            "speedup": round(hw / rw_wall, 2),
        },
    }
    if sw > hw:
        out["flagged"].append(
            {"op": "interval_join_salt_lever", "unsalted_s": hw, "salted_s": sw}
        )
    if rw_wall > hw:
        out["flagged"].append(
            {"op": "interval_join_salt_side_right", "unsalted_s": hw,
             "salted_s": rw_wall}
        )
    return out


# Scaling exponent gate: α > 1.2 between adjacent scale factors means the
# plan is super-linear in input size (hidden quadratic, skew hotspot, or a
# driver-side collect growing with the data) — exactly what would break the
# 100× scale-up the bar asks about. α slightly below 0 happens when a query
# is overhead-dominated at the small end; that is fine and expected.
_SCALING_ALPHA_MAX = 1.2


def bench_streaming_chain(spark, sf_dir: str) -> dict:
    """Chained stateful operators (round-8 class: interval join feeding a
    1-day windowed rollup in ONE query) vs the alternatives, measured.

    Three walls over the same fixture (user_id % 2 subsample, 3 ordered
    tiles, 1-day watermark):
    - join_only_s: the interval join drained alone (pairs to parquet);
    - chained_s: join → windowed rollup in one checkpointed query
      (`_build_join_rollup_chain`) — what the chain drains gate;
    - two_stage_s: join_only PLUS the cheapest possible second stage (a
      batch re-aggregation of the materialized pairs). This LOWER-bounds
      the real two-job topology, which would add a second streaming job
      with its own checkpoint, trigger latency, and an intermediate topic.

    What the numbers honestly show at bench scale: the chained query pays
    for a SECOND stateful stage (its own shuffle + state store per batch) —
    measured ~1.3× the join-only wall at sf0.01 — while the batch re-agg of
    a few thousand materialized pairs is nearly free, so two_stage_s reads
    LOWER here. The chain's case is not local wall time: it removes the
    intermediate topic/storage entirely (at 100 TB the pair stream is the
    biggest artifact in the pipeline — the two-stage path writes and
    re-reads all of it), halves the operational surface (one checkpoint,
    one failure domain), and emits rollups continuously instead of after a
    second job's trigger latency. The gate this section enforces is the
    measurable half: the in-query rollup must stay within 1.5× of the
    join-only wall (flag otherwise) — i.e. chaining is affordable where
    its architectural wins live."""
    from topk_spark.io.sources import load_table
    from topk_spark.workload.streaming_drain_queries import _range_tile
    from topk_spark.workload.streaming_join_queries import (
        _build_join,
        _build_join_rollup_chain,
        drain_join,
    )

    e = _range_tile(
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .filter(F.col("user_id") % 2 == 0)
        .select("event_id", "ts", "user_id", "event_type"),
        "ts",
        3,
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
        "_tile",
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("p_user_id"),
        "_tile",
    )
    views.cache().count()
    purchases.cache().count()

    from topk_spark.streaming.interval_join import interval_join

    def build_pairs(v, p):
        # same join as the chain's first stage, pairs projected WITH the
        # purchase timestamp so the two-stage path can re-aggregate them
        j = interval_join(
            v, p,
            left_key="user_id", right_key="p_user_id",
            left_time="view_ts", right_time="purchase_ts",
            window="7 DAYS", watermark_delay="1 day", how="inner",
        )
        return j.select(
            "user_id", "view_id", "purchase_id", "purchase_ts",
            (F.unix_millis("purchase_ts") - F.unix_millis("view_ts"))
            .cast("long").alias("gap_ms"),
        )

    # untimed warm drain (session init, shuffle service, codegen)
    drain_join(spark, views, purchases, build_pairs, n_batches=3).count()

    t0 = time.perf_counter()
    pairs_df = drain_join(spark, views, purchases, build_pairs, n_batches=3)
    n_pairs = pairs_df.count()
    join_only_s = time.perf_counter() - t0

    # cheapest second stage: batch re-aggregation of the materialized pairs
    # into the same 1-day windows the chained query produces incrementally
    t0 = time.perf_counter()
    pairs_df.groupBy(F.window("purchase_ts", "1 day")).agg(
        F.count(F.lit(1)).alias("pair_count"),
        F.sum("gap_ms").alias("gap_ms_sum"),
    ).count()
    second_stage_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    chained = drain_join(
        spark, views, purchases, _build_join_rollup_chain, n_batches=3
    )
    n_windows = chained.count()
    chained_s = time.perf_counter() - t0

    # three stateful operators: per-side dedup ahead of the same chain
    # (stream_dedup_join_rollup_chain_drain's topology, duplicates and all)
    def build_three(v, p):
        v = v.withWatermark("view_ts", "1 day").dropDuplicatesWithinWatermark(
            ["view_id"]
        )
        p = p.withWatermark(
            "purchase_ts", "1 day"
        ).dropDuplicatesWithinWatermark(["purchase_id"])
        j = interval_join(
            v, p,
            left_key="user_id", right_key="p_user_id",
            left_time="view_ts", right_time="purchase_ts",
            window="7 DAYS", watermark_delay=None, how="inner",
        )
        return (
            j.groupBy(F.window("purchase_ts", "1 day").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("pair_count"),
                F.sum(
                    F.unix_millis("purchase_ts") - F.unix_millis("view_ts")
                ).alias("gap_ms_sum"),
            )
            .select(
                F.unix_millis(F.col("w.start")).alias("window_start_ms"),
                "pair_count", "gap_ms_sum",
            )
        )

    vdup = views.filter(F.col("view_id") % 5 == 0)
    pdup = purchases.filter(F.col("purchase_id") % 5 == 0)
    t0 = time.perf_counter()
    drain_join(
        spark,
        views.unionByName(vdup),
        purchases.unionByName(pdup),
        build_three,
        n_batches=3,
    ).count()
    three_op_s = time.perf_counter() - t0
    views.unpersist()
    purchases.unpersist()

    overhead = round(chained_s / join_only_s, 3)
    flagged = (
        [{"op": "join_rollup_chain", "overhead": overhead}]
        if overhead > 1.5
        else []
    )
    return {
        "pairs": n_pairs,
        "windows": n_windows,
        "join_only_s": round(join_only_s, 3),
        "chained_s": round(chained_s, 3),
        "three_op_s": round(three_op_s, 3),
        "three_op_over_join_only": round(three_op_s / join_only_s, 3),
        "two_stage_s": round(join_only_s + second_stage_s, 3),
        "chain_over_join_only": overhead,
        "flagged": flagged,
    }


def bench_scaling(spark, headline, sf_dir: str, timings: dict[str, float]) -> dict:
    """Measure t ∝ n^α for every headline query across the testdata ladder
    (sf0.001 → sf0.01 → the main run's sf). α is taken between the two
    LARGEST scales, where fixed session overhead distorts least, using the
    ACTUAL scale-factor ratio of that step (10× only when the main dir is
    sf0.1); the small-sf column is still reported. Queries whose α exceeds
    _SCALING_ALPHA_MAX are flagged — measured evidence for the 'would this
    survive 100×?' question, not an argument."""
    import math

    try:
        sf_main = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf_main = None
    root = os.path.dirname(sf_dir.rstrip("/"))
    ladder = [
        d
        for d in (os.path.join(root, "sf0.001"), os.path.join(root, "sf0.01"))
        if os.path.isdir(d) and os.path.abspath(d) != os.path.abspath(sf_dir)
    ]
    per_query: dict[str, dict] = {}
    small: dict[str, dict[str, float]] = {}
    for d in ladder:
        for name, q in headline.items():
            q.fn(spark, d).count()  # warm: file index + codegen per sf_dir
        for name, q in headline.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                q.fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            small.setdefault(name, {})[os.path.basename(d)] = round(best, 4)
    # α reference point: the largest ladder sf below the main run.
    ref_sf = 0.01 if any(d.endswith("sf0.01") for d in ladder) else None
    step = (
        sf_main / ref_sf
        if (sf_main and ref_sf and sf_main > ref_sf)
        else None
    )
    flagged = []
    computed = 0
    for name, t_main in timings.items():
        cols = small.get(name, {})
        t_ref = cols.get("sf0.01")
        alpha = None
        if t_ref and step:
            alpha = round(
                math.log(max(t_main, 1e-4) / max(t_ref, 1e-4)) / math.log(step), 3
            )
            computed += 1
            if alpha > _SCALING_ALPHA_MAX:
                flagged.append({"query": name, "alpha": alpha})
        per_query[name] = {**cols, "main": t_main, "alpha": alpha}
    return {
        "alpha_max_allowed": _SCALING_ALPHA_MAX,
        "step": step,
        "alphas_computed": computed,
        "per_query": per_query,
        "flagged": flagged,
    }


def _regressions_vs_last_round(
    timings: dict[str, float], sf: float, threshold: float = 1.3,
) -> list[dict]:
    """Per-query regression gate: compare against the most recent
    BENCH_r*.json at the repo root (same scale factor only — cross-sf
    comparisons are meaningless) and report every query >threshold× slower
    AND whose absolute delta exceeds max(0.1 s, 0.3×prev). The absolute
    floor exists because sub-second queries jitter ±0.2-0.4 s run-to-run on
    IDENTICAL code (measured in round 4: the same plan at 0.58/0.81/1.00 s
    across three back-to-back runs) — a ratio-only gate flags that noise as
    regression. Scaling the floor with the prior time (round-4 ADVICE)
    keeps the gate sensitive to large RELATIVE regressions in fast queries
    (0.1 s → 0.44 s now trips: delta 0.34 > max(0.1, 0.03)) without
    re-flagging jitter on slow ones. Loud, not fatal: the driver records
    the field; the judge reads it."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    prior = None
    # Only files matching the _r<N> pattern participate (a stray
    # BENCH_rerun.json must not crash the sort key), and any non-dict or
    # malformed content is skipped — this gate must never be able to abort
    # a bench run whose timings already completed.
    numbered = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            numbered.append((int(m.group(1)), path))
    for _, path in sorted(numbered, reverse=True):
        try:
            with open(path) as fh:
                cand = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(cand, dict):
            continue
        # The driver wraps this script's JSON line under "parsed"
        # ({n, rc, cpus, sf, tail, parsed}); accept the bare form too so a
        # locally-saved bench output also works as a baseline.
        if isinstance(cand.get("parsed"), dict):
            cand = cand["parsed"]
        if cand.get("sf") == sf and isinstance(cand.get("queries"), dict):
            prior = cand["queries"]
            break
    if prior is None:
        return []
    out = []
    for name, t in timings.items():
        p = prior.get(name)
        if p and t > threshold * p and t - p > max(0.1, 0.3 * p):
            out.append(
                {"query": name, "prev_s": p, "now_s": t, "ratio": round(t / p, 2)}
            )
    return out


def _prior_canary_floor(here: str) -> float | None:
    """The post-warm-up canary from the newest COMMITTED bench record — a
    known-clean yardstick for this host. Round-7 ADVICE: comparing the
    confirmation-window canary only against THIS run's first canary lets a
    contended warm-up window mask a contended confirmation window (both
    inflated → ratio < 1.3 → false regressions recorded as confirmed).

    Only git-tracked records qualify (the committed record is the round's
    reviewed evidence; an untracked .driver.json or not-yet-committed file
    may come from any window). Staleness self-heals: every bench run
    commits a fresh record carrying the CURRENT host profile's canary, so
    a permanent host slowdown shifts the floor within one round — it
    over-quarantines only the transition round, which is the correct read
    (everything slowed ⇒ not a plan regression). Falls back to any
    readable record when git is unavailable."""
    import glob
    import re
    import subprocess

    candidates = []
    for path in glob.glob(os.path.join(here, "bench_r*_local*.json")):
        m = re.search(r"bench_r(\d+)_local", os.path.basename(path))
        if m:
            candidates.append((int(m.group(1)), path))
    try:
        tracked = set(
            subprocess.run(
                ["git", "-C", here, "ls-files", "--", "bench_r*_local*.json"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.split()
        )
    except Exception:
        tracked = set()
    if tracked:
        committed = [
            (n, p) for n, p in candidates if os.path.basename(p) in tracked
        ]
        candidates = committed or candidates
    for _, path in sorted(candidates, reverse=True):
        try:
            with open(path) as fh:
                c = json.load(fh).get("canary_s", {}).get("first")
            if isinstance(c, (int, float)) and c > 0:
                return float(c)
        except (OSError, ValueError, AttributeError):
            continue
    return None


def _detail_record_name(here: str, rounds: list[int]) -> str:
    """Collision-safe name for the full bench record (round-7 verdict item
    1): the round's committed bench_r{N}_local.json is the builder's
    evidence, and the driver re-runs this script AFTER that commit — so if
    the target name is already git-tracked AND present, write
    bench_r{N}_local.driver.json (gitignored) instead of silently diverging
    the committed file from the working tree at judging time. A plain
    re-run before any commit still overwrites its own record."""
    import subprocess

    name = f"bench_r{max(rounds, default=0) + 1}_local.json"
    if os.path.exists(os.path.join(here, name)):
        try:
            tracked = (
                subprocess.run(
                    ["git", "-C", here, "ls-files", "--error-unmatch", name],
                    capture_output=True,
                    timeout=10,
                ).returncode
                == 0
            )
        except Exception:
            tracked = False
        if tracked:
            return name.replace(".json", ".driver.json")
    return name


def _canary_time(spark) -> float:
    """Min-of-2 wall time of a fixed pure-CPU aggregate (no IO, no shuffle
    variance): the yardstick for whether a measurement window is contended.
    On this host, co-tenant load inflates EVERYTHING in a window 1.3–3×
    on identical code (documented in _regressions_vs_last_round); a real
    plan regression slows one query and leaves the canary alone."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    headline = {n: q for n, q in registry.items() if q.headline}

    spark = get_spark("topk_spark_bench")
    # Warm the JVM + parquet footers with a trivial action.
    spark.range(1).count()

    # Untimed warm-up execution of each query: file-index + codegen caches
    # populate once, so the timed pass measures steady-state query latency
    # (the regime a long-lived serving session actually runs in), not
    # first-ever-query JIT cost.
    for name, q in headline.items():
        q.fn(spark, sf_dir).count()
    canary_first = _canary_time(spark)
    print(f"# warm-up pass done (canary {canary_first:.3f}s); timing "
          f"steady-state runs", file=sys.stderr)

    # Two timed runs per query, report the min: GC pauses and JIT
    # recompiles land on one run or the other, not both, so min-of-2 is a
    # far steadier estimate of steady-state latency than a single shot
    # (observed up to 3× swing on single-shot runs of the same plan).
    timings: dict[str, float] = {}
    for name, q in headline.items():
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = q.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    serve = bench_serving_point_read(spark)
    print(
        f"# serving point read (pre-ranked topk table): warm P50 "
        f"{serve['warm']['p50_ms']} / P99 {serve['warm']['p99_ms']} / max "
        f"{serve['warm']['max_ms']} ms over {serve['warm']['reads']} reads of "
        f"{serve['warm']['distinct_keys']} keys; cold-literal P50 "
        f"{serve['cold_literal']['p50_ms']} ms, cold-parameterized P50 "
        f"{serve['cold_param']['p50_ms']} ms (native binding; rejected "
        f"join-emulation P50 {serve['cold_param_join']['p50_ms']} ms) "
        f"(reference claim: 10-100 ms P99 on Pinot)",
        file=sys.stderr,
    )
    serve_trend = bench_serving_trending(spark, sf_dir)
    print(
        f"# serving trending tile (top-3 per hop): rank-on-read P50 "
        f"{serve_trend['rank_on_read']['p50_ms']} / P99 "
        f"{serve_trend['rank_on_read']['p99_ms']} ms; pre-ranked tier P50 "
        f"{serve_trend['preranked']['p50_ms']} / P99 "
        f"{serve_trend['preranked']['p99_ms']} ms; ROUTED (TrendingRouter, "
        f"fresh path) P50 {serve_trend['routed']['p50_ms']} / P99 "
        f"{serve_trend['routed']['p99_ms']} ms over "
        f"{serve_trend['rank_on_read']['reads']} reads of "
        f"{serve_trend['distinct_ranges']} ranges",
        file=sys.stderr,
    )
    serve_pct = bench_serving_percentiles(spark, sf_dir)
    print(
        f"# serving percentiles (exact P50/P90/P99 over histogram tier): "
        f"warm P50 {serve_pct['warm']['p50_ms']} / P99 "
        f"{serve_pct['warm']['p99_ms']} ms; cold first-read P50 "
        f"{serve_pct['cold_first_ms']['p50_ms']} ms",
        file=sys.stderr,
    )
    ladder = bench_percentile_ladder(spark, sf_dir)
    print(
        "# percentile ladder (long-range routed vs fine-only): "
        + "; ".join(
            f"{k}: rows {v['fine_rows_scanned']}->{v['routed_rows_scanned']} "
            f"(x{v['rows_ratio']}), p50 {v['fine_only_p50_ms']}->"
            f"{v['routed_p50_ms']} ms (x{v['routed_speedup']})"
            for k, v in ladder.items()
        ),
        file=sys.stderr,
    )
    serve_scale = bench_serving_scaling(
        spark, sf_dir,
        {
            "trending_rank_on_read": serve_trend["rank_on_read"]["p50_ms"],
            "trending_preranked": serve_trend["preranked"]["p50_ms"],
            "trending_routed": serve_trend["routed"]["p50_ms"],
            "percentiles_warm": serve_pct["warm"]["p50_ms"],
        },
    )
    print(
        f"# serving latency scaling over a {serve_scale.get('step')}x data "
        f"step: "
        + "; ".join(
            f"{k}: {v['ref_p50_ms']}->{v['main_p50_ms']} ms (alpha {v['alpha']})"
            for k, v in serve_scale.get("alphas", {}).items()
        ),
        file=sys.stderr,
    )
    qstate = bench_quantile_state(spark)
    print(
        f"# quantile state at domain {qstate['domain']}: exact blob "
        f"{qstate['exact_large']['blob_bytes_binary']} B/key (constant "
        f"across 5x rows: {qstate['blob_constant_across_5x_rows']}), raw/blob "
        f"{qstate['exact_large']['raw_over_blob']}x at "
        f"{qstate['exact_large']['raw_rows_bytes_per_key']} raw B/key; "
        f"state mem exact {qstate['exact_large']['state_mem_per_key']} vs GK "
        f"{qstate['gk']['state_mem_per_key']} B/key "
        f"(x{qstate['exact_over_gk_mem']})",
        file=sys.stderr,
    )
    sliding_ratio = bench_sliding_ratio(spark, sf_dir)
    print(
        f"# sliding amplify-vs-slices: "
        + "; ".join(
            f"{k}: amplify {v['amplify_s']}s vs slices {v['slices_s']}s "
            f"(x{v['amplify_over_slices']})"
            for k, v in sliding_ratio.items()
        ),
        file=sys.stderr,
    )
    slstate = bench_sliding_state_rows(spark, sf_dir)
    print(
        f"# live sliding state rows at ratio 60: direct "
        f"{slstate['direct']['final_state_rows']} vs slices "
        f"{slstate['slices']['final_state_rows']} open rows after drain "
        f"(x{slstate['direct_over_slices_final']}; peaks "
        f"{slstate['direct']['peak_state_rows']}/"
        f"{slstate['slices']['peak_state_rows']})",
        file=sys.stderr,
    )

    streaming = bench_streaming_ingest(spark, float(sf))
    print(
        f"# streaming ingest: {streaming['events']} events in "
        f"{streaming['wall_s']:.1f}s = {streaming['events_per_sec']:.0f} events/s "
        f"(reference max tested: 579 orders/s)",
        file=sys.stderr,
    )
    streaming_skew = bench_streaming_ingest(spark, float(sf), skew=True)
    skew_ratio = round(
        streaming["events_per_sec"] / max(streaming_skew["events_per_sec"], 1e-9),
        3,
    )
    streaming_skew["uniform_over_skewed_throughput"] = skew_ratio
    print(
        f"# streaming ingest SKEWED (top key ~32% of traffic): "
        f"{streaming_skew['events_per_sec']:.0f} events/s — uniform/skewed "
        f"ratio {skew_ratio} (pre-shuffle partial agg absorbs the hotspot; "
        f"flag if > 1.5)",
        file=sys.stderr,
    )
    sscale = bench_streaming_scaling(spark, float(sf))
    print(f"# streaming scaling (state-store cost growth, both stores): "
          f"{json.dumps(sscale)}", file=sys.stderr)
    jscale = bench_streaming_join_scaling(spark, sf_dir)
    print(f"# stream-stream join scaling: {json.dumps(jscale)}",
          file=sys.stderr)
    jskew = bench_streaming_join_skew(spark, sf_dir)
    print(f"# stream-stream join skew (uniform vs power-law vs salted): "
          f"{json.dumps(jskew)}", file=sys.stderr)
    jchain = bench_streaming_chain(spark, sf_dir)
    print(f"# chained join→rollup vs join-only vs two-stage: "
          f"{json.dumps(jchain)}", file=sys.stderr)
    # continuity section for cross-round trend reads: the mid-size point of
    # the near-dup curve is what earlier rounds recorded as streaming_neardup
    neardup = {"docs": sscale["sizes"][1]}
    for store in ("hdfs", "rocksdb"):
        entry = sscale["neardup"].get(store, {})
        if entry.get("available"):
            mid = entry["curve"][1]
            neardup[store] = {
                "available": True,
                "wall_s": mid["wall_s"],
                "docs_per_sec": mid["docs_per_sec"],
                "matches": mid["matches"],
            }
        else:
            neardup[store] = {"available": False}
    scaling = bench_scaling(spark, headline, sf_dir, timings)
    if scaling["flagged"]:
        print(f"# SCALING FLAGS (alpha > {scaling['alpha_max_allowed']}): "
              f"{scaling['flagged']}", file=sys.stderr)
    elif scaling["alphas_computed"]:
        print(f"# scaling: no headline query exceeds alpha "
              f"{scaling['alpha_max_allowed']} (t ~ n^alpha over a "
              f"{scaling['step']:g}x step, {scaling['alphas_computed']} queries)",
              file=sys.stderr)
    else:
        print("# scaling: no reference scale below the main sf — "
              "alphas not computed", file=sys.stderr)
    latency = bench_e2e_latency(spark)
    print(
        f"# e2e latency: raw {latency['raw_visible_s']}s, "
        f"rollup {latency['rollup_visible_s']}s "
        f"(reference claim: < 2 s order → queryable)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 4)
    regressions = _regressions_vs_last_round(timings, float(sf))
    # Methodology self-documentation (round-14 VERDICT #7): any change to
    # HOW a number in this record is measured must be declared here for the
    # round that introduces it, so trend lines across rounds self-document.
    # r13 introduced two (disclosed in OPTIMIZATION_r13.md): the ingest
    # sections' two-trial min policy (so r12→r13 ingest ev/s is not
    # apples-to-apples) and the added quantity_dense ladder case. Round 14
    # changes nothing in any timed region: this list is empty.
    methodology_changed_this_round: list[str] = []
    methodology = {
        "changed_this_round": methodology_changed_this_round,
        "history": {
            "r13": ["ingest_two_trial_min", "ladder_quantity_dense_case"],
        },
    }
    # Confirmation pass (the direction of round-4 ADVICE: require the ratio
    # on two separate measurements): each flagged query is re-timed
    # (min-of-2) at the end of the run, in a different JVM window from the
    # measurement that flagged it. A flag that does not reproduce was a
    # transient — GC or co-tenant stall inside the first window, the
    # documented failure mode of sub-second timings on this host — and
    # moves to `noise_cleared` with its retry time recorded, so the gate
    # stays loud for real plan regressions (those reproduce) without
    # crying wolf every contended window.
    noise_cleared: list[dict] = []
    window_contended: list[dict] = []
    canary_retry = None
    if regressions:
        confirmed = []
        for entry in regressions:
            name = entry["query"]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                headline[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            entry["retry_s"] = round(best, 4)
            p = entry["prev_s"]
            if best > 1.3 * p and best - p > max(0.1, 0.3 * p):
                confirmed.append(entry)
            else:
                noise_cleared.append(entry)
        # Contention check on the confirmation window itself: if the fixed
        # pure-CPU canary ALSO slowed ≥1.3× vs the post-warm-up measurement,
        # co-tenant load is inflating every number in this window (observed:
        # retries coming back 2–3× WORSE than the flagged time — a real plan
        # regression reproduces at the same level, it does not keep growing).
        # Those flags are quarantined to `regressions_window_contended`
        # rather than recorded as confirmed reds; a real regression will
        # re-flag in the next clean window because the baseline BENCH record
        # it was compared against is only replaced by a parseable new one.
        if confirmed:
            canary_retry = _canary_time(spark)
            # Floor = the cleanest canary this host has shown: min of this
            # run's post-warm-up canary and the newest committed record's
            # (round-7 ADVICE — a contended warm-up window must not
            # legitimize an equally contended confirmation window).
            prior_floor = _prior_canary_floor(
                os.path.dirname(os.path.abspath(__file__))
            )
            clean_floor = min(
                [canary_first] + ([prior_floor] if prior_floor else [])
            )
            if canary_retry > 1.3 * clean_floor:
                window_contended = confirmed
                confirmed = []
        regressions = confirmed
    if regressions:
        print(f"# PERF REGRESSIONS vs last round: {regressions}", file=sys.stderr)
    if noise_cleared:
        print(f"# regression flags cleared on retry (transients): "
              f"{noise_cleared}", file=sys.stderr)
    if window_contended:
        print(f"# regression flags quarantined — confirmation window "
              f"contended (canary {canary_first:.3f}s -> {canary_retry:.3f}s):"
              f" {window_contended}", file=sys.stderr)
    # Round-1's headline set was these 7; the set has since widened, so the
    # stable cross-round trend signal is this subset total, not `value`.
    _R01_SET = (
        "topk_revenue_raw_24h", "rollup_1m", "topk_per_key", "pricing_summary",
        "top_customers", "cosine_topk", "q9_profit_by_nation_year",
    )
    r01_subset = round(sum(timings.get(n, 0.0) for n in _R01_SET), 4)

    # Two records (round-6 verdict item 2): the FULL detail goes to a
    # committed bench_r{N}_local.json (N = newest BENCH_r*.json at root + 1,
    # i.e. the round the driver is about to record); the final stdout line
    # is a COMPACT summary that must stay under the driver's 2 KB tail
    # capture — BENCH_r04–r06 all have parsed:null because the full record
    # outgrew it, which silently dropped three rounds of trend data.
    full = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "r01_subset_total": r01_subset,
        "sf": float(sf),
        "streaming_ingest": streaming,
        "streaming_ingest_skewed": streaming_skew,
        "streaming_neardup": neardup,
        "streaming_scaling": sscale,
        "streaming_join_scaling": jscale,
        "streaming_join_skew": jskew,
        "streaming_chain": jchain,
        "e2e_latency": latency,
        "serving_point_read": serve,
        "serving_trending": serve_trend,
        "serving_percentiles": serve_pct,
        "percentile_ladder": ladder,
        "serving_scaling": serve_scale,
        "quantile_state": qstate,
        "sliding_ratio": sliding_ratio,
        "sliding_state_rows": slstate,
        "scaling": scaling,
        "regressions": regressions,
        "regressions_noise_cleared": noise_cleared,
        "regressions_window_contended": window_contended,
        # Round-14 VERDICT #7 (additions-only): the retry-gate's clean
        # re-timings keyed by query, so a round-over-round comparator can
        # consume the harness's own noise discipline instead of first reads.
        "queries_retry": {
            e["query"]: e["retry_s"]
            for e in (regressions + noise_cleared + window_contended)
            if "retry_s" in e
        },
        "methodology": methodology,
        "canary_s": {
            "first": round(canary_first, 4),
            "retry": round(canary_retry, 4) if canary_retry else None,
        },
    }
    here = os.path.dirname(os.path.abspath(__file__))
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    detail_name = _detail_record_name(here, rounds)
    with open(os.path.join(here, detail_name), "w") as fh:
        json.dump(full, fh, indent=1)
    print(f"# full record written to {detail_name}", file=sys.stderr)

    print(_compact_summary(full, detail_name))
    spark.stop()


def _compact_summary(full: dict, detail_name: str) -> str:
    """The final stdout line: every cross-round trend signal (per-query
    timings for the regression gate, r01_subset_total, ingest, e2e, serving
    percentiles, scaling flags) in ≤ 1,500 bytes — the driver's tail capture
    is 2,000 chars, and BENCH_r04–r06 all lost their `parsed` record by
    printing the full document here. If the queries block ever grows the
    line past the budget, it is shed (the detail file carries it) rather
    than risking another truncated round. Pinned by
    tests/test_bench_contract.py."""
    jskew = full["streaming_join_skew"]
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": full["queries"],
        "r01_subset_total": full["r01_subset_total"],
        "sf": full["sf"],
        "ingest_eps": full["streaming_ingest"]["events_per_sec"],
        "ingest_skew_eps": full["streaming_ingest_skewed"]["events_per_sec"],
        "e2e_raw_s": full["e2e_latency"]["raw_visible_s"],
        "e2e_rollup_s": full["e2e_latency"]["rollup_visible_s"],
        "serve_p50_ms": full["serving_point_read"]["warm"]["p50_ms"],
        "serve_p99_ms": full["serving_point_read"]["warm"]["p99_ms"],
        "trending_p99_ms": full["serving_trending"]["preranked"]["p99_ms"],
        "trending_routed_p99_ms": full["serving_trending"]["routed"]["p99_ms"],
        "pctile_p99_ms": full["serving_percentiles"]["warm"]["p99_ms"],
        "ladder_ratio_qty": full["percentile_ladder"]["quantity"]["rows_ratio"],
        "ladder_ratio_rev": full["percentile_ladder"]["revenue_cents"][
            "rows_ratio"
        ],
        "ladder_ratio_dense": full["percentile_ladder"]["quantity_dense"][
            "rows_ratio"
        ],
        "ladder_speedup_dense": full["percentile_ladder"]["quantity_dense"][
            "routed_speedup"
        ],
        "serve_alpha_pct": full["serving_scaling"]
        .get("alphas", {})
        .get("percentiles_warm", {})
        .get("alpha"),
        "serve_alpha_trend_routed": full["serving_scaling"]
        .get("alphas", {})
        .get("trending_routed", {})
        .get("alpha"),
        "qstate_raw_over_blob": full["quantile_state"]["exact_large"][
            "raw_over_blob"
        ],
        "sliding_r60_amp_over_slices": full["sliding_ratio"]["1h_1m"][
            "amplify_over_slices"
        ],
        "sliding_r60_state_ratio": full["sliding_state_rows"][
            "direct_over_slices_final"
        ],
        "neardup_alpha_rocksdb": full["streaming_scaling"]["neardup"]
        .get("rocksdb", {})
        .get("alpha"),
        "join_alpha": full["streaming_join_scaling"]["alpha"],
        "join_skew_per_pair_ratio": jskew["skew_over_uniform_per_pair"],
        "join_skew_salted_ratio": jskew["salted_over_uniform_per_pair"],
        "join_hot_salted_speedup": jskew["hot"]["salted_speedup"],
        "chain_over_join_only": full.get("streaming_chain", {}).get(
            "chain_over_join_only"
        ),
        "scaling_flagged": len(full["scaling"]["flagged"])
        + len(full["streaming_scaling"]["flagged"])
        + len(full["streaming_join_scaling"]["flagged"])
        + len(jskew["flagged"])
        + len(full.get("streaming_chain", {}).get("flagged", [])),
        "regressions": full["regressions"],
        "noise_cleared": len(full["regressions_noise_cleared"]),
        "window_contended": len(full.get("regressions_window_contended", [])),
        "detail": detail_name,
    }
    # Round-14 VERDICT #7/#8 (additions-only — every pre-existing key above
    # is untouched): clean retry values per flagged query; per-query scaling
    # exponents over the sf ladder (t ~ n^alpha, sf0.01 → main step); a loud
    # methodology marker whenever a round changes how any number here is
    # measured (empty list ⇒ apples-to-apples with the previous round).
    retry = full.get("queries_retry", {})
    if retry:
        compact["queries_retry"] = retry
    meth = full.get("methodology", {}).get("changed_this_round", [])
    if meth:
        compact["methodology_changed"] = meth
    # per-query alphas as a LIST aligned with the `queries` map's key order
    # (names would repeat ~350 bytes; the detail file has the keyed form)
    pq = full.get("scaling", {}).get("per_query", {})
    alphas = [
        pq[n]["alpha"]
        for n in compact["queries"]
        if isinstance(pq.get(n), dict)
    ]
    if alphas and any(a is not None for a in alphas):
        compact["scaling_alpha"] = alphas
    line = json.dumps(compact)
    if len(line) > 1500:
        # shed order: the newest additions go first — the detail file
        # always carries them
        compact.pop("scaling_alpha", None)
        line = json.dumps(compact)
    if len(line) > 1500:
        compact.pop("queries_retry", None)
        line = json.dumps(compact)
    if len(line) > 1500:
        compact["queries"] = {"see": detail_name}
        line = json.dumps(compact)
    if len(line) > 1500:
        # many confirmed regressions: keep the signal (which queries, how
        # bad), drop the per-entry timings — the detail file has them
        compact["regressions"] = [
            {"query": r["query"], "ratio": r["ratio"]}
            for r in full["regressions"]
        ]
        line = json.dumps(compact)
    if len(line) > 1500:
        compact["regressions"] = len(full["regressions"])
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()
