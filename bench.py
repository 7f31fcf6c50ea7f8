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
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from topk_spark.session import get_spark
from topk_spark.workload import load_all


def _synth_order_events(spark, out_dir: str, n: int, partitions: int = 32) -> None:
    """Deterministic OrderEvent JSONL (no RNG — every column derives from
    xxhash64(id)), ~1% exact duplicates, ≤5s out-of-order jitter. Generated
    distributed and written as `partitions` text files so the file source
    has parallelism to consume."""
    item = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500))
    df = (
        spark.range(n).repartition(partitions)
        .select(
            # ~1% of ids emit the previous id's event again → real duplicates.
            F.concat(
                F.lit("EVT"),
                (F.col("id") - (F.pmod(F.col("id"), F.lit(97)) == 0).cast("long"))
            ).alias("event_id"),
            F.concat(F.lit("ORD"), F.col("id")).alias("order_id"),
            F.concat(F.lit("CUST"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000)))
            .alias("customer_id"),
            F.concat(F.lit("REST"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)))
            .alias("restaurant_id"),
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


def bench_streaming_ingest(spark, sf: float) -> dict:
    """End-to-end Structured Streaming ingest throughput: JSON parse →
    watermarked first-seen dedup → raw parquet, then raw → 1-min rollup
    parquet (the full SURVEY §3.2 pipeline, availableNow trigger).

    The reference's headline is 579 orders/s max tested through the
    equivalent Flink topology (BASELINE.md) — this prints the same unit."""
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
        src = os.path.join(work, "input")
        _synth_order_events(spark, src, n)

        t0 = time.perf_counter()
        deduped = build_dedup_stream(
            read_json_file_stream(spark, src, ORDER_EVENT)
        )
        q1 = start_raw_sink(
            deduped,
            os.path.join(work, "raw"),
            os.path.join(work, "ckpt_raw"),
            available_now=True,
        )
        q1.awaitTermination()
        q2 = start_rollup_from_raw(
            spark,
            os.path.join(work, "raw"),
            os.path.join(work, "rollup"),
            os.path.join(work, "ckpt_rollup"),
            available_now=True,
        )
        q2.awaitTermination()
        wall = time.perf_counter() - t0
        return {
            "events": n,
            "wall_s": round(wall, 4),
            "events_per_sec": round(n / wall, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


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
    print("# warm-up pass done; timing steady-state runs", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, q in headline.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    streaming = bench_streaming_ingest(spark, float(sf))
    print(
        f"# streaming ingest: {streaming['events']} events in "
        f"{streaming['wall_s']:.1f}s = {streaming['events_per_sec']:.0f} events/s "
        f"(reference max tested: 579 orders/s)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "streaming_ingest": streaming,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
