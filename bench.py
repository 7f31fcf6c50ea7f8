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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from topk_spark.session import get_spark
from topk_spark.workload import load_all


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

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
