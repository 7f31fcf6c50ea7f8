"""Streaming CUSUM (streaming/cusum.py): the stateful control chart must
equal the textbook sequential recursion replayed in Python over the same
event-time-ordered value stream, with state carried across micro-batches
and across a checkpoint restart."""

from __future__ import annotations

import json
import os

import pandas as pd

from topk_spark.streaming.cusum import cusum_stateful

_SCHEMA = "event_type string, cents long, timestamp long"
_TARGET = 100
_H = 250


def _write_batch(src: str, i: int, rows: list[dict]) -> None:
    os.makedirs(src, exist_ok=True)
    p = os.path.join(src, f"batch_{i:03d}.json")
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (1000 + i, 1000 + i))


def _drain(spark, tmp_path, src: str) -> pd.DataFrame:
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = os.path.join(str(tmp_path), "out")
    q = (
        cusum_stateful(stream, target_cents=_TARGET, h_cents=_H)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).toPandas()


def _reference(values: list[int]) -> int:
    s = 0
    for x in values:
        s = max(0, s + x - _TARGET)
    return s


def test_streaming_cusum_equals_recursion_across_batches(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    # two keys, values arriving over three micro-batches, in-batch shuffled
    # timestamps (the operator must sort by event time inside each batch)
    batches = [
        [
            {"event_type": "a", "cents": 180, "timestamp": 2},
            {"event_type": "a", "cents": 90, "timestamp": 1},
            {"event_type": "b", "cents": 100, "timestamp": 1},
        ],
        [
            {"event_type": "a", "cents": 250, "timestamp": 3},
            {"event_type": "b", "cents": 40, "timestamp": 2},
        ],
        [
            {"event_type": "a", "cents": 300, "timestamp": 4},
            {"event_type": "b", "cents": 500, "timestamp": 3},
        ],
    ]
    for i, rows in enumerate(batches):
        _write_batch(src, i, rows)
    got = _drain(spark, tmp_path, src)

    ordered = {
        "a": [90, 180, 250, 300],  # event-time order
        "b": [100, 40, 500],
    }
    for key, vals in ordered.items():
        rows = got[got["key"] == key].sort_values("n_total")
        assert int(rows["cusum"].iloc[-1]) == _reference(vals)
        assert int(rows["n_total"].iloc[-1]) == len(vals)
        assert bool(rows["alarm"].iloc[-1]) == (_reference(vals) > _H)
    # intermediate state after batch 0 for 'a': fold [90, 180] (sorted!)
    a0 = got[(got["key"] == "a") & (got["n_total"] == 2)]
    assert int(a0["cusum"].iloc[0]) == _reference([90, 180])


def test_streaming_cusum_state_survives_restart(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    _write_batch(src, 0, [{"event_type": "a", "cents": 400, "timestamp": 1}])
    first = _drain(spark, tmp_path, src)
    assert int(first["cusum"].iloc[-1]) == 300
    # new file, SAME checkpoint: a fresh query resumes the 300 state
    _write_batch(src, 1, [{"event_type": "a", "cents": 50, "timestamp": 2}])
    second = _drain(spark, tmp_path, src)
    final = second[second["n_total"] == 2]
    assert int(final["cusum"].iloc[0]) == max(0, 300 + 50 - _TARGET)


def test_streaming_matches_batch_cusum_in_scaled_units(spark, tmp_path, sf_dir):
    """Batch cusum_changepoint centers on the series' own mean by scaling
    deviations by n (d_t = n·x_t − total). Feeding the streaming operator
    the SAME scaled stream (values n·cents, target = total) must reproduce
    the batch chart's final statistic exactly — the streaming/batch
    equivalence pin."""
    import pyspark.sql.functions as F

    from topk_spark.workload import load_all

    batch = load_all()["cusum_changepoint"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in batch:
        by_type.setdefault(r["event_type"], []).append(r)
    # replay one series through the streaming operator in scaled units
    et, series = sorted(by_type.items())[0]
    series.sort(key=lambda r: r["d"])
    n = len(series)
    total = sum(r["cents"] for r in series)
    src = os.path.join(str(tmp_path), "src")
    rows = [
        {"event_type": et, "cents": n * r["cents"], "timestamp": i}
        for i, r in enumerate(series)
    ]
    # split across two micro-batches to exercise state carry-over
    _write_batch(src, 0, rows[: n // 2])
    _write_batch(src, 1, rows[n // 2 :])
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    from topk_spark.streaming.cusum import cusum_stateful

    out = os.path.join(str(tmp_path), "out")
    q = (
        cusum_stateful(stream, target_cents=total, h_cents=0)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.read.parquet(out)
        .orderBy(F.desc("n_total"))
        .limit(1)
        .collect()[0]
    )
    assert int(got["cusum"]) == int(series[-1]["cusum_scaled"])
