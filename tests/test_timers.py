"""Event-time timer operator (streaming/timers.py::inactivity_expiry) —
timer-DRIVEN emission, the third emission class after data-driven and
window-close-driven (reference: ProcessFunctions.kt:43-56 event-time
timers). Pins:

- firing boundary: a timeout at T fires in the first micro-batch whose
  in-effect watermark STRICTLY exceeds T (wm == T does not fire) — the
  same probe-then-pin discipline as the outer-join deadlines;
- data beats timer: when a key's new event arrives in the very batch its
  timeout would fire, the group takes its DATA call, the timer resets,
  and no expiry is emitted;
- re-admission: after an expiry removes the state, a later event starts a
  fresh run (run_start/n_events reset) that can itself expire;
- the trailing availableNow flush batch fires due timers at end-of-stream,
  and keys whose gap has not elapsed emit nothing.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

T0 = 1_704_067_200_000
_M = 60_000
GAP = 10 * _M
DELAY = 20 * _M


def _wf(src: str, name: str, rows: list[dict], mtime: int) -> None:
    os.makedirs(src, exist_ok=True)
    p = os.path.join(src, name)
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (mtime, mtime))


def _drain(
    spark, tmp_path, name: str, batches: list[list[dict]], gap_ms: int = GAP
) -> list:
    from topk_spark.streaming.timers import inactivity_expiry

    src = str(tmp_path / f"src_{name}")
    out = str(tmp_path / f"out_{name}")
    for i, rows in enumerate(batches):
        _wf(src, f"b{i}.jsonl", rows, 1000 + i * 10)
    stream = (
        spark.readStream.schema("key string, ms long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .json(src)
        .withColumn("ts", F.timestamp_millis("ms"))
    )
    q = (
        inactivity_expiry(stream, gap_ms=gap_ms, watermark_delay="20 minutes")
        .writeStream.foreachBatch(
            lambda df, bid: df.withColumn("_bid", F.lit(int(bid)))
            .write.mode("append")
            .parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out):
        return []
    return sorted(
        (r["key"], r["run_start_ms"] - T0, r["last_ms"] - T0,
         r["n_events"], r["_bid"])
        for r in spark.read.parquet(out).collect()
    )


def test_timer_firing_boundary_is_strict(spark, tmp_path):
    """A's timeout T = last + gap. Batch 2's in-effect watermark == T
    exactly (must NOT fire); only the flush batch (wm = T + 1 ms) fires.
    B's timeout has not elapsed at the final watermark — no row."""
    t_exp = T0 + _M + GAP  # A: last event T0+1m
    batches = [
        [{"key": "A", "ms": T0}, {"key": "A", "ms": T0 + _M},
         {"key": "B", "ms": T0 + 5 * _M}],
        [{"key": "Z", "ms": t_exp + DELAY}],       # wm(next) == T exactly
        [{"key": "Z", "ms": t_exp + DELAY + 1}],   # wm(flush) == T + 1ms
    ]
    got = _drain(spark, tmp_path, "boundary", batches)
    # B's timeout: T0+5m+10m = T0+15m; final wm = T+1 = T0+11m+1ms < that.
    # Z's own runs: last Z at t_exp+delay+1, timeout far beyond final wm.
    assert got == [("A", 0, _M, 2, 3)]


def test_data_beats_timer_and_readmission(spark, tmp_path):
    """Three behaviors in one timeline (offsets in ms from T0; G = gap,
    D = watermark delay):

    - DATA BEATS TIMER: A@0's timeout (G) is first due in batch 2
      (wm = G+1), but A's second event arrives IN batch 2 -- the group
      takes its data call, the timer resets, and A later emits ONE merged
      run (run_start 0, n=2). A timer that fired would have produced two
      n=1 rows instead.
    - EXPIRY: C@0 has no batch-2 data -- it expires in batch 2.
    - RE-ADMISSION: C's batch-2 event starts a FRESH run (n resets to 1)
      which expires in the flush batch once the final watermark passes its
      own deadline."""
    g, d = GAP, DELAY
    a2 = g + d              # A's second event (>= batch-2 wm of g+1)
    c2 = g + d + 2          # C's re-admission event (batch 3)
    z2 = 2 * g + 2 * d + 3  # advancer: flush wm = 2g+d+3 > c2+g and a2+g
    batches = [
        [{"key": "A", "ms": T0}, {"key": "C", "ms": T0}],
        [{"key": "Z", "ms": T0 + g + d + 1}],  # batch-2 wm = g+1
        # batch 2: A's timer is due here but its data call wins; C has no
        # data and expires
        [{"key": "A", "ms": T0 + a2}],
        # batch 3: C re-admitted; advancer sets the flush watermark
        [{"key": "C", "ms": T0 + c2}, {"key": "Z", "ms": T0 + z2}],
    ]
    got = _drain(spark, tmp_path, "datawins", batches)
    # flush (bid 4) wm = z2 - d = 2g+d+3: A's reset timer (a2+g = 2g+d)
    # and C's second run (c2+g = 2g+d+2) are both due there; the advancer
    # key Z's merged run (timeout z2+g) is not.
    assert got == [
        ("A", 0, a2, 2, 4),
        ("C", 0, 0, 1, 2),
        ("C", c2, c2, 1, 4),
    ]


def test_overdue_alarm_clamps_instead_of_crashing(spark, tmp_path):
    """gap_ms < watermark delay + a LATE-but-admitted event (FMGWS does not
    filter below-watermark rows — measured here: the late row lands in the
    run, n=2) puts `run max + gap` UNDER the in-effect watermark. The raw
    setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP and kills the
    query (reproduced against the unclamped operator); the operator must
    instead clamp the overdue alarm to wm+1 so it fires at the next
    watermark advance.

    Timeline (gap G=5m, delay D=20m): A@0 and advancer Z@30m set batch-2's
    wm to +10m; batch 2 delivers A@+1m (late, admitted), whose timeout
    +6m <= wm → clamped to +10m+1ms; batch 3's advancer Z@40m leaves wm at
    +10m (== T−1ms, must NOT fire — the strict boundary holds for clamped
    timers too); the flush wm +20m fires the merged run."""
    g = 5 * _M
    batches = [
        [{"key": "A", "ms": T0}, {"key": "Z", "ms": T0 + 30 * _M}],
        [{"key": "A", "ms": T0 + _M}],  # late: in-effect wm = T0+10m
        [{"key": "Z", "ms": T0 + 40 * _M}],  # flush wm = T0+20m
    ]
    got = _drain(spark, tmp_path, "clamp", batches, gap_ms=g)
    # Z's merged run (timeout 40m+5m) is beyond the final wm — no row.
    assert got == [("A", 0, _M, 2, 3)]
