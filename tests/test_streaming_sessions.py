"""Streaming session windows: the streaming twin of the batch
`sessionize_events` query (SURVEY.md §2 T-session). Dynamic-gap session
aggregation is the one windowing built-in the other streaming tests don't
exercise: state merges windows as events arrive and a session finalizes
only once the event-time watermark passes its close — verified here by
feeding two micro-batches where the second's timestamps push the
watermark beyond every real session.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

EVT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("value_cents", LongType()),
        StructField("event_ms", LongType()),
    ]
)

T0 = 1_704_067_200_000  # 2024-01-01T00:00:00Z
S = 1000


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_session_window_finalizes_on_watermark(spark, tmp_path):
    """30 s gap sessions in append mode: three sessions (A×2 split by a
    120 s silence, B×1) finalize once a later event moves the watermark
    past their close; the watermark-pusher's own session stays open and
    must NOT be emitted."""
    src = str(tmp_path / "sessions_src")
    os.makedirs(src)
    _write_jsonl(
        os.path.join(src, "b0.jsonl"),
        [
            # user A, session 1: three events inside the 30 s gap
            {"user_id": "A", "value_cents": 100, "event_ms": T0},
            {"user_id": "A", "value_cents": 200, "event_ms": T0 + 10 * S},
            {"user_id": "A", "value_cents": 300, "event_ms": T0 + 25 * S},
            # user A, session 2: after a 120 s silence
            {"user_id": "A", "value_cents": 400, "event_ms": T0 + 145 * S},
            # user B: singleton session
            {"user_id": "B", "value_cents": 500, "event_ms": T0 + 5 * S},
        ],
    )
    _write_jsonl(
        os.path.join(src, "b1.jsonl"),
        # watermark pusher: far-future event whose own session stays open
        [{"user_id": "C", "value_cents": 1, "event_ms": T0 + 600 * S}],
    )
    stream = (
        spark.readStream.schema(EVT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.timestamp_millis("event_ms"))
        .withWatermark("ts", "10 seconds")
    )
    sessions = stream.groupBy(
        F.session_window("ts", "30 seconds").alias("w"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("cents"),
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("finalized_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["user_id"], r["w"]["start"].isoformat(), r["n_events"], r["cents"])
        for r in spark.table("finalized_sessions").collect()
    }
    assert rows == {
        ("A", "2024-01-01T00:00:00", 3, 600),
        ("A", "2024-01-01T00:02:25", 1, 400),
        ("B", "2024-01-01T00:00:05", 1, 500),
    }
    # session end = last event + gap (dynamic close, not a fixed grid)
    ends = {
        (r["user_id"], r["w"]["start"].isoformat()): r["w"]["end"].isoformat()
        for r in spark.table("finalized_sessions").collect()
    }
    assert ends[("A", "2024-01-01T00:00:00")] == "2024-01-01T00:00:55"
    assert ends[("B", "2024-01-01T00:00:05")] == "2024-01-01T00:00:35"
