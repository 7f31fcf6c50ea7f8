"""Event-time TIMER-driven emission (T7 as a real operator, not an analog).

The reference registers per-key event-time timers
(`ProcessFunctions.kt:43-56`: `registerEventTimeTimer(ts + retention)`,
`onTimer` fires when the watermark passes it). Most of what the reference
USES timers for — state cleanup — maps to Spark's watermark eviction and
needs no operator. What has no built-in analog is timer-driven OUTPUT: a
record emitted because time passed with NO data (inactivity alerts,
session-close notifications, SLA breach events). Every other emission
class in this engine is data-driven (a row arrives) or window-driven (a
watermark closes a pre-declared window); this operator completes the
triple with watermark-fires-a-per-key-alarm.

`inactivity_expiry`: per key, keep (run start, last event time, event
count) in GroupState and an event-time timeout at `last_ts + gap`. A batch
where the key receives data resets the timeout (Spark semantics: a group
gets EITHER its data call OR its timeout call in a micro-batch, never
both — newly arrived data always wins). A batch where the watermark
passes the timeout with no new data fires the alarm: one expiry row
(key, run_start, last_ts, n_events) is emitted and the state is REMOVED —
the next event for that key starts a fresh run, so a key can expire any
number of times (the re-admission twin of stateful dedup's TTL).

Timeout firing boundary (measured, tests/test_timers.py): a timeout set
to T fires in the first micro-batch whose in-effect watermark (ms) is
STRICTLY greater than T — wm == T does not fire. availableNow's trailing
no-data flush batch participates, so end-of-stream cashes out every due
alarm; keys whose gap has not elapsed at the final watermark emit nothing.

At 100 TB: state is O(live keys) × a 3-field record; timers ride the
state store (they restore across restarts with it), and expiry output is
bounded by input arrivals (at most one alarm per run). The operator
shuffles once on the key, same as any keyed stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

EXPIRY_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("run_start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("run_start_ms", LongType(), True),
        StructField("last_ms", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def inactivity_expiry(
    events: DataFrame, *, gap_ms: int, watermark_delay: str
) -> DataFrame:
    """Streaming DF with columns (key string, ts timestamp, ms long — the
    event time in epoch millis, duplicated as a long so the fold needs no
    tz-dependent conversion) → one expiry row per (key, run) when the
    watermark passes `last event + gap_ms` without new data. Append mode.

    The watermark is declared HERE on `ts` (required for
    EventTimeTimeout); `ms` must equal unix_millis(ts)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            run_start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k],
                    "run_start_ms": [run_start],
                    "last_ms": [last],
                    "n_events": [n],
                }
            )
            return
        run_start, last, n = (state.get) if state.exists else (None, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            mx, mn = int(pdf["ms"].max()), int(pdf["ms"].min())
            run_start = mn if run_start is None else min(run_start, mn)
            last = mx if last is None else max(last, mx)
            n += len(pdf)
        state.update((run_start, last, n))
        # An already-due alarm (run max + gap_ms at/under the in-effect
        # watermark — reachable whenever gap_ms < the watermark delay, since
        # admitted-but-late rows carry ts below wm) must CLAMP, not crash:
        # setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP below the
        # watermark. Clamping to wm+1 keeps the measured firing rule
        # "fires in the first batch whose wm is strictly greater than T"
        # while making the overdue alarm fire at the next watermark advance
        # — the earliest moment timer output can exist at all.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        # data batches emit nothing — output is timer-driven only

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=EXPIRY_OUTPUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
