"""Continuous CDC last-value materialization: the current row per key,
maintained as streaming state — the LAST-seen complement of the
first-seen dedup (`streaming/stateful_dedup.py`), and the live form of
the reference's Pinot upsert table (orders_raw_upsert_table.json: latest
row per primary key wins at query time).

The property that makes this an operator rather than a reduction:
a LATE update (out-of-order arrival whose event time precedes the
currently materialized row) must NOT regress the row. That requires the
state to carry the materialized (ts, event_id) high-water pair per key
and compare every arrival against it — a per-batch fold without state
would happily let a stale replay overwrite a newer value. Total order:
(ts_us, event_id), the repo's standard deterministic tiebreak.

State: one small row per key (timestamps + the carried columns),
independent of update volume; an exact replay (same ts, event_id)
compares not-greater and is ignored, so at-least-once delivery is
absorbed. Emission: update mode, the key's current row each touched
micro-batch; drains keep the last emission per key.

Retention (opt-in, default off): without it the state is one row per key
FOREVER (`GroupStateTimeout.NoTimeout`), which an unbounded key universe
(event_id-keyed CDC, say) grows without limit. `retention_ms` mirrors the
reference's bounded raw surface (orders_raw_upsert_table.json:10-12 — 7-day
retention on the upsert table): a key whose materialized row goes
`retention_ms` past its event time without a newer update is DROPPED from
state via an event-time timeout (the timer semantics measured in
streaming/timers.py — fires at the first watermark strictly past the
deadline, clamped to wm+1 when already due so a late-but-admitted update
can never crash the query).

Eviction is OBSERVATIONALLY FREE — measured, not assumed
(tests/test_cdc_lastvalue.py): Spark's stateful operators drop input rows
below the LATE-EVENTS watermark (the previous micro-batch's watermark;
probed — a row under it never reaches the operator, while a row between it
and the current watermark is admitted, which is exactly why the timeout
clamp above is needed). Any row admitted after a key's eviction therefore
has ts >= late_wm(now) >= wm(at eviction) > evicted_high_water + retention,
i.e. it is STRICTLY newer than the evicted high-water and would have
replaced it even with state intact. So turning retention on can never
change emitted rows relative to NoTimeout — it only bounds state (the
pytest pins byte-identical finals plus numRowsRemoved > 0) — and the
stale-replay suppression guarantee survives eviction because a regressing
replay is dropped at the door before the operator ever sees it. At 100 TB
with open-ended key domains, turn it on.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LASTVALUE_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("last_ts_ms", LongType(), False),
        StructField("last_event_id", LongType(), False),
        StructField("last_event_type", StringType(), False),
        StructField("last_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType([StructField("row_json", StringType(), True)])


def streaming_cdc_lastvalue(
    stream: DataFrame,
    retention_ms: int | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Maintain the latest (by (ts_us, event_id)) event per user over a
    stream carrying (user_id, ts_us, event_id, event_type, value).

    `retention_ms`: optional event-time eviction horizon (see module
    docstring). Requires `watermark_delay` — the event-time timeout needs a
    watermark, declared here on a timestamp view of `ts_us`."""
    if (retention_ms is None) != (watermark_delay is None):
        raise ValueError(
            "retention_ms and watermark_delay go together: the eviction "
            "horizon is an event-time timeout, which needs a declared "
            "watermark to fire against"
        )

    def merge(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if retention_ms is not None and state.hasTimedOut:
            # retention drop: the row ages out of state exactly as a Pinot
            # retention-bounded row leaves the table — no tombstone emission
            state.remove()
            return
        cur = json.loads(state.get[0]) if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # vectorized per chunk (C-speed sort), ONE comparison against
            # state — never a per-row Python loop on the hot path
            top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
            cand = [
                int(top["ts_us"]),
                int(top["event_id"]),
                str(top["event_type"]),
                None if pd.isna(top["value"]) else float(top["value"]),
            ]
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
        if cur is None:  # state absent and every chunk empty: nothing to do
            return
        state.update((json.dumps(cur),))
        if retention_ms is not None:
            # evict when the materialized row's EVENT time goes retention_ms
            # stale; clamp an already-due deadline to wm+1 (the timers.py
            # lesson: setTimeoutTimestamp below the watermark raises)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[0] // 1000 + retention_ms, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "last_ts_ms": pd.Series([cur[0] // 1000], dtype="int64"),
                "last_event_id": pd.Series([cur[1]], dtype="int64"),
                "last_event_type": pd.Series([cur[2]], dtype="object"),
                "last_value": pd.Series([cur[3]], dtype="float64"),
            }
        )

    src = stream.select("user_id", "ts_us", "event_id", "event_type", "value")
    if retention_ms is not None:
        import pyspark.sql.functions as F

        src = src.withColumn("ts", F.timestamp_micros("ts_us")).withWatermark(
            "ts", watermark_delay
        )
    return src.groupBy("user_id").applyInPandasWithState(
        merge,
        LASTVALUE_OUTPUT,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout
        if retention_ms is None
        else GroupStateTimeout.EventTimeTimeout,
    )
