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


def streaming_cdc_lastvalue(stream: DataFrame) -> DataFrame:
    """Maintain the latest (by (ts_us, event_id)) event per user over a
    stream carrying (user_id, ts_us, event_id, event_type, value)."""

    def merge(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = json.loads(state.get[0]) if state.exists else None
        for pdf in pdfs:
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
        state.update((json.dumps(cur),))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "last_ts_ms": pd.Series([cur[0] // 1000], dtype="int64"),
                "last_event_id": pd.Series([cur[1]], dtype="int64"),
                "last_event_type": pd.Series([cur[2]], dtype="object"),
                "last_value": pd.Series([cur[3]], dtype="float64"),
            }
        )

    return stream.select(
        "user_id", "ts_us", "event_id", "event_type", "value"
    ).groupBy("user_id").applyInPandasWithState(
        merge,
        LASTVALUE_OUTPUT,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
