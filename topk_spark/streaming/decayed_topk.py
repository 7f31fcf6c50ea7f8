"""Continuous time-decayed revenue state: per (event_type, user) bucket
sums under a power-of-2 half-life decay — the recency-weighted variant of
the continuous top-k (reference: ProcessFunctions.kt:62-134 keeps the
bounded per-key heap; a live leaderboard usually wants "top spenders
NOW", not all-time).

Decay model (integer-exact, engine-portable): time is bucketed by a
half-life HL, and a bucket b's revenue contributes `sum_b >> (Bmax - b)`
at read time — weight halves per elapsed half-life. Crucially the decay
is applied to PER-BUCKET SUMS, never per event: floor division does not
distribute over addition, so "sum then shift" is the one formulation a
relational oracle, a batch query, and incrementally-maintained streaming
state can all agree on bit-for-bit. The state itself is decay-FREE
(bucket -> exact sum), which is what makes it restart-safe and
order-invariant: decay happens at finalize, relative to whatever Bmax
the read observes.

State bound: buckets more than 62 half-lives behind the key's newest are
pruned — their finalize shift is >= 63, which the finalize caps to a zero
contribution (a BIGINT sum is < 2^63), so pruning is lossless by
construction. State is therefore <= 63 (bucket, sum) pairs per key
regardless of traffic or retention.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: finalize shift at or beyond this is defined as zero contribution; the
#: state prunes buckets whose PER-KEY shift already reaches it (per-key
#: max <= global max, so the global shift can only be larger).
ZERO_SHIFT = 63

BUCKETS_OUTPUT = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("user_id", LongType(), False),
        StructField("bucket", LongType(), False),
        StructField("w_sum", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("buckets_json", StringType(), True)])


def streaming_decayed_buckets(stream: DataFrame) -> DataFrame:
    """Maintain per-(event_type, user_id) exact bucket sums over a stream
    carrying (event_type, user_id, bucket, w) columns. Emits the group's
    full current bucket map every touched micro-batch (update mode);
    drains keep the last emission per group and finalize the decay
    batch-side against the observed global max bucket."""

    def merge(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur: dict[int, int] = (
            {int(b): int(s) for b, s in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            # vectorized per chunk (C-speed groupby-sum), then one merge of
            # the <=63-entry partial into state — never a per-row Python
            # loop on the hot path (same treatment as the CDC fold)
            for b, w in pdf.groupby("bucket")["w"].sum().items():
                cur[int(b)] = cur.get(int(b), 0) + int(w)
        if cur:
            horizon = max(cur) - (ZERO_SHIFT - 1)
            cur = {b: s for b, s in cur.items() if b >= horizon}
        state.update((json.dumps(cur),))
        n = len(cur)
        yield pd.DataFrame(
            {
                "event_type": pd.Series([key[0]] * n, dtype="object"),
                "user_id": pd.Series([key[1]] * n, dtype="int64"),
                "bucket": pd.Series(list(cur), dtype="int64"),
                "w_sum": pd.Series(list(cur.values()), dtype="int64"),
            }
        )

    return stream.select(
        "event_type", "user_id", "bucket", "w"
    ).groupBy("event_type", "user_id").applyInPandasWithState(
        merge,
        BUCKETS_OUTPUT,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
