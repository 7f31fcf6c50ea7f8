"""Continuous KMV distinct sketch: the k-minimum-values state of
`ops/kmv.py` maintained per group over a stream — the deterministic
sibling of `stream_hll_distinct_drain` (workload/heavyhitter_queries.py).

Why it earns its place next to the HLL drain: HLL's binary registers
force the driver gate down to an error-BOUND boolean, while the KMV
state ("k smallest distinct u48 hashes so far") is a pure deterministic
function of the set of rows seen — independent of arrival order, batch
boundaries, replays, and restarts — so the streaming drain, its restart
twin, AND the batch query all hash against ONE DuckDB oracle verbatim.
A continuous engine gets its distinct-count read under the same
exact-value check as everything else.

State: <= k int64 values per group (k=64 -> ~0.5 KiB), regardless of
traffic. Per-batch work: merge-dedup-truncate against <= k retained
values. A replayed row deduplicates into the same hash — at-least-once
delivery cannot move the estimate.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SKETCH_OUTPUT = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("u", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("kmins_json", StringType(), True)])


def streaming_kmv_sketch(stream: DataFrame, k: int = 64) -> DataFrame:
    """Maintain the per-`event_type` bottom-k distinct `u` values over a
    stream carrying (event_type, u). Emits the group's full current
    k-value set every touched micro-batch (update mode); drains keep the
    last emission per group and estimate batch-side via
    `ops.kmv.kmv_estimate`."""

    def merge(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur: set[int] = (
            set(json.loads(state.get[0])) if state.exists else set()
        )
        for pdf in pdfs:
            # truncate per chunk: the working set stays O(k + chunk), never
            # O(distinct-in-stream) — the invariant the module docstring
            # states ("merge-dedup-truncate against <= k retained")
            cur.update(int(u) for u in pdf["u"].tolist())
            if len(cur) > k:
                cur = set(sorted(cur)[:k])
        kept = sorted(cur)[:k]
        state.update((json.dumps(kept),))
        yield pd.DataFrame(
            {
                "event_type": pd.Series([key[0]] * len(kept), dtype="object"),
                "u": pd.Series(kept, dtype="int64"),
            }
        )

    return stream.select("event_type", "u").groupBy(
        "event_type"
    ).applyInPandasWithState(
        merge,
        SKETCH_OUTPUT,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
