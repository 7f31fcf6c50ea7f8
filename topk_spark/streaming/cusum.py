"""Streaming CUSUM drift detector — the stateful twin of the batch
`cusum_changepoint` query (workload/changepoint_queries.py).

Batch CUSUM centers on the series' own mean; a STREAM cannot know its mean
yet, so the streaming form runs the textbook control chart against a FIXED
reference target μ and alarm threshold h (both calibrated from a reference
period, as Page's original procedure prescribes):

    S ← max(0, S + (x − μ)),   alarm ⇔ S > h

Per-key state is a single BIGINT (the running S in cents) plus a row
count; each micro-batch folds its rows in event-time order (sorted inside
the batch — the fold is order-sensitive, and arrival order across a
shuffle is not deterministic, so the within-batch sort pins it), then
emits one row per key per batch with the post-batch statistic and alarm
flag. Exactly the `applyInPandasWithState` shape of the engine's other
stateful operators (dedup, continuous top-k): hash-partitioned per-key
state, O(batch rows) work per key, state size independent of history.

Caveat shared with every streaming CUSUM: events arriving across
micro-batch boundaries out of event-time order fold in arrival-batch
order (state cannot be rewound); within a batch, order is exact. A
watermarked upstream keeps that divergence bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "s long, n long"
_OUT_SCHEMA = (
    "key string, batch_rows long, n_total long, cusum long, alarm boolean"
)


def cusum_stateful(
    stream: DataFrame,
    target_cents: int,
    h_cents: int,
    key: str = "event_type",
    value_col: str = "cents",
    order_col: str = "timestamp",
) -> DataFrame:
    """One-sided upward CUSUM per key over a stream of integer values.

    Emits (key, batch_rows, n_total, cusum, alarm) once per key per
    micro-batch. Pair with outputMode("update")."""

    def _update(
        group_key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, n = state.get if state.exists else (0, 0)
        batch_rows = 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(order_col)
        for x in rows[value_col]:
            s = max(0, s + int(x) - target_cents)
        batch_rows = len(rows)
        n += batch_rows
        state.update((int(s), int(n)))
        yield pd.DataFrame(
            {
                "key": [group_key[0]],
                "batch_rows": [batch_rows],
                "n_total": [n],
                "cusum": [int(s)],
                "alarm": [s > h_cents],
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
