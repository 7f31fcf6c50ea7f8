"""Continuous weighted priority sampling: the batch
`weighted_priority_sample` (workload/sampling_queries.py — Duffield-Lund-
Thorup priority sampling with the repo's deterministic md5 uniform) kept
as bounded streaming state, so a weight-proportional corpus sample exists
at every moment of an ingest instead of being recomputed over history.

This is the sampling member of the continuous-summary family
(top-k: streaming/continuous_topk.py; frequency: streaming/
heavyhitters.py; distinct/rank: workload/heavyhitter_queries.py drains):
per group, state is the top-m priorities seen so far — m rows of
(priority, doc_id, weight), nothing else, regardless of traffic. Because
"top-m of a fixed deterministic priority" is arrival-order invariant and
idempotent under replay, the drained result equals the batch query
verbatim — which is exactly what lets the driver gate this stateful
operator against the same relational oracle as its batch twin.

Scale: priorities are computed map-side BEFORE the stateful operator
(md5 + integer arithmetic, whole-stage codegen; only the 4 sample columns
ever shuffle — document text stays behind). The per-batch stateful work
is merge-two-sorted-lists capped at m; a duplicate arrival (source replay)
is absorbed by the merge's doc_id dedup, so delivery is effectively
exactly-once at the sample level even from an at-least-once source.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SAMPLE_OUTPUT = StructType(
    [
        StructField("source", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("weight", LongType(), False),
        StructField("priority", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("sample_json", StringType(), True)])


def streaming_priority_sample(stream: DataFrame, m: int = 5) -> DataFrame:
    """Maintain the per-`source` top-m priority sample over a stream that
    already carries (source, doc_id, weight, priority) columns. Emits the
    group's full current sample every micro-batch it is touched (update
    mode); drains keep the last emission per source."""

    def merge(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # state: {doc_id: [priority, weight]} — keyed by doc_id so a
        # replayed document can never occupy two sample slots.
        cur: dict[int, list[int]] = (
            {int(d): v for d, v in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        for pdf in pdfs:
            for d, w, p in zip(
                pdf["doc_id"].tolist(),
                pdf["weight"].tolist(),
                pdf["priority"].tolist(),
            ):
                cur[int(d)] = [int(p), int(w)]
        top = sorted(cur.items(), key=lambda kv: (-kv[1][0], kv[0]))[:m]
        cur = dict(top)
        state.update((json.dumps(cur),))
        yield pd.DataFrame(
            {
                "source": pd.Series([key[0]] * len(top), dtype="object"),
                "doc_id": pd.Series([d for d, _ in top], dtype="int64"),
                "weight": pd.Series([v[1] for _, v in top], dtype="int64"),
                "priority": pd.Series([v[0] for _, v in top], dtype="int64"),
            }
        )

    return stream.select(
        "source", "doc_id", "weight", "priority"
    ).groupBy("source").applyInPandasWithState(
        merge,
        SAMPLE_OUTPUT,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
