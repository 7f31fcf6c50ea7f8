"""Frontier-named tier layout — the idempotent-append convention shared by
the live drains (workload/streaming_drain_queries.py trending tier,
workload/heavyhitter_queries.py percentile tier) and the serving routers
(serve/router.py).

A materializing foreachBatch writes each batch's rows to ONE subdirectory
named by the batch's watermark frontier, ``upto_<W>/`` (W = the max closed
window end in the batch, strictly increasing across non-empty batches).
That one convention buys three properties at once:

- **idempotent retry**: a foreachBatch retry re-derives the same W and
  overwrites its own subdirectory instead of duplicating rows — the same
  guarantee a production tier gets from partition overwrite (the reference's
  segment-replacement discipline, MergeRollupTask semantics in
  orders_1m_rollup_table.json:72-84);
- **O(#batches) frontier recovery**: the committed frontier is
  ``max(<W> over subdir names)`` — one directory listing, never a scan of
  tier data (which grows with history);
- **retry-safe frontier derivation**: a retrying batch must EXCLUDE its own
  ``upto_<W_cur>`` directory (written by the failed attempt) when deriving
  the previous frontier, or it would see ``W_prev == W_cur`` and silently
  emit nothing — pass ``below=W_cur`` (round-11 ADVICE, the at-most-once
  hole in the trending drain's first frontier derivation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_PREFIX = "upto_"


def tier_frontier(tier_dir: str, below: int | None = None) -> int | None:
    """The committed frontier of a ``upto_<W>`` tier directory: max W over
    subdir names, or None if the tier is empty/absent. With ``below=W_cur``,
    only frontiers strictly below W_cur count — the retry-safe form a batch
    that is ABOUT to write ``upto_<W_cur>`` (or may already have, on a
    retry) must use to find its predecessor."""
    if not os.path.isdir(tier_dir):
        return None
    ends = [
        int(d[len(_PREFIX):])
        for d in os.listdir(tier_dir)
        if d.startswith(_PREFIX) and d[len(_PREFIX):].lstrip("-").isdigit()
    ]
    if below is not None:
        ends = [e for e in ends if e < below]
    return max(ends) if ends else None


def append_upto(df: DataFrame, tier_dir: str, w_cur: int, n_files: int = 1) -> None:
    """Idempotently append one batch's rows as ``tier_dir/upto_<w_cur>/``
    (overwrite mode — a retry replaces its own subdir). ``n_files=1`` is the
    single-writer local form; a production writer passes its shuffle
    parallelism and lets each task write its own part file."""
    df.coalesce(n_files).write.mode("overwrite").parquet(
        os.path.join(tier_dir, f"{_PREFIX}{w_cur}")
    )


def read_tier(spark, tier_dir: str, schema) -> DataFrame:
    """Read a frontier-named tier: one flat dir of per-batch subwrites,
    recursed. The explicit schema keeps a concurrently-appending reader
    stable (no inference race with a subdir mid-write)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema(schema)
        .parquet(tier_dir)
    )
