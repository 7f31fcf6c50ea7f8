"""Watermarked stream-stream interval join — the reusable operator API.

The reference's pipeline enriches each keyed event against other live
events of the same key (TopKStreamingJob.kt's keyed co-processing stage);
in Spark the native expression of that is a stream-stream join on
`StreamingSymmetricHashJoinExec`: both sides hash-partition on the equality
key, buffer rows in co-partitioned state stores, and probe the other
side's buffer as micro-batches arrive. The time-range condition is what
makes the state BOUNDED: Spark derives state watermark predicates from it,
so the left buffer retains only rows younger than `watermark − window` and
the right buffer only rows the left window can still reach.

Semantics (pinned under the driver gate by
`workload/streaming_join_queries.py`):
- inner: a pair is emitted in the micro-batch where its LATER leg arrives;
  earlier-leg state must survive intervening batches.
- left_outer: a never-matched left row is emitted null-joined in the first
  micro-batch whose in-effect watermark passes `left_ts + window`
  (including the trailing no-data flush batch availableNow triggers);
  left rows still inside their window at end-of-stream stay buffered and
  produce nothing.

At 100 TB: state per partition is (input rate × window × key share); skew
concentrates on hot keys, which AQE cannot fix in streaming — pre-salting
the equality key (ops-level, both sides identically) is the lever, same as
the batch `salted_skew_join`. `salt_buckets` implements it: the left side
gets a deterministic per-row salt, the right side is replicated once per
salt value, and the join key becomes (key, salt) — a hot key's probe and
emission work then spreads over `salt_buckets` state-store partitions
instead of serializing on one, at the cost of ×salt right-side state.
Each (left, right) pair still joins exactly once (the left row carries ONE
salt; only the matching right replica satisfies the condition), so inner
results are unchanged and left-outer null-emission policy is untouched.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window: str,
    watermark_delay: str,
    how: str = "inner",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Join two STREAMING DataFrames on `left_key == right_key` where
    `right_time` falls inside `[left_time, left_time + window)`. Both sides
    get `watermark_delay` watermarks on their time columns (required for
    bounded state and for left_outer emission). Key/time columns are named
    (not Column objects) so the condition resolves against the watermarked
    plans, never a stale pre-watermark lineage.

    `window` / `watermark_delay` are Spark interval strings ("7 days").
    `how` is "inner" or "left_outer". `salt_buckets` (optional) pre-salts
    the equality key to spread a hot key over that many partitions — result
    rows are identical to the unsalted join (module docstring has the
    argument); use when one key carries a large traffic share."""
    if salt_buckets is not None and salt_buckets > 1:
        # The result-invariance argument (module docstring) is made for
        # inner and left_outer only. A right/full outer would emit one
        # null-joined row PER UNMATCHED RIGHT REPLICA — salt_buckets-1
        # spurious duplicates — so refuse rather than silently corrupt.
        # Spark accepts alias spellings ("leftouter", "left") for the same
        # join type; normalize so a caller using Spark's own naming is not
        # refused a combination that is actually safe.
        if how.replace("_", "").lower() not in ("inner", "leftouter", "left"):
            raise ValueError(
                f"salt_buckets requires how in ('inner', 'left_outer'); "
                f"got {how!r} — right-side replication would duplicate "
                f"unmatched-right null rows"
            )
        for side, df in (("left", left), ("right", right)):
            if "_salt" in df.columns:
                raise ValueError(
                    f"salt_buckets reserves column name '_salt', which the "
                    f"{side} input already carries — rename it first"
                )
        left = left.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.col(left_key), F.col(left_time)),
                F.lit(salt_buckets),
            ).cast("int"),
        )
        right = right.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
        )
    lw = left.withWatermark(left_time, watermark_delay)
    rw = right.withWatermark(right_time, watermark_delay)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] < lw[left_time] + F.expr(f"INTERVAL {window}"))
    )
    if salt_buckets is not None and salt_buckets > 1:
        cond = cond & (lw["_salt"] == rw["_salt"])
        joined = lw.join(rw, on=cond, how=how)
        return joined.drop(lw["_salt"]).drop(rw["_salt"])
    return lw.join(rw, on=cond, how=how)
