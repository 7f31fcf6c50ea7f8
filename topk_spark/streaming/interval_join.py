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
- right_outer: a never-matched right row is emitted null-joined in the
  first micro-batch whose in-effect watermark passes `right_ts` — the
  right row's own timestamp, because the condition bounds matchable left
  rows to `left_ts <= right_ts`, so once the watermark clears right_ts no
  future left arrival can reach it (new rows carry event time >= the
  watermark). Deadline precision measured at sub-ms resolution
  (tests/test_streaming_joins.py::test_outer_eviction_boundary): the left
  deadline is non-strict µs (`v_us + window_us <= wm_us`), the right
  deadline lags by one watermark tick (`r_us + 1000 <= wm_us`).
- full_outer: matched pairs plus BOTH null schedules above, each side
  evicted on its own deadline.
- left_semi: a left row is emitted (left columns only, exactly once) in
  the micro-batch where its FIRST matching right row arrives; never-matched
  left rows emit nothing and their state ages out at the left_outer
  deadline without producing output.

At 100 TB: state per partition is (input rate × window × key share); skew
concentrates on hot keys, which AQE cannot fix in streaming — pre-salting
the equality key (ops-level, both sides identically) is the lever, same as
the batch `salted_skew_join`. `salt_buckets` implements it: the SALTED side
gets a deterministic per-row salt, the other side is REPLICATED once per
salt value, and the join key becomes (key, salt) — a hot key's probe and
emission work then spreads over `salt_buckets` state-store partitions
instead of serializing on one, at the cost of ×salt replicated-side state.
Each (left, right) pair still joins exactly once (the salted row carries
ONE salt; only the matching replica satisfies the condition), so inner
results are unchanged and the salted side's outer/semi emission policy is
untouched. `salt_side` picks which side carries the salt:

- salt_side="left" (default): right side replicated. Safe for inner,
  left_outer, left_semi — every output row is keyed by an UNREPLICATED
  left row (left_outer nulls come from left rows; semi emits left rows),
  and a left row is unmatched under (key, salt) iff unmatched under key.
- salt_side="right": left side replicated. Safe for inner, right_outer —
  the mirror-image argument.
- UNSAFE combinations are refused: an outer/semi side that was replicated
  would emit `salt_buckets` duplicate rows per unmatched (or matched,
  for semi) original; full_outer has no safe side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Spark accepts alias spellings for the same join type; normalization maps
# (lowercased, underscores stripped) onto the canonical salting-safety class.
_HOW_CANON = {
    "inner": "inner",
    "leftouter": "left_outer",
    "left": "left_outer",
    "rightouter": "right_outer",
    "right": "right_outer",
    "fullouter": "full_outer",
    "full": "full_outer",
    "outer": "full_outer",
    "leftsemi": "left_semi",
    "semi": "left_semi",
}

# how → salt sides whose replication cannot change results (module doc).
_SAFE_SALT_SIDES = {
    "inner": ("left", "right"),
    "left_outer": ("left",),
    "right_outer": ("right",),
    "full_outer": (),
    "left_semi": ("left",),
}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window: str,
    watermark_delay: str | None,
    how: str = "inner",
    salt_buckets: int | None = None,
    salt_side: str = "left",
) -> DataFrame:
    """Join two STREAMING DataFrames on `left_key == right_key` where
    `right_time` falls inside `[left_time, left_time + window)`. Both sides
    get `watermark_delay` watermarks on their time columns (required for
    bounded state and for outer emission). Key/time columns are named
    (not Column objects) so the condition resolves against the watermarked
    plans, never a stale pre-watermark lineage.

    `window` / `watermark_delay` are Spark interval strings ("7 days").
    `watermark_delay=None` means BOTH inputs already carry watermarks
    (e.g. they flow out of an upstream stateful stage such as
    dropDuplicatesWithinWatermark — Spark disallows redefining a
    watermark downstream, so a chained topology must watermark once, at
    the top) and none is applied here. `how` is "inner", "left_outer",
    "right_outer", "full_outer", or "left_semi". `salt_buckets`
    (optional) pre-salts the equality key to spread a hot key over that
    many partitions — result rows are identical to the unsalted join
    (module docstring has the argument); `salt_side` picks the salted
    (non-replicated) side and must be a safe side for `how`; use when one
    key carries a large traffic share."""
    if salt_buckets is not None and salt_buckets > 1:
        canon = _HOW_CANON.get(how.replace("_", "").lower())
        if canon is None:
            raise ValueError(f"unknown join type {how!r}")
        if salt_side not in ("left", "right"):
            raise ValueError(f"salt_side must be 'left' or 'right', got {salt_side!r}")
        safe = _SAFE_SALT_SIDES[canon]
        if salt_side not in safe:
            raise ValueError(
                f"salt_buckets with salt_side={salt_side!r} is unsafe for "
                f"how={how!r}: replicating the "
                f"{'right' if salt_side == 'left' else 'left'} side would "
                f"emit salt_buckets-1 duplicate rows per "
                f"{canon.replace('_', '-')} output row it anchors"
                + (f"; safe side(s) for {canon}: {safe}" if safe else
                   "; no salt side is safe for full_outer")
            )
        for side, df in (("left", left), ("right", right)):
            if "_salt" in df.columns:
                raise ValueError(
                    f"salt_buckets reserves column name '_salt', which the "
                    f"{side} input already carries — rename it first"
                )
        replicate = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        if salt_side == "left":
            left = left.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(F.col(left_key), F.col(left_time)),
                    F.lit(salt_buckets),
                ).cast("int"),
            )
            right = right.withColumn("_salt", replicate)
        else:
            left = left.withColumn("_salt", replicate)
            right = right.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(F.col(right_key), F.col(right_time)),
                    F.lit(salt_buckets),
                ).cast("int"),
            )
    if watermark_delay is not None:
        lw = left.withWatermark(left_time, watermark_delay)
        rw = right.withWatermark(right_time, watermark_delay)
    else:
        lw, rw = left, right
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] < lw[left_time] + F.expr(f"INTERVAL {window}"))
    )
    if salt_buckets is not None and salt_buckets > 1:
        cond = cond & (lw["_salt"] == rw["_salt"])
        joined = lw.join(rw, on=cond, how=how)
        if canon == "left_semi":
            # A semi join's output carries only the left side's columns.
            return joined.drop("_salt")
        return joined.drop(lw["_salt"]).drop(rw["_salt"])
    return lw.join(rw, on=cond, how=how)


def interval_anti_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    window: str,
    watermark_delay: str | None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Streaming NOT-EXISTS within the horizon: left rows with NO right row
    of the same key inside [left_time, left_time + window), left columns
    only. Spark refuses a native streaming left_anti at analysis time
    ("LeftAnti joins with a streaming DataFrame/Dataset on the right are
    not supported"), so this is the standard derivation — left_outer plus
    an unmatched filter — packaged as an operator because its semantics
    are exactly what a pipeline wants from streaming anti joins: absence
    is only decidable once the watermark proves no matching right row can
    still arrive, so each anti row emits at the left_outer NULL DEADLINE
    (`left_us + window_us <= wm_us`, measured in
    tests/test_streaming_joins.py::test_outer_eviction_boundary), and left
    rows still inside their horizon emit nothing. Salting inherits the
    left_outer safety argument (salt_side='left' only).

    Left/right column names must be disjoint — the unmatched filter and
    the left-only projection resolve by name."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"interval_anti_join needs disjoint column names; both sides "
            f"carry {sorted(overlap)} — rename one side first"
        )
    joined = interval_join(
        left,
        right,
        left_key=left_key,
        right_key=right_key,
        left_time=left_time,
        right_time=right_time,
        window=window,
        watermark_delay=watermark_delay,
        how="left_outer",
        salt_buckets=salt_buckets,
        salt_side="left",
    )
    return joined.filter(F.col(right_key).isNull()).select(*left.columns)
