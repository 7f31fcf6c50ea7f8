"""Frontier-named tier layout (topk_spark/io/tier.py): the idempotent
upto_<W> append + O(#batches) frontier recovery shared by the live drains
and the serving routers — including the round-11 ADVICE retry hole: a
foreachBatch retry that has ALREADY written its own upto_<W_cur> subdir
must still derive the PREVIOUS frontier, or it silently skips its hops."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from topk_spark.io.tier import append_upto, read_tier, tier_frontier


def test_tier_frontier_empty_and_basic(tmp_path):
    d = str(tmp_path / "tier")
    assert tier_frontier(d) is None  # absent dir
    os.makedirs(d)
    assert tier_frontier(d) is None  # empty dir
    os.makedirs(os.path.join(d, "upto_100"))
    os.makedirs(os.path.join(d, "upto_200"))
    os.makedirs(os.path.join(d, "_spark_metadata"))  # non-frontier noise
    assert tier_frontier(d) == 200


def test_tier_frontier_retry_excludes_own_batch(tmp_path):
    """The at-most-once hole (round-11 ADVICE): on a retry, upto_<W_cur>
    already exists; `below=W_cur` must yield the PREDECESSOR frontier so
    the retried batch re-emits the same `W_prev < hop_end <= W_cur` hops
    instead of none."""
    d = str(tmp_path / "tier")
    os.makedirs(os.path.join(d, "upto_100"))
    os.makedirs(os.path.join(d, "upto_200"))
    # first attempt of the W=200 batch saw frontier 100; the retry (own dir
    # present) must see the same
    assert tier_frontier(d, below=200) == 100
    # very first batch's retry: no predecessor
    first = str(tmp_path / "tier2")
    os.makedirs(os.path.join(first, "upto_100"))
    assert tier_frontier(first, below=100) is None


def test_append_upto_retry_is_idempotent(spark, tmp_path):
    """A retry overwrites its own subdir — the tier never double-counts —
    and read_tier sees the union of batches."""
    d = str(tmp_path / "tier")
    b1 = spark.range(3).select(F.col("id").alias("v"))
    append_upto(b1, d, 100)
    b2 = spark.range(3, 5).select(F.col("id").alias("v"))
    append_upto(b2, d, 200)
    append_upto(b2, d, 200)  # retry of the same batch
    got = sorted(
        r.v for r in read_tier(spark, d, b1.schema).collect()
    )
    assert got == [0, 1, 2, 3, 4]
    assert tier_frontier(d) == 200


def test_rank_new_hops_retry_reemits_same_hops(spark, tmp_path):
    """The round-11 ADVICE at-most-once hole, pinned at the behavior level:
    a foreachBatch RETRY (the batch's own upto_<W_cur> subdir already on
    disk from the failed attempt) must re-emit exactly the hop rows the
    first attempt computed — the unfixed derivation saw its own directory,
    concluded W_prev == W_cur, and emitted zero rows, silently dropping
    that batch's hop windows forever."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from topk_spark.workload.streaming_drain_queries import make_rank_new_hops

    HOUR, MIN = 3_600_000, 60_000
    ranked_schema = StructType(
        [
            StructField("window_start", LongType(), False),
            StructField("window_end", LongType(), False),
            StructField("event_type", StringType(), True),
            StructField("revenue_cents", LongType(), True),
            StructField("rank", IntegerType(), False),
        ]
    )
    tier = str(tmp_path / "slices")
    fn = make_rank_new_hops(tier, ranked_schema)

    day0 = 1_704_067_200_000

    def slice_batch(minutes):
        return spark.createDataFrame(
            [
                (t, day0 + m * MIN, day0 + (m + 1) * MIN, 100 * (m + 1) + i)
                for m in minutes
                for i, t in enumerate(("click", "view"))
            ],
            "event_type string, window_start long, window_end long, "
            "revenue_cents long",
        )

    # batch 1 closes minutes 0..60 -> W1 = day0 + 61 min; every hop ending
    # <= W1 is decidable (the leading partial hops included, exactly as the
    # drain's oracle models them): ws in [day0 - 59 min, day0 + 1 min]
    b1 = slice_batch(range(61))
    first = sorted(map(tuple, fn(b1).collect()))
    assert {r[0] for r in first} == {day0 + k * MIN for k in range(-59, 2)}
    # RETRY of the same batch: upto_<W1> exists; must re-emit identically
    retry = sorted(map(tuple, fn(b1).collect()))
    assert retry == first
    # and the tier must not have double-counted (one subdir, same rows)
    import os

    assert len([d for d in os.listdir(tier) if d.startswith("upto_")]) == 1
    # batch 2 closes minutes 61..121 -> W2 = day0 + 122 min; the new hops
    # are exactly W1 < hop_end <= W2 (ws in [day0+2min, day0+62min]) —
    # nothing from batch 1 re-emits on a CLEAN advance
    b2 = slice_batch(range(61, 122))
    second = fn(b2).collect()
    assert {r.window_start for r in second} == {
        day0 + k * MIN for k in range(2, 63)
    }
