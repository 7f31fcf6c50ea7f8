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
