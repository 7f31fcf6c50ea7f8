"""Sequence packing + deterministic shuffle (ops.packing): greedy first-fit
semantics vs a pure-Python oracle, chunked-vs-greedy invariants, and the
reproducibility of the shuffle permutation."""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.ops.packing import (
    _A,
    _C,
    _M,
    pack_chunked,
    pack_greedy,
    shuffle_shards,
)

BUDGET = 100
SHARDS = 4


def _docs(spark, n=200):
    # Lengths 1..120 (some exceed the budget on their own).
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(120)) + 1).alias("n_chars"),
    )


def _py_greedy(rows, budget):
    """Reference first-fit: rows already in shard order [(doc_id, length)]."""
    packs, pack, used = {}, 0, 0
    for doc_id, length in rows:
        if used > 0 and used + length > budget:
            pack, used = pack + 1, 0
        used += length
        packs[doc_id] = pack
    return packs


def test_greedy_matches_python_oracle(spark):
    out = pack_greedy(_docs(spark), "doc_id", "n_chars", BUDGET, SHARDS).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.shuffle_key, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        oracle = _py_greedy([(r.doc_id, r.n_chars) for r in rows], BUDGET)
        for r in rows:
            assert r.pack_id == oracle[r.doc_id], (shard, r)


def test_greedy_packs_never_overflow(spark):
    out = pack_greedy(_docs(spark), "doc_id", "n_chars", BUDGET, SHARDS)
    sizes = (
        out.groupBy("shard", "pack_id")
        .agg(F.sum("n_chars").alias("total"), F.count("*").alias("n"))
        .collect()
    )
    for r in sizes:
        # A pack exceeds the budget only when it is a single oversized doc.
        assert r.total <= BUDGET or r.n == 1, r


def test_shuffle_is_deterministic_permutation(spark):
    a = shuffle_shards(_docs(spark), "doc_id", SHARDS).collect()
    b = shuffle_shards(_docs(spark), "doc_id", SHARDS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # (shard, pos) is a dense unique numbering within each shard.
    seen = {}
    for r in a:
        assert r.shuffle_key == (r.doc_id * _A + _C) % _M
        assert r.shard == r.shuffle_key % SHARDS
        seen.setdefault(r.shard, set()).add(r.pos)
    for shard, positions in seen.items():
        assert positions == set(range(1, len(positions) + 1)), shard


def test_chunked_pack_ids_are_dense_and_ordered(spark):
    out = pack_chunked(_docs(spark), "doc_id", "n_chars", BUDGET, SHARDS).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.pos)):
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        cum = 0
        for r in rows:
            assert r.pack_id == cum // BUDGET
            cum += r.n_chars


def test_shuffle_rank_no_overflow_for_huge_keys(spark):
    """ADVICE round-1: keys >= ~8.4e9 used to overflow int64 in the affine
    multiply, yielding negative ranks/shards. The mod-first form must stay
    non-negative over the full int64 key range (including negatives)."""
    import pyspark.sql.functions as F

    from topk_spark.ops.packing import shuffle_rank, shuffle_shards

    keys = spark.createDataFrame(
        [(0,), (1,), (8_400_000_000,), (2**62,), (2**63 - 1,), (-5,)],
        "doc_id long",
    )
    ranks = keys.select(shuffle_rank(F.col("doc_id")).alias("r")).collect()
    assert all(0 <= r["r"] < 2_147_483_648 for r in ranks)
    sharded = shuffle_shards(keys, "doc_id", n_shards=16)
    assert all(0 <= r["shard"] < 16 for r in sharded.collect())
