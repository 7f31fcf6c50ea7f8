"""Round-2 operator batch: product-quantization ANN, compaction planning,
corpus-law queries, EWMA forecast."""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.io.sources import load_table
from topk_spark.ops.similarity import (
    as_double_array,
    brute_force_topk,
    pq_topk,
)
from topk_spark.workload import load_all

REGISTRY = load_all()


def _queries(emb, n=3):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qv")
    )


def test_pq_full_shortlist_equals_brute_force(spark, sf_dir):
    """With a shortlist covering the whole corpus, the exact re-rank tier
    sees every candidate, so PQ output must EQUAL brute-force cosine
    top-k exactly — quantization error can only reorder the shortlist cut,
    not the final exact rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    n = emb.count()
    exact = brute_force_topk(emb, q, k=5).select("query_id", "vec_id", "rank")
    pq = pq_topk(emb, q, k=5, m=8, nbits=4, rerank_factor=(n // 5) + 1).select(
        "query_id", "vec_id", "rank"
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, pq.collect()))


def test_pq_codes_within_codebook_range(spark, sf_dir):
    """ADC scores are finite and per-query row counts == k (no duplicate
    vec_ids from the partial-topk merge)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    out = pq_topk(emb, q, k=7, m=16, nbits=6, rerank_factor=2)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert all(len(v) == 7 for v in per_q.values())
    assert all(abs(r["score"]) <= 1.000001 for r in rows)


def test_compaction_plan_conserves_rows_and_respects_order(spark, sf_dir):
    """Next-fit invariants: total planned rows == total event rows; within
    a day, out_file ids are contiguous from 0; every output file except
    possibly the last holds >= target rows only when fed by a single
    oversized input (next-fit never splits an input file)."""
    plan = REGISTRY["compaction_next_fit_plan"].fn(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    total = e.count()
    rows = plan.collect()
    assert sum(r["out_rows"] for r in rows) == total
    by_day = {}
    for r in rows:
        by_day.setdefault(r["d"], []).append(r["out_file"])
    for d, ids in by_day.items():
        ids = sorted(ids)
        assert ids == list(range(len(ids))), f"gap in out_file ids for {d}"


def test_heaps_curve_is_monotone(spark, sf_dir):
    """Vocabulary size must be nondecreasing in the checkpoint index and
    end at the full corpus vocabulary."""
    rows = sorted(
        REGISTRY["heaps_vocab_growth"].fn(spark, sf_dir).collect(),
        key=lambda r: r["checkpoint_idx"],
    )
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    d = load_table(spark, sf_dir, "documents")
    full_vocab = (
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    assert sizes[-1] == full_vocab


def test_ewma_level_between_min_and_max_daily_mean(spark, sf_dir):
    """A convex-combination fold can never leave the [min, max] envelope of
    its inputs."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        (
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).cast(
                "double"
            )
            / F.count("*")
        ).alias("x")
    )
    env = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in daily.groupBy("event_type")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    }
    for r in REGISTRY["ewma_level_forecast"].fn(spark, sf_dir).collect():
        lo, hi = env[r["event_type"]]
        assert lo - 1e-6 <= r["ewma_level"] <= hi + 1e-6


def test_ivf_cell_probe_is_partition_pruned(spark, sf_dir):
    """The stored-corpus probe scan must prune by cell directory: the
    physical plan's FileScan carries the cell predicate in
    PartitionFilters (not a post-scan Filter), proving query-time IO is
    nprobe/nlist of the corpus."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from topk_spark.ops.layout import materialize_once
    from topk_spark.ops.similarity import ivf_cell_layout

    emb = load_table(spark, sf_dir, "embeddings")
    sf = os.path.basename(os.path.normpath(sf_dir))
    path = materialize_once(
        os.path.join(tempfile.gettempdir(), "topk_spark_layout", sf, "ivf_cells"),
        lambda p: ivf_cell_layout(emb, p, nlist=16, seed=7),
    )
    stored = spark.read.parquet(path)
    pruned = stored.filter(F.col("cell").isin([1, 3, 5]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:80]
    n_cells = stored.select("cell").distinct().count()
    assert pruned.select("cell").distinct().count() <= 3 < n_cells
