"""ANN training determinism under repartitioning (round-3, VERDICT item 4).

The IVF/PQ quantizers train on a bounded driver-side sample. Round 2 drew
that sample with a bare limit(65536), whose membership depends on which
partitions answer first — so repartitioning the corpus could change the
trained centroids and therefore every ANN answer. _train_sample now draws
the n smallest xxhash64(vec_id, seed) rows (membership a pure function of
ids), so the SAME corpus under ANY partitioning must produce IDENTICAL
output. These tests pin that: rerun each op after repartition(7) and
require row-for-row equality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from topk_spark.io.sources import load_table
from topk_spark.ops.similarity import (
    as_double_array,
    ivf_topk,
    pq_topk,
)


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("qv"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_output_invariant_under_repartition(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    base = _rows(ivf_topk(emb, q, k=10, nlist=16, nprobe=4))
    shuffled = _rows(ivf_topk(emb.repartition(7), q, k=10, nlist=16, nprobe=4))
    assert base == shuffled


def test_pq_output_invariant_under_repartition(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    base = _rows(pq_topk(emb, q, k=5, m=8, nbits=4))
    shuffled = _rows(pq_topk(emb.repartition(7), q, k=5, m=8, nbits=4))
    assert base == shuffled


def test_pq_query_collect_is_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb, n=20)
    with pytest.raises(ValueError, match="max_queries"):
        pq_topk(emb, q, k=5, m=8, nbits=4, max_queries=10)
