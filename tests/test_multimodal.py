"""Multimodal plumbing tests: mapInPandas batch shape, determinism, schema."""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.io.sources import load_table
from topk_spark.ops.multimodal import (
    attach_binary_payload,
    decode_metadata,
    extract_features,
)


def test_decode_metadata_deterministic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d)
    m1 = decode_metadata(with_payload)
    rows = {r["doc_id"]: (r["format"], r["width"], r["height"], r["n_bytes"]) for r in m1.collect()}
    assert len(rows) == d.count()
    # deterministic across runs
    rows2 = {r["doc_id"]: (r["format"], r["width"], r["height"], r["n_bytes"]) for r in decode_metadata(with_payload).collect()}
    assert rows == rows2
    # payload bytes == utf-8 length of text
    lens = {r["doc_id"]: len(r["text"].encode()) for r in d.select("doc_id", "text").collect()}
    assert all(rows[i][3] == lens[i] for i in rows)
    # plausible fake dimensions
    assert all(64 <= v[1] <= 1084 and 64 <= v[2] <= 1084 for v in rows.values())


def test_extract_features_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(attach_binary_payload(d), dim=8).collect()
    assert len(feats) == 50
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(-0.5 <= x <= 0.5 for r in feats for x in r["feature"])


def test_feature_join_with_embedding_ops(spark, sf_dir):
    """Features flow into the ANN operators (same array<float> contract)."""
    from topk_spark.ops.similarity import as_double_array, brute_force_topk

    d = load_table(spark, sf_dir, "documents").limit(100)
    feats = extract_features(attach_binary_payload(d), dim=8).withColumnRenamed(
        "doc_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    queries = feats.limit(2).select(
        F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qv")
    )
    top = brute_force_topk(feats, queries, k=3)
    assert top.count() == 6
