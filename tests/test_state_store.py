"""RocksDB state-store posture (round-3 VERDICT item 4): the knob exists,
the provider class loads in this build, and the stateful near-dup operator
produces IDENTICAL matches under both backends — the store changes where
state lives, never semantics."""

from __future__ import annotations

import os

import pytest

from topk_spark.session import _STATE_STORE_CONF, set_state_store


@pytest.fixture
def restore_state_store(spark):
    prev = spark.conf.get(_STATE_STORE_CONF, None)
    yield
    if prev is None:
        try:
            spark.conf.unset(_STATE_STORE_CONF)
        except Exception:
            pass
    else:
        spark.conf.set(_STATE_STORE_CONF, prev)


def test_set_state_store_applies_conf(spark, restore_state_store):
    ok = set_state_store(spark, "rocksdb")
    if not ok:
        pytest.skip("RocksDBStateStoreProvider absent in this build")
    assert "RocksDBStateStoreProvider" in spark.conf.get(_STATE_STORE_CONF)
    assert set_state_store(spark, "hdfs")
    assert "HDFSBackedStateStoreProvider" in spark.conf.get(_STATE_STORE_CONF)


def test_unknown_backend_rejected(spark):
    with pytest.raises(KeyError):
        set_state_store(spark, "leveldb")


def test_neardup_matches_identical_across_backends(
    spark, sf_dir, tmp_path, restore_state_store
):
    """Drain the streaming MinHash near-dup suppressor over the same corpus
    under the HDFS-backed and RocksDB stores; the deduped match sets must be
    bit-identical."""
    import pyspark.sql.functions as F

    from topk_spark.io.sources import load_table
    from topk_spark.streaming.neardup import neardup_match_stream

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = os.path.join(str(tmp_path), "src")
    docs.coalesce(1).write.parquet(src)

    results = {}
    for store in ("hdfs", "rocksdb"):
        if not set_state_store(spark, store):
            pytest.skip(f"{store} provider absent in this build")
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        sink = os.path.join(str(tmp_path), f"out_{store}")
        q = (
            neardup_match_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(str(tmp_path), f"ckpt_{store}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results[store] = sorted(
            tuple(r)
            for r in spark.read.parquet(sink)
            .dropDuplicates(["id", "dup_of"])
            .select("id", "dup_of", "est_ppm")
            .collect()
        )
    assert results["hdfs"] == results["rocksdb"]
    assert results["hdfs"], "expected planted near-dup matches in fixture docs"
