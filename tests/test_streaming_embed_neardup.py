"""Streaming embedding near-dup (streaming/embed_neardup.py): tiny-noise
copies of real embeddings must be flagged against their originals (exact
cosine verify), dissimilar vectors must pass, and per-bucket state must be
bounded. JSON file streams with availableNow drains, as in the text twin."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from topk_spark.io.sources import load_table
from topk_spark.streaming.embed_neardup import (
    _bucket_update,
    embed_neardup_match_stream,
)

_SCHEMA = "vec_id long, embedding array<double>"
_PERT = 1_000_000


class FakeState:
    """Minimal GroupState stub for unit-driving _bucket_update."""

    exists = False
    _v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True



def _write_batch(src: str, i: int, rows: list[dict]) -> None:
    os.makedirs(src, exist_ok=True)
    p = os.path.join(src, f"batch_{i:03d}.json")
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(p, (1000 + i, 1000 + i))


def _drain(spark, tmp_path, src: str) -> pd.DataFrame:
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = os.path.join(str(tmp_path), "out")
    q = (
        embed_neardup_match_stream(stream)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out).dropDuplicates(["id", "dup_of"]).toPandas()
    )


def test_noisy_copies_flagged_originals_kept(spark, tmp_path, sf_dir):
    """Originals (batch 1) then ±0.1%-perturbed copies (batch 2): every
    copy flagged against ITS original (cos ≈ 0.999998 ≥ 0.95); real
    embeddings are near-orthogonal so no original flags another."""
    vecs = (
        load_table(spark, sf_dir, "embeddings").limit(20).collect()
    )
    rng = np.random.RandomState(7)
    src = os.path.join(str(tmp_path), "src")
    rows = [
        {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
        for r in vecs
    ]
    _write_batch(src, 0, rows)
    _write_batch(
        src,
        1,
        [
            {
                "vec_id": r["vec_id"] + _PERT,
                "embedding": [
                    float(x) * (1 + 0.001 * rng.randn()) for x in r["embedding"]
                ],
            }
            for r in rows
        ],
    )
    matches = _drain(spark, tmp_path, src)
    assert (matches["dup_of"] < matches["id"]).all()
    orig_ids = {r["vec_id"] for r in rows}
    assert not (set(matches["id"]) & orig_ids), "an original was flagged"
    per_copy = matches.set_index("id")["dup_of"].to_dict()
    for r in rows:
        cid = r["vec_id"] + _PERT
        assert per_copy.get(cid) == r["vec_id"], (
            f"copy {cid}: flagged against {per_copy.get(cid)}"
        )
    assert (matches["cos_milli"] >= 950).all()


def test_bucket_state_bounded_and_cosine_exact():
    update = _bucket_update(threshold=0.9, max_bucket=2)
    e = np.eye(4)
    st = FakeState()
    pdf = pd.DataFrame(
        {
            "id": pd.Series([1, 2, 3], dtype="int64"),
            "table_id": pd.Series([0] * 3, dtype="int32"),
            "vec": [e[0], e[1], e[2]],  # mutually orthogonal
        }
    )
    assert list(update((0, 0), iter([pdf]), st)) == []
    ids, _ = st._v
    assert ids == [1, 2]  # capped

    near = 0.99 * e[0] + 0.01 * e[3]  # cos vs e0 ≈ 0.99995
    pdf2 = pd.DataFrame(
        {
            "id": pd.Series([9], dtype="int64"),
            "table_id": pd.Series([0], dtype="int32"),
            "vec": [near],
        }
    )
    out = pd.concat(list(update((0, 0), iter([pdf2]), st)))
    assert list(out["id"]) == [9] and list(out["dup_of"]) == [1]
    assert int(out["cos_milli"].iloc[0]) == 999


def test_rearrival_of_canonical_never_self_matches():
    """Replayed canonical must not emit (id, dup_of=id) — the embedding
    mirror of the text operator's regression test."""
    update = _bucket_update(threshold=0.9, max_bucket=4)
    e = np.eye(4)
    st = FakeState()
    pdf = pd.DataFrame(
        {
            "id": pd.Series([7], dtype="int64"),
            "table_id": pd.Series([0], dtype="int32"),
            "vec": [e[0]],
        }
    )
    assert list(update((0, 0), iter([pdf]), st)) == []
    assert list(update((0, 0), iter([pdf.copy()]), st)) == []


def test_chunked_group_still_elects_smallest_id():
    """Multiple chunks for one bucket: global sort must elect the smallest
    id canonical (the embedding mirror of the text regression test)."""
    update = _bucket_update(threshold=0.9, max_bucket=4)
    e = np.eye(4)
    chunk1 = pd.DataFrame(
        {"id": pd.Series([500], dtype="int64"),
         "table_id": pd.Series([0], dtype="int32"), "vec": [e[0]]}
    )
    chunk2 = pd.DataFrame(
        {"id": pd.Series([3], dtype="int64"),
         "table_id": pd.Series([0], dtype="int32"), "vec": [e[0]]}
    )
    st = FakeState()
    out = pd.concat(list(update((0, 0), iter([chunk1, chunk2]), st)))
    assert list(out["id"]) == [500] and list(out["dup_of"]) == [3]
