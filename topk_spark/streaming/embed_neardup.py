"""Streaming EMBEDDING near-duplicate suppression — hyperplane-LSH buckets
as keyed streaming state; the vector sibling of streaming/neardup.py.

Where the text operator keys MinHash band hashes, this one keys the
(table_id, H-bit hyperplane signature) buckets of ops/sig_kernels.
hyperplane_signatures — the SAME data-oblivious LSH the batch ANN path
uses (ops/similarity.lsh_ann_topk), so the L/H trade-off tuned offline
(candidate volume ≈ L/2^H of the corpus) transfers to the stream.

Per bucket the state holds up to `max_bucket` canonical (id, normalized
vector) entries. An arriving vector whose EXACT cosine against a stored
canonical clears `threshold` is emitted as a near-duplicate (verify is
exact — LSH only gates which pairs are compared, identical to the batch
embedding_neardup_pairs contract); otherwise it becomes a canonical until
the bucket cap. First-seen wins across batches, smaller id within one.

State per bucket ≤ max_bucket × dim × 8 bytes (default 8 × 64-dim × 8 =
4 KiB); shuffle keys are (table_id, sig) ints, never vectors — vectors
ride the L signature rows map-side (L × d × 8 bytes per doc of shuffle
payload, the price of a join-free single-query topology).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from topk_spark.ops.sig_kernels import hyperplane_signatures

MATCH_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("dup_of", LongType(), False),
        StructField("cos_milli", LongType(), False),
        StructField("table_id", IntegerType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType()), True),
        StructField("vecs", BinaryType(), True),  # row-major float64, normalized
    ]
)

# Per-(bucket, micro-batch) arrival bound — see streaming/neardup.py
_MAX_BUCKET_BATCH = 4096


def _bucket_update(threshold: float, max_bucket: int):
    """Per-bucket GroupState transition; split out for unit tests."""

    def update(
        group_key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        stored: np.ndarray | None = None
        if state.exists:
            sids, blob = state.get
            ids = list(sids)
            if ids:
                stored = np.frombuffer(blob, dtype=np.float64).reshape(
                    len(ids), -1
                ).copy()

        out = {"id": [], "dup_of": [], "cos_milli": [], "table_id": []}
        dirty = False
        # concat-then-sort with an explicit arrival cap: see
        # streaming/neardup.py — per-chunk sorts break deterministic
        # smaller-id canonical election; the cap bounds hot-bucket memory
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks).sort_values("id").head(_MAX_BUCKET_BATCH)
        for rid, tid, vec in zip(batch["id"], batch["table_id"], batch["vec"]):
            v = np.asarray(vec, dtype=np.float64)
            n = np.linalg.norm(v)
            if n == 0:
                continue
            v = v / n
            if stored is not None and len(ids):
                cos = stored @ v
                # never match a re-arrival against itself (see neardup.py)
                for k, cid in enumerate(ids):
                    if cid == int(rid):
                        cos[k] = -np.inf
                j = int(cos.argmax())
                if cos[j] >= threshold:
                    out["id"].append(int(rid))
                    out["dup_of"].append(int(ids[j]))
                    out["cos_milli"].append(int(np.floor(cos[j] * 1000)))
                    out["table_id"].append(int(tid))
                    continue
            if int(rid) not in ids and len(ids) < max_bucket:
                ids.append(int(rid))
                stored = (
                    v[None, :]
                    if stored is None
                    else np.vstack([stored, v[None, :]])
                )
                dirty = True
        if dirty:
            state.update((ids, stored.astype(np.float64).tobytes()))
        if out["id"]:
            yield pd.DataFrame(
                {
                    "id": pd.Series(out["id"], dtype="int64"),
                    "dup_of": pd.Series(out["dup_of"], dtype="int64"),
                    "cos_milli": pd.Series(out["cos_milli"], dtype="int64"),
                    "table_id": pd.Series(out["table_id"], dtype="int32"),
                }
            )

    return update


def embed_neardup_match_stream(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 8,
    threshold: float = 0.95,
    max_bucket: int = 8,
) -> DataFrame:
    """Streaming embedding near-dup matches: (id, dup_of, cos_milli,
    table_id), at least once per matching table; batch-drain consumers
    finish with dropDuplicates(["id", "dup_of"])."""
    rows = hyperplane_signatures(
        vecs, id_col, vec_col, num_planes, num_tables, carry_vec=True
    )
    return rows.groupBy("table_id", "sig").applyInPandasWithState(
        _bucket_update(threshold, max_bucket),
        MATCH_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
