"""ViT-style image patchification — round-2c addition to the multimodal
surface (the preprocessing step between "decoded pixels" and "vision-model
input": split each image into 16×16 patches and reduce each patch).

``image_patchify_stats`` runs the FULL pixel path on real bytes: the
fixture's PNGs (ops/multimodal.py:encode_png — valid zlib-deflated
grayscale PNGs any reader can open) are decoded chunk-walk → inflate →
filter-strip → ndarray (decode_png_pixels), then patchified with a numpy
reshape and reduced to exact integer per-patch pixel sums inside one
Arrow-batched mapInPandas kernel.

The oracle can predict every pixel: encode_png fills each row with
sha256(str(doc_id)) digest bytes cycled across the width, so patch sums
are arithmetic over the digest — and DuckDB has the same sha256. A wrong
IDAT inflate, filter strip, reshape, or patch reduction breaks the value
hash; this is the pixel-level sibling of the header round trip
(`multimodal_decode_roundtrip`).

100 TB posture: payload bytes never shuffle (generated and consumed inside
one map stage); only (doc_id, patch_row, patch_col, sum) rows — a few
dozen per image — leave the task. Patch reduction is O(pixels) numpy; at
real scale the same kernel shape carries the decode→normalize→embed stack.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from topk_spark.io.sources import load_table
from topk_spark.workload import register

_P = 16  # patch side (the ViT-base patch size)

# PNG docs are doc_id % 3 == 0; width = 16 + id % 32, height = 16 + (id//3) % 32
# (ops/multimodal.py:payload_dims). Row bytes: sha256(str(id)) cycled, every
# row identical, so patch_sum(pr, pc) = P * Σ_{x=P·pc}^{P·pc+P-1} digest[x % 32].
_PATCH_ORACLE = f"""
WITH png AS (
  SELECT doc_id,
         16 + doc_id % 32 AS w,
         16 + (doc_id // 3) % 32 AS h,
         sha256(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents WHERE doc_id % 3 = 0
),
grid AS (
  SELECT doc_id, w, h, hx,
         unnest(range(0, h // {_P})) AS patch_row
  FROM png
),
cells AS (
  SELECT doc_id, w, hx, patch_row,
         unnest(range(0, w // {_P})) AS patch_col
  FROM grid
)
SELECT doc_id,
       CAST(patch_row AS BIGINT) AS patch_row,
       CAST(patch_col AS BIGINT) AS patch_col,
       CAST({_P} * list_sum(list_transform(
              range({_P} * patch_col, {_P} * patch_col + {_P}),
              x -> CAST('0x' || substr(hx, 2 * (x % 32) + 1, 2) AS BIGINT)))
            AS BIGINT) AS patch_sum
FROM cells
ORDER BY doc_id, patch_row, patch_col
"""

_PATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("patch_row", LongType(), False),
        StructField("patch_col", LongType(), False),
        StructField("patch_sum", LongType(), False),
    ]
)


@register("image_patchify_stats", tags=("MM-patchify",), oracle=_PATCH_ORACLE)
def image_patchify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every PNG payload's actual pixels and emit exact integer
    16×16-patch pixel sums (partial edge patches dropped, as ViT does via
    resize; here via truncation). See module docstring for why the oracle
    can predict the pixels."""
    from topk_spark.ops.multimodal import decode_png_pixels, make_image_payload

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    with_payload = make_image_payload(d)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            out = {"doc_id": [], "patch_row": [], "patch_col": [], "patch_sum": []}
            for i, b in zip(batch["doc_id"], batch["payload"]):
                arr = decode_png_pixels(bytes(b))
                h, w = arr.shape
                npr, npc = h // _P, w // _P
                if npr == 0 or npc == 0:
                    continue
                sums = (
                    arr[: npr * _P, : npc * _P]
                    .astype("int64")
                    .reshape(npr, _P, npc, _P)
                    .sum(axis=(1, 3))
                )
                for pr in range(npr):
                    for pc in range(npc):
                        out["doc_id"].append(int(i))
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["patch_sum"].append(int(sums[pr, pc]))
            yield pd.DataFrame(out)

    patches = with_payload.select("doc_id", "payload").mapInPandas(
        run, _PATCH_SCHEMA
    )
    return patches.orderBy("doc_id", "patch_row", "patch_col")


# ---------------------------------------------------------------------------
# Audio 2× downsample round trip — the audio sibling of resize_images_half
# ---------------------------------------------------------------------------

# Source wave is the period-8 triangle [0,a,2a,a,0,-a,-2a,-a] (wav_params /
# _wav_samples). Keeping even indices leaves [0,2a,0,-2a] per period:
# sum-of-squares per kept period = 8a², periods = n/8 ⇒ total = n·a².
_RESAMPLE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         8000 + (doc_id % 4) * 4000 AS sr,
         256 + (doc_id % 7) * 64 AS n,
         1000 + (doc_id % 10) * 500 AS a
  FROM documents WHERE doc_id % 11 = 5
)
SELECT doc_id,
       CAST(sr // 2 AS INT) AS sample_rate2,
       CAST(n // 2 AS BIGINT) AS n_samples2,
       CAST(n * a * a AS BIGINT) AS sum_squares2
FROM p
ORDER BY doc_id
"""

_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate2", IntegerType(), True),
        StructField("n_samples2", LongType(), True),
        StructField("sum_squares2", LongType(), True),
    ]
)


@register("audio_resample_half", tags=("MM-audio",), oracle=_RESAMPLE_ORACLE)
def audio_resample_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True sample-level 2× audio downsample: decode the WAV's actual int16
    samples, stride-2 subsample, RE-ENCODE a valid half-rate WAV, parse it
    back, and analyze the re-decoded samples — a full
    decode→transform→encode→decode cycle whose every field the oracle
    predicts in closed form from the triangle-wave energy identity
    (header arithmetic alone cannot fake sum_squares2 = n·a²). Blobs stay
    inside one map stage; only scalars leave."""
    from topk_spark.ops.multimodal import (
        encode_wav_pcm,
        make_audio_payload,
        parse_wav,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 5)
    with_payload = make_audio_payload(d)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            if not len(batch):
                continue
            out = {"doc_id": [], "sample_rate2": [], "n_samples2": [], "sum_squares2": []}
            for i, b in zip(batch["doc_id"], batch["payload"]):
                raw = bytes(b)
                parsed = parse_wav(raw)
                out["doc_id"].append(int(i))
                if parsed is None:
                    out["sample_rate2"].append(None)
                    out["n_samples2"].append(None)
                    out["sum_squares2"].append(None)
                    continue
                sr, _ch, _bits, n = parsed
                samples = np.frombuffer(raw[44 : 44 + 2 * n], "<i2")
                half = encode_wav_pcm(sr // 2, samples[::2].copy())
                sr2, _c2, _b2, n2 = parse_wav(half)
                s2 = np.frombuffer(half[44 : 44 + 2 * n2], "<i2")
                out["sample_rate2"].append(int(sr2))
                out["n_samples2"].append(int(n2))
                out["sum_squares2"].append(int((s2.astype(np.int64) ** 2).sum()))
            yield pd.DataFrame(out)

    return (
        with_payload.select("doc_id", "payload")
        .mapInPandas(run, _RESAMPLE_SCHEMA)
        .orderBy("doc_id")
    )
