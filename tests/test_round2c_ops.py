"""Property pins for the round-2c operator batch, beyond oracle parity:

- containment prefix filter is LOSSLESS: bucketed candidates reproduce the
  quadratic all-pairs answer exactly (the scale-path-vs-oracle twin check,
  same pattern as test_fuzzy's jaccard twin),
- link prediction never proposes an existing edge and its ppm scores are
  well-formed,
- priority sampling is a deterministic top-m (replayable, weight-biased),
- CUSUM's prefix-scan rewrite equals the textbook sequential recursion,
- image patchify sums equal a direct numpy recompute of the encoded bytes,
- chi-square margins are consistent with the observed cells.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from topk_spark.workload import load_all

REGISTRY = load_all()


def test_containment_prefix_filter_is_lossless(spark, sf_dir):
    """Bucketed containment == brute-force containment over the same
    corpus: every pair with C(a→b) ≥ 0.8 is found, none extra."""
    from topk_spark.ops.fuzzy_dedup import tokenize, word_shingles
    from topk_spark.workload.corpora import perturbed_corpus

    got = {
        (r["id_a"], r["id_b"], r["containment_ppm"])
        for r in REGISTRY["containment_neardup_pairs"]
        .fn(spark, sf_dir)
        .collect()
    }
    corpus = perturbed_corpus(spark, sf_dir, modulo=5)
    sh = corpus.select(
        F.col("doc_id").alias("id"),
        word_shingles(tokenize(F.col("text")), 3).alias("s"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    na = F.size("sa").cast("long")
    want = {
        (r["id_a"], r["id_b"], r["containment_ppm"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.lit(5) * inter >= F.lit(4) * na)
        .select(
            "id_a",
            "id_b",
            F.floor(inter * F.lit(1000000) / na).cast("long").alias(
                "containment_ppm"
            ),
        )
        .collect()
    }
    assert want, "constructed corpus must contain containment pairs"
    assert got == want


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    from topk_spark.workload.graph2_queries import _pairs

    pred = REGISTRY["link_prediction_jaccard"].fn(spark, sf_dir).collect()
    edges = {
        (r["src"], r["dst"]) for r in _pairs(spark, sf_dir).collect()
    }
    for r in pred:
        assert (r["node_a"], r["node_b"]) not in edges
        assert 0 < r["jaccard_ppm"] <= 1_000_000
        assert r["common_neighbors"] >= 2


def test_priority_sample_is_deterministic_topm(spark, sf_dir):
    rows1 = REGISTRY["weighted_priority_sample"].fn(spark, sf_dir).collect()
    rows2 = REGISTRY["weighted_priority_sample"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    assert len(rows1) == 50
    pr = [r["priority"] for r in rows1]
    assert pr == sorted(pr, reverse=True)


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    """The prefix-scan form S_t = P_t − min(0, min prefix P) must equal the
    textbook recursion S_t = max(0, S_{t-1} + d_t) replayed in Python."""
    rows = (
        REGISTRY["cusum_changepoint"].fn(spark, sf_dir).collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for et, series in by_type.items():
        series.sort(key=lambda r: r["d"])
        n = len(series)
        total = sum(r["cents"] for r in series)
        s = 0
        for r in series:
            d = n * r["cents"] - total
            s = max(0, s + d)
            assert s == r["cusum_scaled"], (et, r["d"])


def test_image_patchify_matches_numpy_recompute(spark, sf_dir):
    from topk_spark.ops.multimodal import decode_png_pixels, encode_png, payload_dims

    rows = (
        REGISTRY["image_patchify_stats"].fn(spark, sf_dir).collect()
    )
    assert rows
    by_doc: dict[int, dict] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[(r["patch_row"], r["patch_col"])] = r[
            "patch_sum"
        ]
    for doc_id in list(by_doc)[:5]:
        fmt, w, h = payload_dims(doc_id)
        assert fmt == "png"
        arr = decode_png_pixels(encode_png(w, h, seed=str(doc_id).encode()))
        npr, npc = h // 16, w // 16
        sums = (
            arr[: npr * 16, : npc * 16]
            .astype("int64")
            .reshape(npr, 16, npc, 16)
            .sum(axis=(1, 3))
        )
        got = by_doc[doc_id]
        assert len(got) == npr * npc
        for (pr, pc), v in got.items():
            assert v == int(sums[pr, pc])


def test_chi_square_margins_consistent(spark, sf_dir):
    rows = REGISTRY["chi_square_independence"].fn(spark, sf_dir).collect()
    n = sum(r["o"] for r in rows)
    # expected_milli must sum to ~N per the margin identity Σ R·C/N = N
    total_expected_milli = sum(r["expected_milli"] for r in rows)
    assert abs(total_expected_milli - n * 1000) <= len(rows)  # floor slack
