"""Kernel ⇄ expression equivalence and corpus-op invariants.

The numpy signature kernels (ops/sig_kernels.py) replace the Catalyst
higher-order-function implementations on the hot path; these tests pin the
properties that swap relies on:

- hashed-shingle Jaccard == string-shingle Jaccard (the verify step is
  hash-space arithmetic; 64-bit collisions are the only divergence and
  would fail here loudly),
- kernel tokenization/shingling mirrors the expression twins' semantics,
- `bucket_pairs` emits exactly the i<j pairs a self-join would,
- incremental dedup drops every constructed cross-batch duplicate and
  nothing without a genuine old-side witness,
- chunking is lossless: stride-window chunks reassemble to the original
  token stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.ops.fuzzy_dedup import jaccard, tokenize, word_shingles
from topk_spark.ops.sig_kernels import bucket_pairs, hashed_shingles
from topk_spark.workload.corpora import PERT_OFFSET, perturbed_corpus


def test_hashed_jaccard_matches_string_jaccard(spark, sf_dir):
    """For every constructed (doc, perturbed-doc) pair: Jaccard computed on
    kernel hash arrays equals Jaccard on expression string-shingle arrays."""
    corpus = perturbed_corpus(spark, sf_dir, modulo=10)
    str_sh = corpus.select(
        F.col("doc_id").alias("id"),
        word_shingles(tokenize(F.col("text")), 3).alias("sh"),
    )
    hsh = hashed_shingles(corpus, "doc_id", "text", 3)

    def twin_pairs(t, val_col, out):
        orig = t.filter(F.col("id") < PERT_OFFSET).select(
            F.col("id").alias("id_a"), F.col(val_col).alias("va")
        )
        pert = t.filter(F.col("id") >= PERT_OFFSET).select(
            (F.col("id") - PERT_OFFSET).alias("id_a"), F.col(val_col).alias("vb")
        )
        return orig.join(pert, "id_a").select(
            "id_a", F.round(jaccard(F.col("va"), F.col("vb")), 6).alias(out)
        )

    a = twin_pairs(str_sh, "sh", "j_str")
    b = twin_pairs(hsh, "hsh", "j_hash")
    joined = a.join(b, "id_a")
    assert joined.count() > 0
    assert joined.filter(F.col("j_str") != F.col("j_hash")).count() == 0


def test_kernel_shingle_count_matches_expression(spark, sf_dir):
    """|shingle set| from the kernel equals |shingle set| from the
    expression twin for every doc (same tokenize/windowing/distinct)."""
    corpus = perturbed_corpus(spark, sf_dir, modulo=10)
    expr_n = corpus.select(
        F.col("doc_id").alias("id"),
        F.size(word_shingles(tokenize(F.col("text")), 3)).alias("n_expr"),
    )
    kern_n = hashed_shingles(corpus, "doc_id", "text", 3).select(
        "id", F.size("hsh").alias("n_kern")
    )
    j = expr_n.join(kern_n, "id")
    assert j.filter(F.col("n_expr") != F.col("n_kern")).count() == 0


def test_bucket_pairs_equals_self_join(spark):
    """bucket_pairs(keyed) == the distinct i<j self-join on the same key."""
    rows = [(k, i) for k in range(5) for i in range(k + 1)] + [(9, 100)]
    df = spark.createDataFrame(rows, "k int, id long")
    got = {
        (r["id_a"], r["id_b"])
        for r in bucket_pairs(df, ["k"], "id").collect()
    }
    a, b = df.alias("a"), df.alias("b")
    want = {
        (r["id_a"], r["id_b"])
        for r in a.join(
            b, (F.col("a.k") == F.col("b.k")) & (F.col("a.id") < F.col("b.id"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .collect()
    }
    assert got == want


def test_bucket_pairs_payload_round_trip(spark):
    """Payload columns surface the joined sides' values."""
    df = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 30, "z")], "k int, id long, p string"
    )
    rows = bucket_pairs(df, ["k"], "id", payload_col="p").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["p_a"], r["p_b"]) == (10, 20, "x", "y")


def test_incremental_dedup_drops_all_constructed_dups(spark, sf_dir):
    """Every perturbed doc (guaranteed old-side near-dup by construction)
    is dropped; every genuinely-new doc (odd id, no old twin) is kept."""
    from topk_spark.workload.corpus_ops_queries import incremental_crawl_dedup

    out = incremental_crawl_dedup(spark, sf_dir)
    planted = out.filter(F.col("doc_id") >= PERT_OFFSET)
    assert planted.count() > 0
    assert planted.filter(F.col("keep")).count() == 0  # all planted dups drop
    # keep-decisions exist for the whole new batch
    assert out.count() == out.select("doc_id").distinct().count()


def test_chunking_reassembles_documents(spark, sf_dir):
    """Dropping each chunk's 4-token overlap (except chunk 0) and
    concatenating in chunk order reproduces the doc's token stream."""
    from topk_spark.workload.corpus_ops_queries import doc_chunking
    from topk_spark.io.sources import load_table

    chunks = doc_chunking(spark, sf_dir)
    tail = F.when(
        F.col("chunk_id") == 0, F.split("chunk_text", " ", -1)
    ).otherwise(F.slice(F.split("chunk_text", " ", -1), 5, 10_000))
    rebuilt = (
        chunks.withColumn("tail", tail)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_id", "tail"))
                        ),
                        lambda s: s["tail"],
                    )
                ),
            ).alias("rebuilt")
        )
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.concat_ws(" ", F.split(F.trim("text"), r"\s+")).alias("orig"),
        )
    )
    j = docs.join(rebuilt, "doc_id")
    assert j.count() > 0
    assert j.filter(F.col("orig") != F.col("rebuilt")).count() == 0


def test_from_hsh_path_bit_identical_to_text_path(spark, sf_dir):
    """The signature-table fast path (round 3) must produce exactly the
    pairs the text path does — same hash kernel feeds both, so permutation
    minima and band digests agree bit-for-bit."""
    from topk_spark.ops.fuzzy_dedup import (
        minhash_neardup_pairs,
        minhash_neardup_pairs_from_hsh,
    )
    from topk_spark.ops.sig_kernels import hashed_shingles
    from topk_spark.workload.corpora import perturbed_corpus

    corpus = perturbed_corpus(spark, sf_dir, modulo=25)
    old = sorted(
        map(tuple, minhash_neardup_pairs(corpus, threshold=0.6).collect())
    )
    hsh = hashed_shingles(corpus, "doc_id", "text", 3)
    new = sorted(
        map(tuple, minhash_neardup_pairs_from_hsh(hsh, threshold=0.6).collect())
    )
    assert old == new and len(old) > 0
