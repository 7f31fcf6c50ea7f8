"""KMV (k-minimum-values) distinct sketch — the mergeable, exactly
replayable sibling of the HLL path (`ops/sketches.py`).

The reference declares approximate distinct counts on its rollup schema
(reference: orders_1m_rollup_schema.json:50-53); `ops/sketches.py` answers
that with Datasketches HLL, whose binary registers no SQL oracle can
replay (its driver gates are error-bound checks). KMV closes that gap:
the sketch IS a relational object — the k smallest distinct values of a
deterministic 48-bit hash — so DuckDB reproduces the estimator
bit-for-bit and the driver's value-hash gate applies at full strength.

Estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-value
synopses"): with hashes uniform on [0, M) and kth_min the k-th smallest
distinct hash, E[distinct] ~= (k-1) * M / kth_min. Everything is BIGINT:
M = 2^48, k <= 2^14 keeps (k-1)*M < 2^62, and the division is integer —
both engines floor identically for non-negative operands.

Mergeability — the property HLL only asserts — is exact and provable
here: bottomk(distinct(U_i S_i)) == bottomk(distinct(U_i bottomk(S_i))),
because any element of the global bottom-k has fewer than k smaller
distinct hashes globally, hence fewer than k within any subset containing
it, so it survives every local sketch. `bottom_k_distinct` executes that
identity as its physical plan (local bucket sketches -> merge), and the
workload queries pin it by hash-match against a direct-path oracle.

100 TB posture: the raw keys hash map-side (md5 + conv, whole-stage
codegen) and deduplicate with an ordinary hash aggregate (partial
map-side combine); the rank window then runs per (group, bucket) with
`pre_buckets` slicing a hot group across tasks — each task sorts only
its bucket's distinct hashes and emits <= k rows, so the final per-group
window sees <= k * pre_buckets rows regardless of input size. No
collect, no global sort, state O(k) per group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: Hash domain: u48 values are uniform on [0, 2^48).
SCALE = 1 << 48


def u48_expr(col: Column) -> Column:
    """The repo's engine-portable 48-bit uniform hash (first 12 hex chars
    of md5 of the string form), as used by `weighted_priority_sample` —
    DuckDB replays it with substr(md5(CAST(x AS VARCHAR)), 1, 12)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def bottom_k_distinct(
    df: DataFrame,
    group_cols: list[str],
    hash_col: str = "u",
    k: int = 64,
    pre_buckets: int = 32,
) -> DataFrame:
    """Per-group k smallest DISTINCT values of `hash_col`, with their rank
    (`rn` in 1..k). This is the KMV sketch as a DataFrame.

    Physical shape is the two-level merge: distinct hashes are bucketed by
    `hash % pre_buckets`, each (group, bucket) slice keeps its local
    bottom-k (a window over a small partition), and the final per-group
    window ranks only the <= k * pre_buckets survivors — the mergeability
    identity run as the plan, which is also what caps the sort any single
    task performs for a skewed group. `pre_buckets <= 1` runs the direct
    single-level path (used by tests to pin the two paths equal)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = df.select(*group_cols, hash_col).distinct()
    if pre_buckets > 1:
        local = Window.partitionBy(*group_cols, "_bucket").orderBy(hash_col)
        h = (
            h.withColumn("_bucket", F.pmod(F.col(hash_col), F.lit(pre_buckets)))
            .withColumn("_lrn", F.row_number().over(local))
            .where(F.col("_lrn") <= k)
            .drop("_bucket", "_lrn")
        )
    w = Window.partitionBy(*group_cols).orderBy(hash_col)
    return h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], hash_col: str = "u", k: int = 64
) -> DataFrame:
    """Collapse a `bottom_k_distinct` sketch into one estimate per group.

    A group holding fewer than k distinct hashes IS its own exact answer
    (the sketch saw everything); otherwise (k-1)*2^48 div kth_min. The
    CASE and the integer division are mirrored verbatim in the DuckDB
    oracles so the driver hash-gates the estimator itself, not a bound."""
    if not 1 <= k <= 1 << 14:
        raise ValueError(f"k must be in [1, 2^14] for BIGINT safety, got {k}")
    agg = sketch.groupBy(*group_cols).agg(
        F.max(hash_col).alias("_kth"), F.count(F.lit(1)).alias("_n_in")
    )
    return agg.select(
        *group_cols,
        F.when(F.col("_n_in") < k, F.col("_n_in"))
        .otherwise(
            F.expr(f"CAST({(k - 1) * SCALE} AS BIGINT) div greatest(_kth, 1)")
        )
        .cast("long")
        .alias("est_distinct"),
    )
