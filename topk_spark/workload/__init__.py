"""Workload registry: every implemented operator from SURVEY.md §2 exposed as
a named query (spark, sf_dir) -> DataFrame, paired (where SQL-expressible)
with an equivalent DuckDB oracle SQL string over the driver's testdata views.

The registry is what __spark_entry__.py re-exports to the driver harness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → driver runs rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn):
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = Query(fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


# Query names with a green driver CORRECTNESS row in round 1 (the keys of
# CORRECTNESS_r01.json). The driver verifies in registration order under a
# cap (round 1 checked exactly the first 50), so load_all() registers every
# name NOT in this set first — one round of driver runs closes VERDICT gap #1
# without re-spending the cap on already-hash-verified queries.
_R1_VERIFIED: frozenset[str] = frozenset({
    "topk_revenue_raw_24h", "rollup_1m", "merge_rollup_1h",
    "reagg_rollup_total", "topk_per_key", "topk_global",
    "latest_window_ranked", "filter_eq_project", "time_range_contained",
    "time_parts", "window_floor_alignment", "dedup_first_seen",
    "distinct_exact", "distinct_hll", "revenue_by_hour", "pricing_summary",
    "top_customers", "brand_revenue", "customers_without_orders",
    "nations_with_big_suppliers", "union_active_users", "running_revenue",
    "token_stats", "quality_score", "docs_exact_dedup", "doc_fingerprint",
    "multimodal_binary_meta", "cosine_topk", "semantic_dedup",
    "embedding_neardup_pairs", "serve_topk_restaurant", "serve_topk_global",
    "serve_topk_revenue", "sql_facade_topk", "ngram_jaccard_neardup",
    "minhash_lsh_neardup", "simhash_neardup", "lsh_ann_topk", "ivf_ann_topk",
    "neardup_cluster_dedup", "lang_id", "json_roundtrip", "revenue_dollars",
    "startree_cube", "regex_token_count", "multimodal_decode",
    "q3_shipping_priority", "q5_region_volume", "asof_view_attribution",
    "sessionize_events",
})


def load_all() -> dict[str, Query]:
    """Import all workload modules (side-effect: registration) and return the
    registry, re-ordered so that every query WITHOUT a round-1 driver
    CORRECTNESS row registers before the already-verified ones (the driver
    checks in registration order under a cap; see _R1_VERIFIED)."""
    from topk_spark.workload import (  # noqa: F401
        cdc_queries,
        graph_queries,
        sketch3_queries,
        er_queries,
        io_queries,
        layout_queries,
        sketch2_queries,
        corpus_ops_queries,
        recall_queries,
        text4_queries,
        forecast_queries,
        mining_queries,
        curation_queries,
        spectrum_queries,
        augment_queries,
        mmr_queries,
        drift_queries,
        tpch2_queries,
        tpch3_queries,
        behavior_queries,
        hygiene_queries,
        olap_queries,
        relational_queries,
        profiling_queries,
        pipeline2_queries,
        events_queries,
        tpch_queries,
        text_queries,
        similarity_queries,
        serving_queries,
        fuzzy_queries,
        text2_queries,
        joins_queries,
        search_queries,
        timeseries_queries,
        text3_queries,
        graph2_queries,
        governance_queries,
        quant_queries,
        skyline_queries,
        setstats_queries,
    )

    ordered = sorted(REGISTRY, key=lambda n: (n in _R1_VERIFIED,))
    return {n: REGISTRY[n] for n in ordered}
